package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ⇄ Column bridge for Spark 4's split Column API.
  * Lives in the sql package to reach the private[sql] constructors —
  * the standard pattern for third-party Catalyst extensions. */
object GraftColumnBridge {
  def column(e: Expression): Column =
    Column(classic.ExpressionColumnNode(e))
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
