package graft.expressions

import graft.dialect.Dialect
import graft.model.{CdcColumn, CdcEvent}
import graft.render.{RenderContext, SqlRenderer}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `cdc_to_sql(event, dialect)` — render a CDC envelope struct to its
  * destination SQL statement as a native Catalyst expression (SURVEY §4's
  * optional SQL-surface item; the production-grade form of running the
  * renderer, replacing typed `Dataset.map` harnesses which force
  * object serialization boundaries into the plan).
  *
  * The child is a struct with any subset of the envelope fields
  * (CdcSchema.envelope); missing fields take CdcEvent defaults, so
  * queries can build minimal `struct(...)` literals. Dispatch/rendering
  * delegates to the same `SqlRenderer` the sinks use — one rendering
  * implementation, two surfaces. Multi-statement TRUNCATE events render
  * their FIRST statement here (the scalar contract); sinks use
  * `renderStatements`. Non-DML ops → null.
  *
  * Codegen: the expression object rides along via `addReferenceObj`, so
  * the projection stays inside WholeStageCodegen (one virtual call per
  * row — same pattern as Spark's own regexp machinery with compiled
  * pattern state).
  */
case class CdcToSql(child: Expression, dialectName: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case s: StructType if s.fieldNames.contains("op") =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cdc_to_sql requires a struct with an 'op' field, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_to_sql"

  @transient private lazy val ctx = RenderContext(Dialect.forName(dialectName))
  @transient private lazy val schema = child.dataType.asInstanceOf[StructType]
  @transient private lazy val idx: Map[String, Int] =
    schema.fieldNames.zipWithIndex.toMap

  private def strField(row: InternalRow, name: String): String =
    idx.get(name) match {
      case Some(i) if !row.isNullAt(i) => row.getUTF8String(i).toString
      case _ => null
    }

  private def longField(row: InternalRow, name: String, dflt: Long): Long =
    idx.get(name) match {
      case Some(i) if !row.isNullAt(i) => row.getLong(i)
      case _ => dflt
    }

  private def colsField(row: InternalRow, name: String): Seq[CdcColumn] =
    idx.get(name) match {
      case Some(i) if !row.isNullAt(i) =>
        val arr = row.getArray(i)
        (0 until arr.numElements()).map { j =>
          val st = arr.getStruct(j, 3)
          CdcColumn(
            if (st.isNullAt(0)) null else st.getUTF8String(0).toString,
            if (st.isNullAt(1)) null else st.getUTF8String(1).toString,
            if (st.numFields > 2 && !st.isNullAt(2)) st.getBoolean(2) else false)
        }
      case _ => Nil
    }

  private def strsField(row: InternalRow, name: String): Seq[String] =
    idx.get(name) match {
      case Some(i) if !row.isNullAt(i) =>
        val arr = row.getArray(i)
        (0 until arr.numElements()).map(j =>
          if (arr.isNullAt(j)) null else arr.getUTF8String(j).toString)
      case _ => Nil
    }

  /** Called from generated code — must stay public. */
  def renderRow(input: Any): UTF8String = {
    val row = input.asInstanceOf[InternalRow]
    val e = CdcEvent(
      op = strField(row, "op"),
      lsn = longField(row, "lsn", 0L),
      txid = longField(row, "txid", 0L),
      commitTs = null,
      schema = strField(row, "schema"),
      table = strField(row, "table"),
      before = colsField(row, "before"),
      after = colsField(row, "after"),
      replicaIdentity = Option(strField(row, "replicaIdentity")).getOrElse("DEFAULT"),
      keyColumns = strsField(row, "keyColumns"),
      truncateTables = strsField(row, "truncateTables"))
    SqlRenderer.render(ctx, e).map(UTF8String.fromString).orNull
  }

  protected override def nullSafeEval(input: Any): Any = renderRow(input)

  override protected def doGenCode(cg: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = cg.addReferenceObj("cdcToSql", this, classOf[CdcToSql].getName)
    // nullSafeCodeGen (not defineCodeGen): renderRow returns null for
    // non-DML ops, so the result's own nullability must be re-checked
    nullSafeCodeGen(cg, ev, c => s"""
      ${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.renderRow($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcToSql =
    copy(child = newChild)
}
