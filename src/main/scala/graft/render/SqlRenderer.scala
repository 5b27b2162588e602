package graft.render

import graft.dialect.Dialect
import graft.model._

/** Event → destination-SQL projection (reference operators P1-P9).
  *
  * Pure functions mirroring pg2any-lib/src/sql_renderer.rs:77-377: total
  * dispatch on op, INSERT/UPDATE/DELETE/TRUNCATE renderers, replica-identity
  * driven WHERE-clause builder, config-driven schema mapping.
  */
final case class RenderContext(
    dialect: Dialect,
    /** source schema → destination schema; absent → passthrough; null
      * source schema → "public" (sql_renderer.rs:28-37). */
    schemaMappings: Map[String, String] = Map.empty) {

  def mapSchema(source: String): String = {
    val s = if (source == null || source.isEmpty) "public" else source
    schemaMappings.getOrElse(s, s)
  }

  def qualified(schema: String, table: String): String =
    dialect.qualifyTable(mapSchema(schema), table)
}

class RenderException(msg: String) extends RuntimeException(msg)

object SqlRenderer {

  /** P1 render dispatcher (sql_renderer.rs:77-130): non-DML → Nil.
    * A multi-table TRUNCATE event yields one statement PER table — JDBC
    * drivers reject multi-statement strings, and the reference likewise
    * executes each truncate separately (sql_renderer.rs:300-320). */
  def renderStatements(ctx: RenderContext, e: CdcEvent): Seq[String] = e.op match {
    case Op.Insert => Seq(renderInsert(ctx, e))
    case Op.Update => Seq(renderUpdate(ctx, e))
    case Op.Delete => Seq(renderDelete(ctx, e))
    case Op.Truncate => renderTruncate(ctx, e)
    case _ => Nil
  }

  /** Single-statement convenience for Insert/Update/Delete call sites;
    * for Truncate use renderStatements (an event may carry many tables). */
  def render(ctx: RenderContext, e: CdcEvent): Option[String] =
    renderStatements(ctx, e).headOption

  /** P2 (sql_renderer.rs:148-177): column order = event order. */
  def renderInsert(ctx: RenderContext, e: CdcEvent): String = {
    val d = ctx.dialect
    val cols = e.after.map(c => d.quoteIdentifier(c.name)).mkString(", ")
    val vals = e.after.map(d.renderValue).mkString(", ")
    s"INSERT INTO ${ctx.qualified(e.schema, e.table)} ($cols) VALUES ($vals);"
  }

  /** P3 (sql_renderer.rs:205-234): SET from after, WHERE from replica
    * identity over before (the where_clause_fix_tests.rs regression). */
  def renderUpdate(ctx: RenderContext, e: CdcEvent): String = {
    val d = ctx.dialect
    val sets = e.after
      .map(c => s"${d.quoteIdentifier(c.name)} = ${d.renderValue(c)}")
      .mkString(", ")
    val where = whereClause(ctx, e)
    s"UPDATE ${ctx.qualified(e.schema, e.table)} SET $sets WHERE $where;"
  }

  /** P4 (sql_renderer.rs:263-289). */
  def renderDelete(ctx: RenderContext, e: CdcEvent): String = {
    val where = whereClause(ctx, e)
    s"DELETE FROM ${ctx.qualified(e.schema, e.table)} WHERE $where;"
  }

  /** P6 (sql_renderer.rs:300-320): one statement per table; dialects
    * without truncate emit nothing. */
  def renderTruncate(ctx: RenderContext, e: CdcEvent): Seq[String] = {
    val tables =
      if (e.truncateTables.nonEmpty) e.truncateTables else Seq(e.table)
    tables.flatMap { t =>
      val (sch, tbl) = t.split("\\.", 2) match {
        case Array(s, n) => (s, n)
        case _ => (e.schema, t)
      }
      ctx.dialect.truncateSql(ctx.qualified(sch, tbl))
    }
  }

  /** P5 key-predicate builder (sql_renderer.rs:323-377).
    * Default/Index → key columns from before (fallback after), error when
    * no key columns resolve; Full → every before column with IS NULL for
    * nulls; Nothing → hard error (sql_renderer.rs:370-374). */
  def whereClause(ctx: RenderContext, e: CdcEvent): String = {
    val d = ctx.dialect
    def eq(c: CdcColumn): String =
      if (c.value == null) s"${d.quoteIdentifier(c.name)} IS NULL"
      else s"${d.quoteIdentifier(c.name)} = ${d.renderValue(c)}"

    e.replicaIdentity match {
      case ReplicaIdentity.Full =>
        val src = if (e.before.nonEmpty) e.before else e.after
        if (src.isEmpty)
          throw new RenderException(s"FULL replica identity with no row data for ${e.table}")
        src.map(eq).mkString(" AND ")
      case ReplicaIdentity.Nothing =>
        throw new RenderException(
          s"cannot build WHERE clause: replica identity NOTHING on ${e.table}")
      case _ => // Default | Index
        val src = if (e.before.nonEmpty) e.before else e.after
        val keys = e.keyColumns.flatMap(k => src.find(_.name == k))
        if (keys.isEmpty)
          throw new RenderException(
            s"no key columns available for ${e.table} (keys=${e.keyColumns.mkString(",")})")
        keys.map(eq).mkString(" AND ")
    }
  }

  /** P10 structured render (sql_renderer.rs:389-458): keep routing typed;
    * SQL text is produced only at the sink boundary. */
  sealed trait Rendered extends Serializable
  final case class Sql(statement: String) extends Rendered
  final case class BulkInsert(table: String, columns: Seq[String], row: Seq[String])
      extends Rendered
  case object NoOp extends Rendered

  def renderStructured(ctx: RenderContext, e: CdcEvent, supportsBulk: Boolean): Rendered =
    e.op match {
      case Op.Insert if supportsBulk =>
        BulkInsert(
          ctx.qualified(e.schema, e.table),
          e.after.map(c => ctx.dialect.quoteIdentifier(c.name)),
          e.after.map(ctx.dialect.renderValue))
      case _ => render(ctx, e).map(Sql.apply).getOrElse(NoOp)
    }
}
