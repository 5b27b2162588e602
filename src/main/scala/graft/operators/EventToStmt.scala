package graft.operators

import graft.coalesce._
import graft.dialect.Dialect
import graft.model._
import graft.render.{RenderContext, RenderException, SqlRenderer}

/** CdcEvent → structured DML statement (feeds the coalescer).
  *
  * Bridges the renderer's value/identifier formatting (P2-P9) with the
  * structured statement IR, so events never round-trip through SQL text
  * (the P10 lesson, pg2any-lib/src/sql_renderer.rs:389-458).
  */
object EventToStmt {

  /** One event → zero or more structured statements. Multi-table TRUNCATE
    * yields one RawSql PER table — multi-statement strings are rejected by
    * JDBC drivers, and the reference executes each truncate separately. */
  def toStmts(ctx: RenderContext, e: CdcEvent): Seq[DmlStmt] = {
    val d = ctx.dialect
    val table = ctx.qualified(e.schema, e.table)
    e.op match {
      case Op.Insert =>
        Seq(InsertRow(table,
          e.after.map(c => d.quoteIdentifier(c.name)),
          e.after.map(d.renderValue)))
      case Op.Update =>
        Seq(UpdateRow(table,
          e.after.map(c => d.quoteIdentifier(c.name)),
          e.after.map(d.renderValue),
          wherePairs(d, e)))
      case Op.Delete =>
        Seq(DeleteRow(table, wherePairs(d, e)))
      case Op.Truncate =>
        SqlRenderer.renderTruncate(ctx, e).map(sql => RawSql(table, sql))
      case _ => Nil
    }
  }

  def toStmt(ctx: RenderContext, e: CdcEvent): Option[DmlStmt] =
    toStmts(ctx, e).headOption

  /** Key predicate as structured (quotedCol, Option[literal]) pairs —
    * same identity rules as SqlRenderer.whereClause (P5). */
  private def wherePairs(d: Dialect, e: CdcEvent): Seq[(String, Option[String])] = {
    val src = if (e.before.nonEmpty) e.before else e.after
    val cols = e.replicaIdentity match {
      case ReplicaIdentity.Full =>
        if (src.isEmpty)
          throw new RenderException(s"FULL identity with no row data for ${e.table}")
        src
      case ReplicaIdentity.Nothing =>
        throw new RenderException(s"replica identity NOTHING on ${e.table}")
      case _ =>
        val keys = e.keyColumns.flatMap(k => src.find(_.name == k))
        if (keys.isEmpty)
          throw new RenderException(s"no key columns for ${e.table}")
        keys
    }
    cols.map(c => (d.quoteIdentifier(c.name),
      Option(c.value).map(_ => d.renderValue(c))))
  }

  /** Render a whole ordered event run into coalesced SQL — the per-epoch
    * sink path (E3 analog, transaction_manager.rs:1274-1408). */
  def renderBatch(ctx: RenderContext, events: Seq[CdcEvent],
                  cfg: CoalesceConfig = CoalesceConfig()): Seq[String] =
    Coalescer.coalesce(events.flatMap(toStmts(ctx, _)), ctx.dialect, cfg)
}
