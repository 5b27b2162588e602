package graft.tools

import graft.coalesce._
import graft.dialect._
import graft.model._
import graft.operators._
import graft.render._
import graft.sources._

/** Executable library sample: a CDC micro-batch rendered + coalesced per
  * dialect. Run: `sbt "runMain graft.tools.RenderDemo"`. */
object RenderDemo {
  def main(args: Array[String]): Unit = {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ins(id: Int, v: String) = CdcEvent(Op.Insert, 100 + id, 7, ts, "public", "t1",
      Nil, Seq(CdcColumn("id", id.toString), CdcColumn("val", v), CdcColumn("active", "t")),
      keyColumns = Seq("id"))
    def upd(id: Int, v: String) = CdcEvent(Op.Update, 200 + id, 8, ts, "public", "t1",
      Seq(CdcColumn("id", id.toString), CdcColumn("val", "old")),
      Seq(CdcColumn("val", v)), keyColumns = Seq("id"))
    def del(id: Int) = CdcEvent(Op.Delete, 300 + id, 9, ts, "public", "t1",
      Seq(CdcColumn("id", id.toString)), Nil, keyColumns = Seq("id"))

    val batch = (1 to 3).map(i => ins(i, s"it's v$i")) ++
      Seq(upd(1, "x\\y"), upd(2, "b"), del(1), del(3)) :+
      CdcEvent(Op.Truncate, 400, 10, ts, "public", "t1", Nil, Nil,
        truncateTables = Seq("public.t1"))

    for (d <- Seq(MySqlDialect, SqlServerDialect, SqliteDialect)) {
      println(s"=== ${d.name} ===")
      EventToStmt.renderBatch(RenderContext(d), batch).foreach(println)
    }
    println("=== schema-mapped public->cdc_db (ansi) ===")
    EventToStmt.renderBatch(RenderContext(AnsiDialect, Map("public" -> "cdc_db")), batch.take(1))
      .foreach(println)
    println("=== resume reconcile ===")
    println(SlotReconcile.reconcile(
      Some(Lsn.parse("16/B374D848")),
      Some(Some(SlotReconcile.SlotState(Some(Lsn.parse("16/FFFFFFFF")), None, active = true)))))
    println("=== probe: replica identity NOTHING ===")
    try EventToStmt.renderBatch(RenderContext(AnsiDialect),
      Seq(del(1).copy(replicaIdentity = ReplicaIdentity.Nothing)))
    catch { case e: Exception => println(s"raised as expected: ${e.getMessage}") }
    println("=== probe: 2500 inserts under SQL Server 1000-row cap ===")
    val out = EventToStmt.renderBatch(RenderContext(SqlServerDialect),
      (1 to 2500).map(i => ins(i, "v")))
    println(s"statements: ${out.size}; rows/stmt: ${out.map(_.split("\\), \\(").length).mkString(",")}")
  }
}
