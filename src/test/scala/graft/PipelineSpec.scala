package graft

import graft.dialect.AnsiDialect
import graft.model._
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import graft.streaming.CdcPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.DriverManager

/** Chaos-scenario analogs (reference tests/chaos/scenarios) against an
  * embedded Derby destination, including crash-replay idempotence. */
class PipelineSpec extends SparkSpecBase {

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def derbyUrl(name: String): String = {
    val dir = Files.createTempDirectory("graft-derby").toFile.getAbsolutePath
    s"jdbc:derby:$dir/$name;create=true"
  }

  private def ins(id: Int, v: Int, lsn: Long) =
    CdcEvent("c", lsn, 1L, ts, null, "t1", Nil,
      Seq(CdcColumn("id", id.toString), CdcColumn("val", v.toString)),
      keyColumns = Seq("id"))
  private def upd(id: Int, v: Int, lsn: Long) =
    CdcEvent("u", lsn, 2L, ts, null, "t1",
      Seq(CdcColumn("id", id.toString)),
      Seq(CdcColumn("val", v.toString)), keyColumns = Seq("id"))
  private def del(id: Int, lsn: Long) =
    CdcEvent("d", lsn, 3L, ts, null, "t1",
      Seq(CdcColumn("id", id.toString)), Nil, keyColumns = Seq("id"))

  // Derby speaks ANSI quoting; schema-less tables
  private val ctx = RenderContext(AnsiDialect)

  private def createT1(url: String): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      // the renderer maps a null source schema to "public" (reference
      // sql_renderer.rs:28-37), so the destination needs that namespace
      st.execute("CREATE SCHEMA \"public\"")
      st.execute(
        "CREATE TABLE \"public\".\"t1\" (\"id\" VARCHAR(32) PRIMARY KEY, \"val\" VARCHAR(32))")
      st.close()
    } finally c.close()
  }

  private def count(url: String, sql: String): Long = {
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      val rs = st.executeQuery(sql)
      rs.next(); rs.getLong(1)
    } finally c.close()
  }

  test("scenario1: 100 inserts replicate exactly (COUNT=100)") {
    val url = derbyUrl("s1")
    createT1(url)
    val applier = new JdbcApplier(url, ctx)
    applier.init()
    import spark.implicits._
    val events = (1 to 100).map(i => ins(i, i, i.toLong)).toDS()
    applier.applyBatch(events, batchId = 0)
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 100)
  }

  test("scenario2: inserts then full-table update") {
    val url = derbyUrl("s2")
    createT1(url)
    val applier = new JdbcApplier(url, ctx)
    applier.init()
    import spark.implicits._
    val events = ((1 to 50).map(i => ins(i, i, i.toLong)) ++
      (1 to 50).map(i => upd(i, i + 10000, 100L + i))).toDS()
    applier.applyBatch(events, batchId = 0)
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 50)
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\" WHERE CAST(\"val\" AS INT) > 10000") == 50)
  }

  test("scenario3: inserts then bulk delete") {
    val url = derbyUrl("s3")
    createT1(url)
    val applier = new JdbcApplier(url, ctx)
    applier.init()
    import spark.implicits._
    val events = ((1 to 300).map(i => ins(i, i, i.toLong)) ++
      (1 to 250).map(i => del(i, 1000L + i))).toDS()
    applier.applyBatch(events, batchId = 0)
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 50)
  }

  test("crash replay: same batchId applied twice is a no-op (F2 gate)") {
    val url = derbyUrl("replay")
    createT1(url)
    val applier = new JdbcApplier(url, ctx)
    applier.init()
    import spark.implicits._
    val events = (1 to 10).map(i => ins(i, i, i.toLong)).toDS()
    applier.applyBatch(events, batchId = 5)
    // replay of an already-committed epoch (Spark re-delivers after crash)
    applier.applyBatch(events, batchId = 5)
    applier.applyBatch(events, batchId = 4) // stale epoch
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 10)
    assert(applier.lastCommitted() == 5)
  }

  test("end-to-end streaming: MemoryStream → foreachBatch → Derby with checkpoint restart") {
    val url = derbyUrl("e2e")
    createT1(url)
    val ckpt = Files.createTempDirectory("graft-ckpt").toFile.getAbsolutePath
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val mem = MemoryStream[CdcEvent]
    mem.addData((1 to 60).map(i => ins(i, i, i.toLong)): _*)
    val q1 = CdcPipeline.startJdbc(mem.toDF(), ctx, url, ckpt, "e2e")
    q1.processAllAvailable(); q1.stop()
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 60)

    // "restart": new query, same checkpoint — only new data applies
    mem.addData((61 to 100).map(i => ins(i, i, i.toLong)): _*)
    val q2 = CdcPipeline.startJdbc(mem.toDF(), ctx, url, ckpt, "e2e")
    q2.processAllAvailable(); q2.stop()
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 100)
  }

  test("JDBC chain discards aborted streamed transactions (v2 protocol)") {
    import graft.streaming.TxnAssembler.Ctl
    val url = derbyUrl("abort")
    createT1(url)
    val ckpt = Files.createTempDirectory("graft-abort-ckpt").toFile.getAbsolutePath
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def ctl(op: String, lsn: Long, txid: Long) =
      CdcEvent(op, lsn, txid, ts, null, null, Nil, Nil, isFinalBatch = false)
    def insTx(id: Int, lsn: Long, txid: Long, fin: Boolean) =
      CdcEvent("c", lsn, txid, ts, null, "t1", Nil,
        Seq(CdcColumn("id", id.toString), CdcColumn("val", (id * 10).toString)),
        keyColumns = Seq("id"), isFinalBatch = fin)
    val mem = MemoryStream[CdcEvent]
    mem.addData(
      // streamed tx 77 aborts — its insert must never reach Derby
      ctl(Ctl.StreamStart, 1, 77), insTx(999, 2, 77, fin = false),
      ctl(Ctl.StreamStop, 3, 77), ctl(Ctl.StreamAbort, 4, 77),
      // explicit Begin/Commit framing commits
      ctl(Ctl.Begin, 5, 78), insTx(1, 6, 78, fin = false), ctl(Ctl.Commit, 7, 78),
      // envelope-marked single-event tx commits
      insTx(2, 8, 79, fin = true))
    val q = CdcPipeline.startJdbc(mem.toDF(), ctx, url, ckpt, "abort")
    q.processAllAvailable(); q.stop()
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 2)
    assert(count(url,
      "SELECT COUNT(*) FROM \"public\".\"t1\" WHERE \"id\" = '999'") == 0)
  }

  test("update/delete key from before-image survives the full pipeline") {
    val url = derbyUrl("keys")
    createT1(url)
    val applier = new JdbcApplier(url, ctx)
    applier.init()
    import spark.implicits._
    val events = Seq(
      ins(1, 10, 1), ins(2, 20, 2),
      upd(1, 11, 3), del(2, 4)).toDS()
    applier.applyBatch(events, 0)
    assert(count(url, "SELECT COUNT(*) FROM \"public\".\"t1\"") == 1)
    assert(count(url, "SELECT CAST(\"val\" AS INT) FROM \"public\".\"t1\" WHERE \"id\" = '1'") == 11)
  }
}
