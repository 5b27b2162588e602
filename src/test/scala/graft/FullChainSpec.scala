package graft

import graft.dialect.AnsiDialect
import graft.model.CdcEvent
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import graft.streaming.{CdcPipeline, TxnAssembler}
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.Trigger
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.DriverManager

/** The flagship end-to-end chain: cdcwal V2 source → typed events →
  * flatMapGroupsWithState transaction assembly → LSN-ordered
  * exactly-once apply into Derby. One streaming query, restartable. */
class FullChainSpec extends SparkSpecBase {

  private def writeSegment(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, s"segment-$name.jsonl"),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  private def dml(op: String, lsn: Long, txid: Int, id: Int, v: String,
                  commit: Boolean): String = {
    val img = s"""[{"name":"id","value":"$id"},{"name":"val","value":"$v"}]"""
    val key = s"""[{"name":"id","value":"$id"}]"""
    op match {
      case "c" =>
        s"""{"op":"c","lsn":$lsn,"txid":$txid,"commitTsMs":0,"schema":null,""" +
          s""""table":"t1","after":$img,"keyColumns":["id"],"commit":$commit}"""
      case "u" =>
        s"""{"op":"u","lsn":$lsn,"txid":$txid,"commitTsMs":0,"schema":null,""" +
          s""""table":"t1","before":$key,"after":$img,"keyColumns":["id"],"commit":$commit}"""
      case "d" =>
        s"""{"op":"d","lsn":$lsn,"txid":$txid,"commitTsMs":0,"schema":null,""" +
          s""""table":"t1","before":$key,"keyColumns":["id"],"commit":$commit}"""
    }
  }

  test("source → assembler → exactly-once JDBC apply, with restart") {
    val dir = Files.createTempDirectory("chain-wal").toFile.getAbsolutePath
    val dbDir = Files.createTempDirectory("chain-db").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("chain-ckpt").toFile.getAbsolutePath
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute("CREATE SCHEMA \"public\"")
    conn.createStatement().execute(
      "CREATE TABLE \"public\".\"t1\" (\"id\" VARCHAR(32) PRIMARY KEY, \"val\" VARCHAR(32))")

    // tx1: insert 1..3; tx2: insert 4,5 then update 4; interleaved LSNs
    writeSegment(dir, "000001", Seq(
      dml("c", 1, 1, 1, "a", commit = false),
      dml("c", 2, 1, 2, "b", commit = false),
      dml("c", 3, 2, 4, "x", commit = false),
      dml("c", 4, 1, 3, "c", commit = true), // tx1 seals
      dml("c", 5, 2, 5, "y", commit = false),
      dml("u", 6, 2, 4, "x2", commit = true))) // tx2 seals

    val ctx = RenderContext(AnsiDialect)
    val applier = new JdbcApplier(url, ctx, "chain")
    applier.init()

    import spark.implicits._
    def runOnce(): Unit = {
      val events = CdcPipeline.toEvents(
        spark.readStream.format("graft.sources.cdcwal.CdcWalSource")
          .option("path", dir).load())
      val txns = TxnAssembler.assemble(events)
      val q = txns.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[graft.model.CdcTransaction], batchId: Long) =>
          // flatten sealed txns in commit order; events keep their LSNs
          val flat = batch.orderBy($"commitLsn")
            .flatMap(_.events)(CdcPipeline.eventEnc)
          applier.applyBatch(flat, batchId)
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()

    def query(sql: String): Seq[(String, String)] = {
      val rs = conn.createStatement().executeQuery(sql)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      while (rs.next()) buf += ((rs.getString(1), rs.getString(2)))
      buf.toSeq
    }
    assert(query("SELECT \"id\", \"val\" FROM \"public\".\"t1\" ORDER BY \"id\"") ==
      Seq("1" -> "a", "2" -> "b", "3" -> "c", "4" -> "x2", "5" -> "y"))

    // restart: tx3 deletes id=2, inserts id=6; only new LSNs processed
    writeSegment(dir, "000002", Seq(
      dml("d", 7, 3, 2, "", commit = false),
      dml("c", 8, 3, 6, "z", commit = true)))
    runOnce()
    assert(query("SELECT \"id\", \"val\" FROM \"public\".\"t1\" ORDER BY \"id\"") ==
      Seq("1" -> "a", "3" -> "c", "4" -> "x2", "5" -> "y", "6" -> "z"))
  }

  test("envelope-marked commits seal without control events (wire shape)") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def e(lsn: Long, fin: Boolean) = CdcEvent("c", lsn, 9, ts, null, "t1", Nil,
      Seq(graft.model.CdcColumn("id", lsn.toString)), keyColumns = Seq("id"),
      isFinalBatch = fin)
    val (state, out) = TxnAssembler.step(9,
      Seq(e(1, false), e(2, false), e(3, true), e(4, false)), None)
    assert(out.size == 1 && out.head.events.map(_.lsn) == Seq(1, 2, 3))
    assert(state.isDefined) // lsn 4 still buffering
  }
}
