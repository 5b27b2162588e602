package graft

import graft.dialect.AnsiDialect
import graft.operators.Bootstrap
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import graft.streaming.CdcPipeline
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.DriverManager

/** Initial-snapshot bootstrap then CDC catch-up: snapshot rows flow
  * through the bulk apply path; the stream starts strictly after the
  * snapshot LSN, so pre-snapshot WAL (already contained in the
  * snapshot) is never re-applied — re-applying it would violate the
  * destination primary key, which is exactly what this test proves. */
class BootstrapSpec extends SparkSpecBase {

  private def derbyUrl(name: String): String = {
    val dir = Files.createTempDirectory("graft-bootstrap").toFile.getAbsolutePath
    s"jdbc:derby:$dir/$name;create=true"
  }

  private def exec(url: String, sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try { val st = c.createStatement(); st.execute(sql); st.close() }
    finally c.close()
  }

  private def queryPairs(url: String): Map[String, String] = {
    val c = DriverManager.getConnection(url)
    try {
      val rs = c.createStatement()
        .executeQuery("SELECT \"id\", \"val\" FROM \"public\".\"t1\"")
      Iterator.continually(rs).takeWhile(_.next())
        .map(r => r.getString(1) -> r.getString(2)).toMap
    } finally c.close()
  }

  test("snapshot bulk load + catch-up from snapshot LSN (no pre-snapshot replay)") {
    val url = derbyUrl("bs")
    exec(url, "CREATE SCHEMA \"public\"")
    exec(url, "CREATE TABLE \"public\".\"t1\" " +
      "(\"id\" VARCHAR(32) PRIMARY KEY, \"val\" VARCHAR(64))")

    import spark.implicits._
    // the snapshot: 1200 rows (forces multi-chunk bulk inserts) taken at
    // LSN 50; WAL lsns 1..50 are the history already inside it
    val snapshot = (1 to 1200).map(i => (i.toString, s"v$i"))
      .toDF("id", "val")
    val applier = new JdbcApplier(url, RenderContext(AnsiDialect), "bs-bootstrap")
    val startLsn = Bootstrap.initialLoad(
      snapshot, null, "t1", Seq("id"), snapshotLsn = 50L, applier)
    assert(queryPairs(url).size == 1200)

    // re-running the bootstrap is gated, not duplicated
    Bootstrap.initialLoad(snapshot, null, "t1", Seq("id"), 50L, applier)
    assert(queryPairs(url).size == 1200)

    // WAL: lsn 10 would duplicate id=1 (PK violation if replayed);
    // lsn 60/61 are genuine post-snapshot changes
    val wal = Files.createTempDirectory("bs-wal").toFile.getAbsolutePath
    def line(op: String, lsn: Long, id: String, v: String): String =
      s"""{"op":"$op","lsn":$lsn,"txid":$lsn,"commitTsMs":0,""" +
        s""""schema":null,"table":"t1",""" +
        (if (op == "u")
          s""""before":[{"name":"id","value":"$id"}],"after":[{"name":"val","value":"$v"}],"""
         else
          s""""after":[{"name":"id","value":"$id"},{"name":"val","value":"$v"}],""") +
        s""""keyColumns":["id"],"commit":true}"""
    Files.write(Paths.get(wal, "segment-000001.jsonl"), Seq(
      line("c", 10, "1", "v1"),          // pre-snapshot: must be skipped
      line("c", 60, "9001", "new"),      // post-snapshot insert
      line("u", 61, "2", "updated")      // post-snapshot update
    ).mkString("\n").getBytes(StandardCharsets.UTF_8))

    val ckpt = Files.createTempDirectory("bs-ckpt").toFile.getAbsolutePath
    val envelope = spark.readStream
      .format("graft.sources.cdcwal.CdcWalSource")
      .option("path", wal)
      .option("startLsn", startLsn.toString)
      .load()
    val q = CdcPipeline.startJdbc(envelope, RenderContext(AnsiDialect),
      url, ckpt, "bs-stream")
    q.processAllAvailable(); q.stop()

    val rows = queryPairs(url)
    assert(rows.size == 1201)
    assert(rows("9001") == "new")
    assert(rows("2") == "updated")
    assert(rows("1") == "v1") // untouched by the skipped pre-snapshot event
  }

  test("warehouse bootstrap seeds the bucketed replica; MERGE catch-up applies on top") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val root = Files.createTempDirectory("bs-wh").toFile.getAbsolutePath
    val snapshot = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "val")
    val lsn = Bootstrap.initialLoadWarehouse(
      snapshot, s"$root/public.t1", Seq("id"), snapshotLsn = 50L, numBuckets = 8)
    val sink = new graft.sinks.ParquetReplicaSink(s"$root/public.t1", Seq("id"), 8)
    assert(sink.snapshot(spark).count() == 1000)

    // post-snapshot catch-up batch: one update, one delete, one insert
    val change = Seq(
      ("u", 60L, 2L, "updated"),
      ("d", 61L, 3L, null),
      ("c", 62L, 2000L, "new")
    ).toDF("op", "lsn", "id", "val")
    sink.applyBatch(spark, change, batchId = 1L)
    val end = sink.snapshot(spark)
    assert(end.count() == 1000) // +1 insert, -1 delete
    assert(end.filter(col("id") === 2L).select("val").head().getString(0) == "updated")
    assert(end.filter(col("id") === 3L).count() == 0)
    assert(end.filter(col("id") === 2000L).count() == 1)
  }
}
