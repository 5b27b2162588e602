package graft.tools

import graft.dialect.AnsiDialect
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import graft.streaming.{CdcPipeline, TxnAssembler}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.DriverManager

/** Volume pass (reference scenario5 analog, scaled to the container):
  * one large transaction + a tail of small ones through the full chain
  * — cdcwal source → assembler → coalesced exactly-once JDBC apply.
  * Run: `sbt "runMain graft.tools.VolumeDemo [nRows]"`. */
object VolumeDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("vol-wal").toFile.getAbsolutePath
    val dbDir = Files.createTempDirectory("vol-db").toFile.getAbsolutePath
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute("CREATE SCHEMA \"public\"")
    conn.createStatement().execute(
      "CREATE TABLE \"public\".\"t1\" (\"id\" VARCHAR(32) PRIMARY KEY, \"val\" VARCHAR(32))")

    // one n-row transaction (commit marker on the last event), 64k-line segments
    val t0 = System.nanoTime()
    val lines = (1 to n).iterator.map { i =>
      val commit = i == n
      s"""{"op":"c","lsn":$i,"txid":1,"commitTsMs":0,"schema":null,"table":"t1",""" +
        s""""after":[{"name":"id","value":"$i"},{"name":"val","value":"v$i"}],""" +
        s""""keyColumns":["id"],"commit":$commit}"""
    }
    lines.grouped(65536).zipWithIndex.foreach { case (chunk, idx) =>
      Files.write(Paths.get(dir, f"segment-$idx%06d.jsonl"),
        chunk.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    println(f"wal write: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // statementBatchSize 1000 (reference CDC_BATCH_SIZE default) measured
    // fastest: 6.3k rows/s vs 3.6k at 10000 (Derby executeBatch degrades)
    val applier = new JdbcApplier(url, RenderContext(AnsiDialect), "vol")
    applier.init()
    import spark.implicits._
    val t1 = System.nanoTime()
    val q = TxnAssembler.assemble(CdcPipeline.toEvents(
      spark.readStream.format("graft.sources.cdcwal.CdcWalSource")
        .option("path", dir).load()))
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: Dataset[graft.model.CdcTransaction], batchId: Long) =>
        applier.applyBatch(
          batch.orderBy($"commitLsn").flatMap(_.events)(CdcPipeline.eventEnc), batchId)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t1) / 1e9
    val rs = conn.createStatement()
      .executeQuery("SELECT COUNT(*) FROM \"public\".\"t1\"")
    rs.next()
    println(f"applied ${rs.getLong(1)} rows in $secs%.1f s " +
      f"(${rs.getLong(1) / secs}%.0f rows/s) — expect $n")
    spark.stop()
  }
}
