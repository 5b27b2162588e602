package graft.tools

import graft.dialect.AnsiDialect
import graft.model._
import graft.render.RenderContext
import graft.sinks.JdbcApplier
import graft.streaming.{CdcMetricsListener, CdcPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files
import java.sql.DriverManager

/** Executable streaming sample: MemoryStream of CDC events →
  * exactly-once foreachBatch into embedded Derby, with a simulated crash
  * replay. Run: `sbt "runMain graft.tools.StreamDemo"`. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sql = spark.sqlContext

    val listener = new CdcMetricsListener
    spark.streams.addListener(listener)

    val dir = Files.createTempDirectory("graft-demo").toFile.getAbsolutePath
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute("CREATE SCHEMA \"public\"")
    conn.createStatement().execute(
      "CREATE TABLE \"public\".\"t1\" (\"id\" VARCHAR(32) PRIMARY KEY, \"val\" VARCHAR(32))")

    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ins(id: Int) = CdcEvent("c", id.toLong, 1, ts, null, "t1", Nil,
      Seq(CdcColumn("id", id.toString), CdcColumn("val", (id * 10).toString)),
      keyColumns = Seq("id"))

    val ctx = RenderContext(AnsiDialect)
    val mem = MemoryStream[CdcEvent]
    mem.addData((1 to 1000).map(ins): _*)
    val ckpt = s"$dir/ckpt"
    val q = CdcPipeline.startJdbc(mem.toDF(), ctx, url, ckpt, "demo")
    q.processAllAvailable(); q.stop()

    def count(): Long = {
      val rs = conn.createStatement()
        .executeQuery("SELECT COUNT(*) FROM \"public\".\"t1\"")
      rs.next(); rs.getLong(1)
    }
    println(s"after first run: count=${count()} (expect 1000)")

    // crash replay: re-apply the same epoch manually — the batchId gate
    // must make it a no-op
    val applier = new JdbcApplier(url, ctx, "demo")
    applier.applyBatch((1 to 1000).map(ins).toDS(), batchId = 0)
    println(s"after replaying batch 0: count=${count()} (expect 1000, gate holds)")

    // restart with same checkpoint: only new data applies
    mem.addData((1001 to 1500).map(ins): _*)
    val q2 = CdcPipeline.startJdbc(mem.toDF(), ctx, url, ckpt, "demo")
    q2.processAllAvailable(); q2.stop()
    println(s"after restart + 500 new events: count=${count()} (expect 1500)")
    println(s"metrics: ${listener.snapshot().view.filterKeys(_ != "pg2any_uptime_seconds").toMap}")
    spark.stop()
  }
}
