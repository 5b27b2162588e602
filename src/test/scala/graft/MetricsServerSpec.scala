package graft

import graft.model.{CdcColumn, CdcEvent}
import graft.streaming.{CdcMetricsListener, CdcPipeline, MetricsServer}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import java.net.{HttpURLConnection, URI}
import scala.io.Source

/** E4 scrape surface: a live query's progress flows through the
  * listener and out the HTTP endpoint with the reference metric names
  * (metrics.rs:13-132, metrics_server.rs). */
class MetricsServerSpec extends SparkSpecBase {

  private def get(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(5000); conn.setReadTimeout(5000)
    val code = conn.getResponseCode
    val body = Source.fromInputStream(conn.getInputStream, "UTF-8").mkString
    conn.disconnect()
    (code, body)
  }

  test("scrape endpoint serves reference metric names from live query progress") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val listener = new CdcMetricsListener
    spark.streams.addListener(listener)
    val server = new MetricsServer(listener, port = 0).start()
    try {
      import spark.implicits._
      implicit val sql = spark.sqlContext
      val mem = MemoryStream[CdcEvent]
      val q = CdcPipeline.toEvents(mem.toDF()).writeStream
        .outputMode(OutputMode.Append)
        .format("memory").queryName("metrics_probe").start()
      try {
        mem.addData((1 to 25).map(i =>
          CdcEvent("c", i.toLong, 1L, ts, "public", "t1", Nil,
            Seq(CdcColumn("id", i.toString)), keyColumns = Seq("id"))): _*)
        q.processAllAvailable()
      } finally q.stop()
      // listener events are delivered asynchronously; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      var body = ""
      while (System.currentTimeMillis() < deadline &&
        !body.contains("pg2any_events_processed_total 25")) {
        body = get(s"http://127.0.0.1:${server.boundPort}/metrics")._2
        if (!body.contains("pg2any_events_processed_total 25")) Thread.sleep(100)
      }
      assert(body.contains("# TYPE pg2any_events_processed_total counter"))
      assert(body.contains("pg2any_events_processed_total 25"))
      assert(body.contains("pg2any_events_per_second"))
      assert(body.contains("pg2any_transactions_processed_total"))
      assert(body.contains("pg2any_uptime_seconds"))
      val (hc, hb) = get(s"http://127.0.0.1:${server.boundPort}/health")
      assert(hc == 200 && hb == "ok")
    } finally {
      server.stop()
      spark.streams.removeListener(listener)
    }
  }

  test("count_by_key folds per-key counts map-side (the labeled-counter feed)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val m = Seq(Some("a"), Some("a"), Some("b"), None, Some("a")).toDF("k")
      .repartition(4) // counts must merge across partial buffers
      .agg(graft.expressions.GraftFunctions.count_by_key(col("k")).as("m"))
      .as[Map[String, Long]].first()
    assert(m == Map("a" -> 3L, "b" -> 1L))
  }

  test("prometheus text rendering: labeled samples share one TYPE family line") {
    val text = MetricsServer.render(Map(
      """pg2any_events_by_type_total{event_type="insert",table_name="t1"}""" -> 2.0,
      """pg2any_events_by_type_total{event_type="delete",table_name="t1"}""" -> 1.0))
    assert(text.linesIterator.count(_.startsWith("# TYPE")) == 1)
    assert(text.contains("# TYPE pg2any_events_by_type_total counter"))
    assert(text.contains(
      """pg2any_events_by_type_total{event_type="insert",table_name="t1"} 2"""))
    assert(text.contains(
      """pg2any_events_by_type_total{event_type="delete",table_name="t1"} 1"""))
  }

  test("prometheus text rendering: counters vs gauges, integer formatting") {
    val text = MetricsServer.render(Map(
      "pg2any_errors_total" -> 3.0, "pg2any_events_per_second" -> 12.5))
    assert(text ==
      """# TYPE pg2any_errors_total counter
        |pg2any_errors_total 3
        |# TYPE pg2any_events_per_second gauge
        |pg2any_events_per_second 12.5
        |""".stripMargin)
  }
}
