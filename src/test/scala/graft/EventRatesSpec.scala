package graft

import graft.model._
import graft.streaming.EventRates
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Watermarked windowed aggregation: on-time, late-but-tolerated, and
  * too-late events. */
class EventRatesSpec extends SparkSpecBase {

  private def ev(op: String, lsn: Long, minuteOfHour: Int, sec: Int): CdcEvent =
    CdcEvent(op, lsn, lsn, java.sql.Timestamp.valueOf(
      f"2024-01-01 10:$minuteOfHour%02d:$sec%02d"), "public", "t1",
      Nil, Seq(CdcColumn("id", lsn.toString)), keyColumns = Seq("id"))

  test("tumbling windows finalize past the watermark; too-late events drop") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[CdcEvent]
    val q = EventRates.windowed(mem.toDF(), "1 minute", "2 minutes")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("rates").start()
    try {
      // window [10:00,10:01): three inserts; [10:01,10:02): one delete
      mem.addData(ev("c", 1, 0, 10), ev("c", 2, 0, 20), ev("c", 3, 0, 40),
        ev("d", 4, 1, 15))
      q.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed window end + lateness
      assert(spark.sql("SELECT * FROM rates").count() == 0)

      // advance event time far enough to finalize the 10:00 window
      mem.addData(ev("u", 5, 5, 0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT table, op, n_events FROM rates ORDER BY window_start, op")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(rows.contains(("t1", "c", 3L)))
      assert(rows.contains(("t1", "d", 1L)))

      // a too-late event (behind the watermark) must NOT resurrect the
      // finalized window
      mem.addData(ev("c", 6, 0, 50))
      q.processAllAvailable()
      val after = spark.sql("SELECT sum(n_events) FROM rates WHERE op = 'c'")
        .collect()(0).getLong(0)
      assert(after == 3L, "late event leaked into a finalized window")
    } finally q.stop()
  }

  test("session windows merge bursts and match the batch run exactly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // burst at 10:00..10:02 (one session), quiet, burst at 10:20 (another)
    val data = Seq(
      ev("c", 1, 0, 10), ev("c", 2, 0, 50), ev("u", 3, 2, 30),
      ev("d", 4, 20, 0), ev("c", 5, 20, 30))
    val mem = MemoryStream[CdcEvent]
    val q = EventRates.sessionized(mem.toDF(), "5 minutes", "1 minute")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sessions").start()
    try {
      mem.addData(data: _*)
      q.processAllAvailable()
      // push the watermark far past the last session's gap to finalize it
      mem.addData(ev("c", 99, 59, 0))
      q.processAllAvailable()
      val streamed = spark.sql(
        """SELECT session_start, session_end, table, n_events,
          |       first_lsn, last_lsn
          |FROM sessions WHERE last_lsn < 99 ORDER BY session_start""".stripMargin)
        .collect().toSeq
      // the burst of 3 merged into ONE dynamic-length session, the later
      // burst into another
      assert(streamed.map(_.getLong(3)) == Seq(3L, 2L), streamed.mkString("\n"))
      // exact parity with the same expression over a static DataFrame
      val batch = EventRates.sessionized(data.toDF(), "5 minutes", "1 minute")
        .orderBy("session_start")
        .select("session_start", "session_end", "table", "n_events",
          "first_lsn", "last_lsn")
        .collect().toSeq
      assert(streamed == batch, s"stream:\n${streamed.mkString("\n")}\nbatch:\n${batch.mkString("\n")}")
    } finally q.stop()
  }

  test("stream-stream interval join: short-lived rows within the horizon only") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    def kev(op: String, lsn: Long, minuteOfHour: Int, id: String): CdcEvent =
      CdcEvent(op, lsn, lsn, java.sql.Timestamp.valueOf(
        f"2024-01-01 10:$minuteOfHour%02d:00"), "public", "t1",
        Nil, Seq(CdcColumn("id", id)), keyColumns = Seq("id"))
    val mem = MemoryStream[CdcEvent]
    val q = EventRates.shortLived(mem.toDF(), "10 minutes", "1 minute")
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("churn").start()
    try {
      mem.addData(
        kev("c", 1, 0, "a"), kev("d", 2, 3, "a"),   // a: deleted after 3 min → emit
        kev("c", 3, 0, "b"),                        // b: never deleted → silent
        kev("d", 4, 1, "c"),                        // c: delete without insert → silent
        kev("c", 5, 0, "e"), kev("d", 6, 20, "e"),  // e: outlives the horizon → silent
        kev("c", 7, 2, "a"))                        // a re-inserted, not re-deleted
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT table, key, lifetime_ms, i_lsn, d_lsn FROM churn ORDER BY key")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(rows.toSeq == Seq(("t1", "a", 180000L, 1L, 2L)),
        s"only a's 3-minute lifetime qualifies: ${rows.mkString(",")}")
      // a DELETE arriving later but inside a pending insert's horizon
      // still matches (the join buffers inserts until the watermark
      // passes their horizon)
      mem.addData(kev("d", 8, 9, "b"))
      q.processAllAvailable()
      val b = spark.sql("SELECT key, lifetime_ms FROM churn WHERE key = 'b'")
        .collect().map(r => (r.getString(0), r.getLong(1)))
      assert(b.toSeq == Seq(("b", 540000L)), b.mkString(","))
    } finally q.stop()
  }
}
