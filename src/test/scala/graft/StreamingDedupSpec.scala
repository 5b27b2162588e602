package graft

import graft.model._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** F2 as a stream operator: at-least-once delivery upstream (e.g. the
  * Kafka/Debezium path re-delivering on rebalance) deduplicated by LSN
  * with bounded state via watermark. */
class StreamingDedupSpec extends SparkSpecBase {

  private def ev(lsn: Long, minute: Int): CdcEvent =
    CdcEvent("c", lsn, 1, java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00"),
      "public", "t1", Nil, Seq(CdcColumn("id", lsn.toString)), keyColumns = Seq("id"))

  test("dropDuplicatesWithinWatermark on lsn suppresses redelivery") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[CdcEvent]
    val q = mem.toDF()
      .withWatermark("commitTs", "10 minutes")
      .dropDuplicatesWithinWatermark("lsn")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(ev(1, 0), ev(2, 0), ev(2, 0), ev(3, 1)) // dup within batch
      q.processAllAvailable()
      mem.addData(ev(2, 1), ev(4, 2)) // redelivery across batches
      q.processAllAvailable()
      val lsns = spark.sql("SELECT lsn FROM dedup_out")
        .collect().map(_.getLong(0)).sorted
      assert(lsns.sameElements(Array(1L, 2L, 3L, 4L)))
    } finally q.stop()
  }
}
