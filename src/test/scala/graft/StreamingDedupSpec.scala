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

  test("streaming near-dedup: incremental minhash flags cross-batch near-dups") {
    import graft.llmops.StreamingDedup
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val hits = StreamingDedup.dupStream(
      mem.toDF().toDF("doc_id", "text"), simThreshold = 0.5)
    val q = hits.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    try {
      mem.addData((1L, base), (2L, "completely different words about spark " +
        "catalyst optimizer plans and shuffle exchanges at scale"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM neardup_out").count() == 0,
        "first arrivals have no priors to match")
      // near-identical variant of doc 1 + one more unrelated doc
      mem.addData((3L, base + " extra"), (4L, "unrelated corpus text entirely " +
        "about databases indexes and write amplification behavior"))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT doc_id, dup_of FROM neardup_out")
        .as[(Long, Long)].collect().toSet
      assert(pairs == Set((3L, 1L)), s"expected (3,1) only, got $pairs")
      // re-delivery of doc 3 is a no-op (epoch replay safety)
      mem.addData((3L, base + " extra"))
      q.processAllAvailable()
      val again = spark.sql("SELECT * FROM neardup_out").count()
      assert(spark.sql("SELECT DISTINCT doc_id, dup_of FROM neardup_out").count() == 1)
    } finally q.stop()
  }

  test("streaming near-dedup step: threshold, ordering, state cap") {
    import graft.llmops.StreamingDedup
    import graft.llmops.StreamingDedup.{BucketArrival, SigDoc}
    val sigA = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)
    val sigB = Seq(1L, 2L, 3L, 4L, 9L, 9L, 9L, 9L) // frac 0.5 vs A
    val sigC = Seq(9L, 9L, 9L, 9L, 9L, 9L, 9L, 8L) // frac 0.125 vs A
    val (s1, h1) = StreamingDedup.step(Nil,
      Seq(BucketArrival("b", 1, sigA)), 0.5, cap = 10)
    assert(h1.isEmpty && s1.map(_.id) == List(1L))
    val (s2, h2) = StreamingDedup.step(s1, Seq(
      BucketArrival("b", 3, sigC), BucketArrival("b", 2, sigB)), 0.5, cap = 10)
    // docId order: 2 compares first (hit), then 3 (no hit vs A or B)
    assert(h2.map(h => (h.doc_id, h.dup_of, h.est_jaccard)) == Seq((2L, 1L, 0.5)))
    assert(s2.map(_.id).toSet == Set(1L, 2L, 3L))
    // cap evicts oldest
    val (s3, _) = StreamingDedup.step(s2,
      Seq(BucketArrival("b", 10, sigC)), 0.99, cap = 2)
    assert(s3.size == 2 && s3.head.id == 10L)
    // re-delivered id is a no-op
    val (s4, h4) = StreamingDedup.step(s2,
      Seq(BucketArrival("b", 2, sigB)), 0.1, cap = 10)
    assert(h4.isEmpty && s4.size == s2.size)
  }
}
