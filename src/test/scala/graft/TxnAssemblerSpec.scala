package graft

import graft.model._
import graft.streaming.TxnAssembler
import graft.streaming.TxnAssembler.Ctl
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class TxnAssemblerSpec extends SparkSpecBase {

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def ev(op: String, lsn: Long, txid: Long): CdcEvent =
    // isFinalBatch=false: these fixtures delimit txs with explicit
    // Begin/Commit control events (the pgoutput shape); the
    // envelope-marked commit path is tested separately
    CdcEvent(op, lsn, txid, ts, "public", "t1", Nil,
      if (op == "c" || op == "u") Seq(CdcColumn("id", lsn.toString)) else Nil,
      keyColumns = Seq("id"), isFinalBatch = false)

  test("step: begin → DML → commit seals a transaction (producer.rs:140-197)") {
    val batch = Seq(ev(Ctl.Begin, 1, 7), ev("c", 2, 7), ev("c", 3, 7), ev(Ctl.Commit, 4, 7))
    val (state, out) = TxnAssembler.step(7, batch, None)
    assert(state.isEmpty)
    assert(out.size == 1)
    assert(out.head.txid == 7 && out.head.commitLsn == 4)
    assert(out.head.events.map(_.lsn) == Seq(2, 3))
  }

  test("step: events buffer across batches until commit") {
    val (s1, o1) = TxnAssembler.step(7, Seq(ev(Ctl.Begin, 1, 7), ev("c", 2, 7)), None)
    assert(o1.isEmpty && s1.isDefined)
    val (s2, o2) = TxnAssembler.step(7, Seq(ev("u", 3, 7), ev(Ctl.Commit, 4, 7)), s1)
    assert(s2.isEmpty)
    assert(o2.head.events.map(_.lsn) == Seq(2, 3))
  }

  test("step: streamed transaction chunks + StreamCommit (producer.rs:199-272)") {
    val batch = Seq(
      ev(Ctl.StreamStart, 10, 9), ev("c", 11, 9), ev(Ctl.StreamStop, 12, 9),
      ev(Ctl.StreamStart, 13, 9), ev("c", 14, 9), ev(Ctl.StreamStop, 15, 9),
      ev(Ctl.StreamCommit, 16, 9))
    val (state, out) = TxnAssembler.step(9, batch, None)
    assert(state.isEmpty)
    assert(out.head.events.map(_.lsn) == Seq(11, 14))
  }

  test("step: StreamAbort discards everything (T2, transaction_manager.rs:910-962)") {
    val (s1, o1) = TxnAssembler.step(9,
      Seq(ev(Ctl.StreamStart, 10, 9), ev("c", 11, 9), ev(Ctl.StreamAbort, 12, 9)), None)
    assert(o1.isEmpty && s1.isEmpty)
  }

  test("step: out-of-order arrival within a batch is LSN-sorted") {
    val batch = Seq(ev(Ctl.Commit, 4, 7), ev("c", 2, 7), ev(Ctl.Begin, 1, 7), ev("c", 3, 7))
    val (_, out) = TxnAssembler.step(7, batch, None)
    assert(out.head.events.map(_.lsn) == Seq(2, 3))
  }

  test("streaming: interleaved streamed txids assemble independently (producer.rs:99-100)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val mem = MemoryStream[CdcEvent]
    val q = TxnAssembler.assemble(mem.toDS())
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("txns").start()
    try {
      // two streamed txs interleaved + one normal tx
      mem.addData(
        ev(Ctl.StreamStart, 1, 100), ev("c", 2, 100),
        ev(Ctl.StreamStart, 3, 200), ev("c", 4, 200),
        ev(Ctl.Begin, 5, 300), ev("c", 6, 300), ev(Ctl.Commit, 7, 300))
      q.processAllAvailable()
      var got = spark.sql("SELECT txid FROM txns").as[Long].collect().toSet
      assert(got == Set(300L))
      mem.addData(ev(Ctl.StreamCommit, 8, 100), ev(Ctl.StreamAbort, 9, 200))
      q.processAllAvailable()
      got = spark.sql("SELECT txid FROM txns").as[Long].collect().toSet
      assert(got == Set(300L, 100L)) // 200 aborted, never emitted
      val ev100 = spark.sql("SELECT events FROM txns WHERE txid = 100").collect()
      assert(ev100.length == 1)
    } finally q.stop()
  }

  test("abandoned txid state is evicted on timeout (TestGroupState, no clock)") {
    // A txid that opens but never commits must not leak state forever
    // (the reference leaks the same state, producer.rs:99-100).
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val timeoutMs = Some(60000L)
    // 1) open a tx: state kept, processing-time timeout registered
    val s1 = TestGroupState.create[TxnAssembler.TxBuf](
      Optional.empty[TxnAssembler.TxBuf](), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = TxnAssembler.groupFn(timeoutMs)(
      500L, Iterator(ev(Ctl.Begin, 1, 500), ev("c", 2, 500)), s1)
    assert(out1.isEmpty && s1.isUpdated)
    assert(s1.getTimeoutTimestampMs.isPresent &&
      s1.getTimeoutTimestampMs.get() == 61000L)
    // 2) the timeout fires with no new events: state evicted, no output
    val s2 = TestGroupState.create[TxnAssembler.TxBuf](
      Optional.of(s1.get), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 61001L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = TxnAssembler.groupFn(timeoutMs)(500L, Iterator.empty, s2)
    assert(out2.isEmpty && s2.isRemoved,
      "abandoned state must be dropped when the timeout fires")
    // 3) a late Commit after eviction seals an EMPTY transaction — the
    // pre-eviction events are gone, exactly like a WAL-replay boundary
    val s3 = TestGroupState.create[TxnAssembler.TxBuf](
      Optional.empty[TxnAssembler.TxBuf](), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 70000L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val out3 = TxnAssembler.groupFn(timeoutMs)(
      500L, Iterator(ev(Ctl.Commit, 3, 500)), s3).toSeq
    assert(out3.size == 1 && out3.head.events.isEmpty)
  }

  test("without a timeout configured, no timeout is ever registered") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val s = TestGroupState.create[TxnAssembler.TxBuf](
      Optional.empty[TxnAssembler.TxBuf](), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    TxnAssembler.groupFn(None)(700L, Iterator(ev(Ctl.Begin, 1, 700), ev("c", 2, 700)), s)
    assert(s.isUpdated && !s.getTimeoutTimestampMs.isPresent)
  }

  test("batch assembly groups complete transactions") {
    import spark.implicits._
    val events = Seq(
      ev(Ctl.Begin, 1, 1), ev("c", 2, 1), ev(Ctl.Commit, 3, 1),
      ev(Ctl.Begin, 4, 2), ev("u", 5, 2), ev("d", 6, 2), ev(Ctl.Commit, 7, 2))
    val out = TxnAssembler.assembleBatch(events.toDS()).collect()
    assert(out.map(t => t.txid -> t.events.size).toMap == Map(1L -> 1, 2L -> 2))
  }
}
