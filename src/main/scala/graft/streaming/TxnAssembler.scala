package graft.streaming

import graft.model._
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** T1: transaction session-izer (reference producer.rs:98-343).
  *
  * The reference runs a state machine over the serial WAL stream: Begin
  * opens a normal transaction, DML appends, Commit seals; protocol-v2
  * streamed transactions arrive chunked (StreamStart/StreamStop segments,
  * StreamCommit seals, StreamAbort discards) and may interleave with each
  * other. Here the same machine is keyed state in
  * `flatMapGroupsWithState` — one state per txid, so interleaved streamed
  * transactions are handled by construction, and StreamAbort drops state
  * without ever touching the sink (T2: nothing is persisted until the
  * epoch containing the Commit is itself committed).
  */
object TxnAssembler {

  /** Control ops beyond the DML set (producer.rs match arms). */
  object Ctl {
    val Begin = "begin"
    val Commit = "commit"
    val StreamStart = "stream_start"
    val StreamStop = "stream_stop"
    val StreamCommit = "stream_commit"
    val StreamAbort = "stream_abort"
    // two-phase family (protocol v3+): Prepare parks the buffer (the
    // coordinator may commit much later, with other transactions in
    // between — keyed state holds it); CommitPrepared seals,
    // RollbackPrepared discards
    val Prepare = "prepare"
    val CommitPrepared = "commit_prepared"
    val RollbackPrepared = "rollback_prepared"
  }

  /** Buffered per-txid state. */
  final case class TxBuf(events: List[CdcEvent], streaming: Boolean, open: Boolean)

  implicit val txEnc: Encoder[CdcTransaction] = Encoders.product[CdcTransaction]
  implicit val bufEnc: Encoder[TxBuf] = Encoders.product[TxBuf]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong

  /** The per-group state transition; pure so it unit-tests without a
    * stream. Returns sealed transactions to emit. */
  def step(txid: Long, batch: Seq[CdcEvent], state: Option[TxBuf])
      : (Option[TxBuf], Seq[CdcTransaction]) = {
    var buf = state.getOrElse(TxBuf(Nil, streaming = false, open = false))
    val out = Seq.newBuilder[CdcTransaction]
    // WAL order within the group: events carry their LSN
    batch.sortBy(_.lsn).foreach { e =>
      e.op match {
        case Ctl.Begin =>
          buf = TxBuf(Nil, streaming = false, open = true)
        case Ctl.StreamStart =>
          buf = if (buf.open) buf.copy(streaming = true)
            else TxBuf(Nil, streaming = true, open = true)
        case Ctl.StreamStop => // segment boundary: keep buffering
        case Ctl.Prepare => // prepared: park until Commit/Rollback Prepared
        case Ctl.Commit | Ctl.StreamCommit | Ctl.CommitPrepared =>
          val events = buf.events.reverse
          out += CdcTransaction(txid, e.lsn, e.commitTs, events)
          buf = TxBuf(Nil, streaming = false, open = false)
        case Ctl.StreamAbort | Ctl.RollbackPrepared =>
          buf = TxBuf(Nil, streaming = false, open = false)
        case _ =>
          buf = buf.copy(events = e :: buf.events, open = true)
          // envelope-marked commit (is_final_batch on the last DML of a
          // tx, types.rs:66-70): seal without a separate Commit event —
          // the wire shape the cdcwal source delivers
          if (e.isFinalBatch) {
            out += CdcTransaction(txid, e.lsn, e.commitTs, buf.events.reverse)
            buf = TxBuf(Nil, streaming = false, open = false)
          }
      }
    }
    val keep = if (buf.open || buf.events.nonEmpty) Some(buf) else None
    (keep, out.result())
  }

  /** Streaming form: one state entry per in-flight txid.
    *
    * `abandonedTxTimeoutMs` evicts state for a txid that stops arriving
    * without ever sealing (a producer crash mid-transaction). The
    * reference holds the same state in an unbounded HashMap and leaks it
    * forever (producer.rs:99-100) — the timeout is a strict improvement:
    * without it, 100 TB of WAL with occasional dead txids grows executor
    * state without bound. A late Commit after eviction seals an empty
    * transaction, which is exactly what replaying the WAL range delivers
    * anyway (the epoch that buffered the lost events was never
    * committed). */
  def assemble(events: Dataset[CdcEvent],
               abandonedTxTimeoutMs: Option[Long] = None): Dataset[CdcTransaction] = {
    val timeoutConf =
      if (abandonedTxTimeoutMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.txid)
      .flatMapGroupsWithState[TxBuf, CdcTransaction](
        OutputMode.Append, timeoutConf)(groupFn(abandonedTxTimeoutMs))
  }

  /** The per-group streaming callback, factored out so the timeout path
    * is testable with `TestGroupState` (no wall clock, no query). */
  private[graft] def groupFn(abandonedTxTimeoutMs: Option[Long])(
      txid: Long, it: Iterator[CdcEvent],
      state: GroupState[TxBuf]): Iterator[CdcTransaction] =
    if (state.hasTimedOut) {
      state.remove() // abandoned txid: discard, emit nothing (T2 analog)
      Iterator.empty
    } else {
      val (keep, out) = step(txid, it.toSeq, state.getOption)
      keep match {
        case Some(b) =>
          state.update(b)
          abandonedTxTimeoutMs.foreach(state.setTimeoutDuration)
        case None => if (state.exists) state.remove()
      }
      out.iterator
    }

  /** Batch form (backfill / recovery replay): pgoutput delivers committed
    * transactions contiguously, so grouping by txid and sorting by LSN
    * reproduces the same sealed transactions (SURVEY §2.2 T1 note). */
  def assembleBatch(events: Dataset[CdcEvent]): Dataset[CdcTransaction] = {
    events
      .groupByKey(_.txid)
      .flatMapGroups { (txid: Long, it: Iterator[CdcEvent]) =>
        step(txid, it.toSeq, None)._2.iterator
      }
  }
}
