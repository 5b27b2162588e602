package graft.sources.pgoutput

import graft.model.{CdcColumn, CdcEvent, ReplicaIdentity}
import graft.sources.pgoutput.PgOutputDecoder._
import graft.streaming.TxnAssembler.Ctl

/** Fold decoded pgoutput messages into the engine's event envelope.
  *
  * Each replication XLogData frame supplies (walStart LSN, payload);
  * the assembler tracks the relation cache (Relation messages describe
  * the schema for subsequent DML on that relid), the current normal
  * transaction's xid, the in-stream flag (protocol v2 xid prefixes),
  * and the current replication origin (the F4 discriminator). Output
  * ops are exactly the `TxnAssembler.Ctl` vocabulary plus c/u/d/t, so
  * `TxnAssembler.assemble` consumes the stream unchanged.
  *
  * Value mapping mirrors the type-erased model (SURVEY §1.2): text
  * datums pass through, binary datums become `\x`-hex (the dialect
  * layer re-renders per destination), unchanged-TOAST columns are
  * omitted (the destination keeps its current value — only possible on
  * UPDATE new-images).
  */
object PgOutputAssembler {

  final case class State(relations: Map[Int, RelationMsg] = Map.empty,
                         currentXid: Long = 0L,
                         origin: String = null,
                         inStream: Boolean = false)

  private def identOf(c: Char): String = c match {
    case 'd' => ReplicaIdentity.Default
    case 'f' => ReplicaIdentity.Full
    case 'i' => ReplicaIdentity.Index
    case 'n' => ReplicaIdentity.Nothing
    case other => throw new DecodeException(s"unknown replica identity '$other'")
  }

  private def hex(bytes: Vector[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString("\\x", "", "")

  /** Zip a tuple against the relation's columns; Unchanged omitted. */
  private def columns(rel: RelationMsg, tuple: Vector[PgValue]): Seq[CdcColumn] =
    rel.columns.zip(tuple).collect {
      case (c, PgText(v)) => CdcColumn(c.name, v)
      case (c, PgBinary(b)) => CdcColumn(c.name, hex(b), isBinary = true)
      case (c, PgNull) => CdcColumn(c.name, null)
    }

  private def tsOf(micros: Long): java.sql.Timestamp = {
    val epochMicros = micros + PgEpochOffsetMicros
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(epochMicros, 1000000L),
      Math.floorMod(epochMicros, 1000000L) * 1000L))
  }

  private def rel(state: State, relId: Int): RelationMsg =
    state.relations.getOrElse(relId,
      throw new DecodeException(s"DML for unknown relation $relId (no Relation message seen)"))

  private def base(state: State, op: String, lsn: Long, xid: Long,
                   r: RelationMsg): CdcEvent =
    // isFinalBatch=false: pgoutput delimits transactions with explicit
    // Commit messages; the envelope-marked commit path is for transports
    // that lack them
    CdcEvent(op, lsn, xid, null, r.namespace, r.name, Nil, Nil,
      replicaIdentity = identOf(r.replicaIdentity),
      keyColumns = r.columns.filter(_.isKey).map(_.name),
      origin = state.origin, isFinalBatch = false)

  /** One XLogData frame → (state', emitted events). */
  def onFrame(state: State, walStart: Long,
              payload: Array[Byte]): (State, Seq[CdcEvent]) = {
    def dmlXid(msgXid: Option[Long]): Long = msgXid.getOrElse(state.currentXid)
    parse(payload, state.inStream) match {
      case BeginMsg(_, _, xid) =>
        (state.copy(currentXid = xid),
          Seq(CdcEvent(Ctl.Begin, walStart, xid, null, null, null, Nil, Nil,
            origin = state.origin)))
      case CommitMsg(_, commitLsn, _, ts) =>
        (state.copy(origin = null),
          Seq(CdcEvent(Ctl.Commit, math.max(walStart, commitLsn), state.currentXid,
            tsOf(ts), null, null, Nil, Nil, origin = state.origin)))
      case OriginMsg(_, name) => (state.copy(origin = name), Nil)
      case r: RelationMsg => (state.copy(relations = state.relations + (r.relId -> r)), Nil)
      case _: TypeMsg | _: MessageMsg => (state, Nil)
      case InsertMsg(xid, relId, newT) =>
        val r = rel(state, relId)
        (state, Seq(base(state, "c", walStart, dmlXid(xid), r)
          .copy(after = columns(r, newT))))
      case UpdateMsg(xid, relId, _, oldT, newT) =>
        val r = rel(state, relId)
        (state, Seq(base(state, "u", walStart, dmlXid(xid), r)
          .copy(before = oldT.map(columns(r, _)).getOrElse(Nil),
            after = columns(r, newT))))
      case DeleteMsg(xid, relId, _, oldT) =>
        val r = rel(state, relId)
        (state, Seq(base(state, "d", walStart, dmlXid(xid), r)
          .copy(before = columns(r, oldT))))
      case TruncateMsg(xid, _, relIds) =>
        val tables = relIds.map(id => {
          val r = rel(state, id)
          if (r.namespace == null || r.namespace.isEmpty) r.name
          else s"${r.namespace}.${r.name}"
        })
        (state, Seq(CdcEvent("t", walStart, dmlXid(xid), null, null,
          tables.headOption.orNull, Nil, Nil, truncateTables = tables,
          origin = state.origin, isFinalBatch = false)))
      case StreamStartMsg(xid, _) =>
        (state.copy(inStream = true),
          Seq(CdcEvent(Ctl.StreamStart, walStart, xid, null, null, null, Nil, Nil)))
      case StreamStopMsg =>
        (state.copy(inStream = false),
          Seq(CdcEvent(Ctl.StreamStop, walStart, 0L, null, null, null, Nil, Nil)))
      case StreamCommitMsg(xid, _, _, _, ts) =>
        (state, Seq(CdcEvent(Ctl.StreamCommit, walStart, xid, tsOf(ts),
          null, null, Nil, Nil)))
      case StreamAbortMsg(xid, _) =>
        (state, Seq(CdcEvent(Ctl.StreamAbort, walStart, xid, null, null, null,
          Nil, Nil)))
      // two-phase (v3+): BeginPrepare opens like Begin (carries its xid
      // up front); Prepare parks the buffer; CommitPrepared seals it —
      // possibly much later, and txid-keyed assembly tolerates any
      // interleaving in between; RollbackPrepared discards. The v4
      // StreamPrepare parks a streamed transaction the same way.
      case BeginPrepareMsg(_, _, _, xid, _) =>
        (state.copy(currentXid = xid),
          Seq(CdcEvent(Ctl.Begin, walStart, xid, null, null, null, Nil, Nil,
            origin = state.origin)))
      case PrepareMsg(_, prepareLsn, _, ts, xid, _) =>
        (state.copy(origin = null),
          Seq(CdcEvent(Ctl.Prepare, math.max(walStart, prepareLsn), xid,
            tsOf(ts), null, null, Nil, Nil, origin = state.origin)))
      case StreamPrepareMsg(_, prepareLsn, _, ts, xid, _) =>
        (state, Seq(CdcEvent(Ctl.Prepare, math.max(walStart, prepareLsn), xid,
          tsOf(ts), null, null, Nil, Nil)))
      case CommitPreparedMsg(_, commitLsn, _, ts, xid, _) =>
        (state, Seq(CdcEvent(Ctl.CommitPrepared, math.max(walStart, commitLsn),
          xid, tsOf(ts), null, null, Nil, Nil)))
      case RollbackPreparedMsg(_, _, _, _, ts, xid, _) =>
        (state, Seq(CdcEvent(Ctl.RollbackPrepared, walStart, xid, tsOf(ts),
          null, null, Nil, Nil)))
    }
  }

  /** Fold a whole frame sequence (recovery replay / tests). */
  def assembleAll(frames: Seq[(Long, Array[Byte])],
                  init: State = State()): (State, Seq[CdcEvent]) =
    frames.foldLeft((init, Vector.empty[CdcEvent])) {
      case ((st, acc), (lsn, payload)) =>
        val (st2, evs) = onFrame(st, lsn, payload)
        (st2, acc ++ evs)
    }
}
