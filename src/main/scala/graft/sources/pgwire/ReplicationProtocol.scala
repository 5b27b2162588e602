package graft.sources.pgwire

import graft.model.Lsn
import graft.streaming.{GraftConfig, OriginFilter}
import java.nio.ByteBuffer

/** Codecs for the PostgreSQL streaming-replication sub-protocol — the
  * CopyBoth payloads that flow once `START_REPLICATION` is accepted
  * (public wire protocol: PostgreSQL docs, "Streaming Replication
  * Protocol"). This is the layer the reference delegates to its external
  * capture crate (SURVEY S1, producer.rs:128-133): XLogData frames carry
  * the pgoutput messages PgOutputDecoder already parses; keepalives and
  * standby status updates carry the flush-LSN feedback loop
  * (lsn_tracker.rs's flush discipline).
  *
  * Everything here is pure bytes→case-class→bytes, so the whole protocol
  * is exercised by tests with no server.
  */
object ReplicationProtocol {

  /** Microseconds between the PostgreSQL epoch (2000-01-01) and the Unix
    * epoch (shared with pgoutput timestamps). */
  val PgEpochOffsetMicros: Long =
    graft.sources.pgoutput.PgOutputDecoder.PgEpochOffsetMicros

  /** One server→client CopyData payload in replication mode. */
  sealed trait WalFrame
  /** 'w': a chunk of WAL — `payload` is one pgoutput message. */
  final case class XLogData(walStart: Long, walEnd: Long,
                            sendTimeMicros: Long, payload: Array[Byte]) extends WalFrame
  /** 'k': primary keepalive; `replyRequested` demands a status update. */
  final case class Keepalive(walEnd: Long, sendTimeMicros: Long,
                             replyRequested: Boolean) extends WalFrame

  final class ProtocolException(msg: String) extends RuntimeException(msg)

  /** Decode one CopyData payload received in CopyBoth mode. */
  def decodeWalFrame(data: Array[Byte]): WalFrame = {
    val b = ByteBuffer.wrap(data)
    b.get().toChar match {
      case 'w' =>
        val start = b.getLong(); val end = b.getLong(); val ts = b.getLong()
        val payload = new Array[Byte](b.remaining()); b.get(payload)
        XLogData(start, end, ts, payload)
      case 'k' =>
        Keepalive(b.getLong(), b.getLong(), b.get() != 0)
      case other =>
        throw new ProtocolException(s"unexpected replication frame '$other'")
    }
  }

  /** Encode a client→server Standby Status Update ('r'): the feedback
    * that lets the server advance the slot's confirmed_flush_lsn — the
    * exactly-once anchor (reference lsn_tracker.rs:201-460; here the
    * flushed value comes from the sink's `flush.lsn` ACK file). */
  def encodeStandbyStatus(written: Long, flushed: Long, applied: Long,
                          clockMicros: Long, replyRequested: Boolean = false): Array[Byte] = {
    val b = ByteBuffer.allocate(34)
    b.put('r'.toByte)
    b.putLong(written); b.putLong(flushed); b.putLong(applied)
    b.putLong(clockMicros - PgEpochOffsetMicros)
    b.put(if (replyRequested) 1.toByte else 0.toByte)
    b.array()
  }

  /** SQL-literal-escape a pgoutput option value (single quotes double). */
  private def lit(v: String): String = "'" + v.replace("'", "''") + "'"

  /** A publication name as a quoted identifier inside the
    * publication_names option value. */
  private def pubIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Build `START_REPLICATION SLOT ... LOGICAL ...` with the pgoutput
    * option set derived from the validated config (the same
    * option-bridging the reference does in config.rs:747-765). The slot
    * name is interpolated bare, so it MUST have passed
    * GraftConfig.validateSlotName (slot.rs:99-115's injection guard) —
    * enforced here again by construction. */
  def startReplicationCommand(cfg: GraftConfig, start: Lsn): String = {
    GraftConfig.validateSlotName(cfg.slotName).foreach(err =>
      throw new IllegalArgumentException(err))
    val opts = Seq.newBuilder[String]
    opts += s"proto_version ${lit(cfg.protocolVersion.toString)}"
    opts += s"publication_names ${lit(pubIdent(cfg.publication))}"
    if (cfg.streaming) opts += s"streaming ${lit("true")}"
    if (cfg.twoPhase) opts += s"two_phase ${lit("true")}"
    cfg.originFilter match {
      // server-side origin suppression (pgoutput `origin` option):
      // 'none' drops remotely-originated changes at the source. A
      // specific-origin filter stays client-side (F4) — pgoutput only
      // supports none/any.
      case OriginFilter.NoOrigin => opts += s"origin ${lit("none")}"
      case _ => ()
    }
    s"START_REPLICATION SLOT ${cfg.slotName} LOGICAL $start " +
      opts.result().mkString("(", ", ", ")")
  }

  /** `CREATE_REPLICATION_SLOT` for first-run provisioning (S2's
    * slot-first discipline; SlotReconcile decides whether to call it). */
  def createSlotCommand(cfg: GraftConfig): String = {
    GraftConfig.validateSlotName(cfg.slotName).foreach(err =>
      throw new IllegalArgumentException(err))
    s"CREATE_REPLICATION_SLOT ${cfg.slotName} LOGICAL pgoutput NOEXPORT_SNAPSHOT"
  }
}
