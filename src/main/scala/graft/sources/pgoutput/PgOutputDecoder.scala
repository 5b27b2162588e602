package graft.sources.pgoutput

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Decoder for PostgreSQL's `pgoutput` logical-decoding binary format
  * (public wire protocol: PostgreSQL docs, "Logical Streaming
  * Replication Protocol" / "Logical Replication Message Formats";
  * protocol versions 1–4).
  *
  * This is the layer the reference delegates to its external capture
  * crate (SURVEY S1): each replication XLogData frame carries one of
  * these messages as payload. With this decoder in place, the only
  * remaining external piece is the replication SOCKET itself — a
  * transport swap inside WalSegmentIO (its stated seam), not a format
  * concern.
  *
  * All integers are big-endian. Timestamps are microseconds since
  * 2000-01-01T00:00:00Z. In streamed (protocol v2+) transactions, DML
  * and Relation/Truncate messages carry an Int32 xid immediately after
  * the type byte — the caller signals that context via `inStream`.
  */
object PgOutputDecoder {

  /** Microseconds between the PostgreSQL epoch (2000-01-01) and the
    * Unix epoch. */
  val PgEpochOffsetMicros: Long = 946684800000000L

  sealed trait PgValue
  case object PgNull extends PgValue
  /** Unchanged TOAST datum — value not sent; consumers keep the old. */
  case object PgUnchanged extends PgValue
  final case class PgText(value: String) extends PgValue
  final case class PgBinary(bytes: Vector[Byte]) extends PgValue

  final case class RelCol(name: String, isKey: Boolean, typeOid: Int, typeMod: Int)

  sealed trait PgMessage
  final case class BeginMsg(finalLsn: Long, commitTsMicros: Long, xid: Long)
      extends PgMessage
  final case class CommitMsg(flags: Int, commitLsn: Long, endLsn: Long,
                             commitTsMicros: Long) extends PgMessage
  final case class OriginMsg(originLsn: Long, name: String) extends PgMessage
  final case class RelationMsg(xid: Option[Long], relId: Int, namespace: String,
                               name: String, replicaIdentity: Char,
                               columns: Vector[RelCol]) extends PgMessage
  final case class TypeMsg(xid: Option[Long], typeOid: Int, namespace: String,
                           name: String) extends PgMessage
  final case class InsertMsg(xid: Option[Long], relId: Int,
                             newTuple: Vector[PgValue]) extends PgMessage
  final case class UpdateMsg(xid: Option[Long], relId: Int,
                             oldKind: Option[Char], oldTuple: Option[Vector[PgValue]],
                             newTuple: Vector[PgValue]) extends PgMessage
  final case class DeleteMsg(xid: Option[Long], relId: Int, oldKind: Char,
                             oldTuple: Vector[PgValue]) extends PgMessage
  final case class TruncateMsg(xid: Option[Long], options: Int,
                               relIds: Vector[Int]) extends PgMessage
  final case class MessageMsg(xid: Option[Long], transactional: Boolean,
                              lsn: Long, prefix: String,
                              content: Vector[Byte]) extends PgMessage
  final case class StreamStartMsg(xid: Long, firstSegment: Boolean) extends PgMessage
  case object StreamStopMsg extends PgMessage
  final case class StreamCommitMsg(xid: Long, flags: Int, commitLsn: Long,
                                   endLsn: Long, commitTsMicros: Long) extends PgMessage
  final case class StreamAbortMsg(xid: Long, subXid: Long) extends PgMessage
  // two-phase commit family (protocol v3+; Stream Prepare v4)
  final case class BeginPrepareMsg(prepareLsn: Long, endLsn: Long,
                                   tsMicros: Long, xid: Long, gid: String) extends PgMessage
  final case class PrepareMsg(flags: Int, prepareLsn: Long, endLsn: Long,
                              tsMicros: Long, xid: Long, gid: String) extends PgMessage
  final case class CommitPreparedMsg(flags: Int, commitLsn: Long, endLsn: Long,
                                     tsMicros: Long, xid: Long, gid: String) extends PgMessage
  final case class RollbackPreparedMsg(flags: Int, prepareEndLsn: Long,
                                       rollbackEndLsn: Long, prepareTsMicros: Long,
                                       rollbackTsMicros: Long, xid: Long,
                                       gid: String) extends PgMessage
  final case class StreamPrepareMsg(flags: Int, prepareLsn: Long, endLsn: Long,
                                    tsMicros: Long, xid: Long, gid: String) extends PgMessage

  final class DecodeException(msg: String) extends RuntimeException(msg)

  private def cstr(b: ByteBuffer): String = {
    val sb = new java.io.ByteArrayOutputStream()
    var c = b.get()
    while (c != 0) { sb.write(c); c = b.get() }
    new String(sb.toByteArray, UTF_8)
  }

  private def uint32(b: ByteBuffer): Long = b.getInt() & 0xffffffffL

  private def tupleData(b: ByteBuffer): Vector[PgValue] = {
    val n = b.getShort() & 0xffff
    Vector.fill(n) {
      (b.get().toChar: @unchecked) match {
        case 'n' => PgNull
        case 'u' => PgUnchanged
        case 't' =>
          val len = b.getInt()
          val bytes = new Array[Byte](len); b.get(bytes)
          PgText(new String(bytes, UTF_8))
        case 'b' =>
          val len = b.getInt()
          val bytes = new Array[Byte](len); b.get(bytes)
          PgBinary(bytes.toVector)
        case other => throw new DecodeException(s"unknown tuple column kind '$other'")
      }
    }
  }

  private def maybeXid(b: ByteBuffer, inStream: Boolean): Option[Long] =
    if (inStream) Some(uint32(b)) else None

  /** One pgoutput message (the payload of one XLogData frame). */
  def parse(payload: Array[Byte], inStream: Boolean = false): PgMessage = {
    val b = ByteBuffer.wrap(payload) // big-endian by default
    (b.get().toChar: @unchecked) match {
      case 'B' => BeginMsg(b.getLong(), b.getLong(), uint32(b))
      case 'C' => CommitMsg(b.get().toInt, b.getLong(), b.getLong(), b.getLong())
      case 'O' => OriginMsg(b.getLong(), cstr(b))
      case 'R' =>
        val xid = maybeXid(b, inStream)
        val relId = b.getInt()
        val ns = cstr(b); val name = cstr(b)
        val ident = b.get().toChar
        val ncols = b.getShort() & 0xffff
        val cols = Vector.fill(ncols) {
          val flags = b.get()
          RelCol(cstr(b), (flags & 0x1) != 0, b.getInt(), b.getInt())
        }
        RelationMsg(xid, relId, ns, name, ident, cols)
      case 'Y' =>
        val xid = maybeXid(b, inStream)
        TypeMsg(xid, b.getInt(), cstr(b), cstr(b))
      case 'I' =>
        val xid = maybeXid(b, inStream)
        val relId = b.getInt()
        val kind = b.get().toChar
        if (kind != 'N') throw new DecodeException(s"INSERT expects 'N', got '$kind'")
        InsertMsg(xid, relId, tupleData(b))
      case 'U' =>
        val xid = maybeXid(b, inStream)
        val relId = b.getInt()
        var oldKind: Option[Char] = None
        var oldTuple: Option[Vector[PgValue]] = None
        var k = b.get().toChar
        if (k == 'K' || k == 'O') {
          oldKind = Some(k); oldTuple = Some(tupleData(b)); k = b.get().toChar
        }
        if (k != 'N') throw new DecodeException(s"UPDATE expects 'N', got '$k'")
        UpdateMsg(xid, relId, oldKind, oldTuple, tupleData(b))
      case 'D' =>
        val xid = maybeXid(b, inStream)
        val relId = b.getInt()
        val kind = b.get().toChar
        if (kind != 'K' && kind != 'O')
          throw new DecodeException(s"DELETE expects 'K'/'O', got '$kind'")
        DeleteMsg(xid, relId, kind, tupleData(b))
      case 'T' =>
        val xid = maybeXid(b, inStream)
        val n = b.getInt()
        val options = b.get().toInt
        TruncateMsg(xid, options, Vector.fill(n)(b.getInt()))
      case 'M' =>
        val xid = maybeXid(b, inStream)
        val transactional = b.get() != 0
        val lsn = b.getLong()
        val prefix = cstr(b)
        val len = b.getInt()
        val content = new Array[Byte](len); b.get(content)
        MessageMsg(xid, transactional, lsn, prefix, content.toVector)
      case 'S' => StreamStartMsg(uint32(b), b.get() == 1)
      case 'E' => StreamStopMsg
      case 'c' => StreamCommitMsg(uint32(b), b.get().toInt,
        b.getLong(), b.getLong(), b.getLong())
      case 'A' => StreamAbortMsg(uint32(b), uint32(b))
      // two-phase (v3+): Begin Prepare / Prepare / Commit Prepared /
      // Rollback Prepared; Stream Prepare is the v4 streamed form
      case 'b' => BeginPrepareMsg(b.getLong(), b.getLong(), b.getLong(),
        uint32(b), cstr(b))
      case 'P' => PrepareMsg(b.get().toInt, b.getLong(), b.getLong(),
        b.getLong(), uint32(b), cstr(b))
      case 'K' => CommitPreparedMsg(b.get().toInt, b.getLong(), b.getLong(),
        b.getLong(), uint32(b), cstr(b))
      case 'r' => RollbackPreparedMsg(b.get().toInt, b.getLong(), b.getLong(),
        b.getLong(), b.getLong(), uint32(b), cstr(b))
      case 'p' => StreamPrepareMsg(b.get().toInt, b.getLong(), b.getLong(),
        b.getLong(), uint32(b), cstr(b))
      case other => throw new DecodeException(s"unknown pgoutput message '$other'")
    }
  }
}
