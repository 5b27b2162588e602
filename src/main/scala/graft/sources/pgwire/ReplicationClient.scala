package graft.sources.pgwire

import graft.model.Lsn
import graft.sources.cdcwal.WalSegmentIO
import graft.streaming.GraftConfig
import java.io.{BufferedOutputStream, File, FileOutputStream}
import java.nio.ByteBuffer

/** The live capture loop: a logical-replication walsender session →
  * framed `.pgo` segment files that CdcWalSource already consumes.
  *
  * This closes the reference's external-capture seam (SURVEY S1,
  * producer.rs:128-133): handshake → START_REPLICATION → CopyBoth, then
  *   - XLogData frames append [lsn][len][payload] to the current open
  *     segment (flushed at commit boundaries, so a reader sees whole
  *     transactions; a torn tail frame is tolerated by readPgo);
  *   - segments rotate at `segmentBytes`, but ONLY at transaction-idle
  *     points (after Commit/Prepare/StreamStop/StreamCommit/abort
  *     frames) — never between Begin..Commit or inside a stream block,
  *     where a fresh per-segment decoder would lose the txid/inStream
  *     framing; every new segment is SELF-CONTAINED: the cached
  *     Relation/Type messages re-emit at its head (the invariant
  *     WalSegmentIO documents, mirroring pgoutput's own per-session
  *     relation re-send);
  *   - keepalives (and a wall-clock interval) answer with Standby Status
  *     Update carrying the sink's `flush.lsn` ACK — the slot's
  *     confirmed_flush advances only past data the DESTINATION flushed,
  *     the reference's exactly-once anchor (lsn_tracker.rs:201-460).
  *
  * The transport is injected, so the entire loop — rotation, relation
  * re-emission, feedback, drain — runs under tests against a scripted
  * fake; `PgWire.socketTransport` provides the TCP production form.
  */
final class ReplicationClient(
    transport: PgWire.WireTransport,
    cfg: GraftConfig,
    walDir: String,
    statusIntervalMicros: Long = 10L * 1000 * 1000,
    clockMicros: () => Long = () => System.currentTimeMillis() * 1000L,
    syncEveryBytes: Long = 8L * 1024 * 1024) {

  import ReplicationProtocol._

  @volatile private var stopRequested = false
  /** Test/ops instrumentation: status updates sent (lsn values). */
  val statusUpdatesSent = new java.util.concurrent.CopyOnWriteArrayList[Long]()

  // relation/type cache for segment self-containment, keyed to keep the
  // LAST schema version per relid (schema evolution mid-stream)
  private var relationCache = Vector.empty[(String, Array[Byte])]
  private def cacheMeta(payload: Array[Byte]): Unit = {
    val tag = payload(0).toChar
    if (tag == 'R' || tag == 'Y') {
      // key = tag + relid/typeoid (bytes 1-4); stream variants carry an
      // xid first, but metadata re-sent at stream start is also cached
      val key = tag + ByteBuffer.wrap(payload, 1, 4).getInt.toString
      relationCache = relationCache.filterNot(_._1 == key) :+ (key -> payload)
    }
  }

  private var seg: BufferedOutputStream = _
  private var segFile: File = _
  private var segBytes = 0L
  private var segIndex = 0
  private var lastReceived = 0L
  // Transaction framing state: a segment may only begin at a point where
  // a FRESH decoder (PgOutputAssembler.State()) can pick up — i.e. not
  // between Begin..Commit / BeginPrepare..Prepare of a normal tx and not
  // inside a StreamStart..StreamStop block. Rotating mid-frame would
  // orphan the new segment's DML (txid=0, lost inStream) because only
  // Relation/Type metadata re-emits at the segment head.
  private var txIdle = true
  // intra-segment seek index (the reference's gzip sync-point analog,
  // storage/compressed.rs:20-58): sync entries (byteOffset, maxLsn) at
  // tx-idle flush points every `syncEveryBytes`, plus the byte spans of
  // every Relation/Type frame so a seeking reader can rebuild the
  // metadata cache without decoding the skipped data frames
  private var syncEntries = Vector.empty[(Long, Long)]
  private var metaFrames = Vector.empty[(Long, Int)]
  private var lastSyncOffset = 0L

  private def openSegment(atLsn: Long): Unit = {
    segIndex += 1
    segFile = new File(walDir, f"segment-$segIndex%06d.pgo")
    seg = new BufferedOutputStream(new FileOutputStream(segFile))
    segBytes = 0L
    syncEntries = Vector.empty
    metaFrames = Vector.empty
    lastSyncOffset = 0L
    relationCache.foreach { case (_, payload) => append(atLsn, payload) }
  }

  private def append(lsn: Long, payload: Array[Byte]): Unit = {
    val tag = payload(0).toChar
    if (tag == 'R' || tag == 'Y')
      metaFrames :+= (segBytes, 12 + payload.length)
    val header = ByteBuffer.allocate(12)
    header.putLong(lsn); header.putInt(payload.length)
    seg.write(header.array()); seg.write(payload)
    segBytes += 12 + payload.length
  }

  /** At a tx-idle flush point: record a sync entry if enough bytes
    * accumulated, and (re)write the tiny `.idx` sidecar atomically. A
    * fresh decoder state is valid at exactly these offsets (same
    * invariant as segment rotation), given the metadata frames are
    * replayed first — which is what the `m` entries are for. */
  private def maybeSync(): Unit =
    if (segBytes - lastSyncOffset >= syncEveryBytes) {
      syncEntries :+= (segBytes, lastReceived)
      lastSyncOffset = segBytes
      val sb = new StringBuilder
      metaFrames.foreach { case (off, len) => sb.append(s"m $off $len\n") }
      syncEntries.foreach { case (off, lsn) => sb.append(s"s $off $lsn\n") }
      val tmp = new File(walDir, segFile.getName + ".idx.tmp")
      java.nio.file.Files.writeString(tmp.toPath, sb.toString)
      java.nio.file.Files.move(tmp.toPath,
        new File(walDir, segFile.getName + ".idx").toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

  /** Rotate only when the just-appended frame left the stream at a
    * transaction boundary AND the segment is over size — a huge single
    * transaction therefore grows its segment past `segmentBytes` (the
    * reference's per-tx segment files have the same disk bound,
    * transaction_manager.rs:638-706); what is never allowed is a
    * boundary mid-transaction. */
  private def maybeRotate(nextLsn: Long): Unit =
    if (txIdle && segBytes >= cfg.segmentBytes) {
      seg.close()
      openSegment(nextLsn)
    }

  private def sendStatus(replyRequested: Boolean): Unit = {
    // written = all WAL persisted to segments; flushed/applied = what
    // the destination sink ACKed via the flush.lsn feedback file
    val flushed = WalSegmentIO.readFeedback(walDir).getOrElse(0L)
    transport.send(PgWire.copyData(encodeStandbyStatus(
      written = lastReceived, flushed = flushed, applied = flushed,
      clockMicros = clockMicros(), replyRequested = replyRequested)))
    statusUpdatesSent.add(flushed)
  }

  /** Ask the loop to drain: close the COPY stream and finish. */
  def stop(): Unit = stopRequested = true

  /** Run the capture session to completion (drain or server close).
    * Returns the last WAL position received. */
  def run(startLsn: Lsn): Long = {
    new File(walDir).mkdirs()
    // resume numbering after any segments from a previous session —
    // never overwrite WAL already captured
    segIndex = WalSegmentIO.segmentFiles(walDir)
      .map(_.getName.stripPrefix("segment-").takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(_.toInt).maxOption.getOrElse(0)
    transport.send(PgWire.query(startReplicationCommand(cfg, startLsn)))
    // expect CopyBothResponse (errors surface as ErrorResponse)
    var inCopy = false
    while (!inCopy) {
      val m = transport.read()
      m.tag match {
        case 'W' => inCopy = true
        case 'E' => throw new PgWire.WireException(PgWire.parseError(m.body))
        case 'S' | 'N' => ()
        case other => throw new PgWire.WireException(
          s"unexpected '$other' awaiting CopyBothResponse")
      }
    }
    openSegment(startLsn.value)
    var lastStatus = clockMicros()
    var done = false
    try {
      while (!done) {
        if (stopRequested) {
          // graceful drain (O4): final feedback, end the COPY stream
          sendStatus(replyRequested = false)
          transport.send(PgWire.copyDone)
          transport.send(PgWire.terminate)
          done = true
        } else {
          val m = transport.read()
          m.tag match {
            case 'd' => decodeWalFrame(m.body) match {
              case XLogData(walStart, _, _, payload) =>
                lastReceived = math.max(lastReceived, walStart)
                cacheMeta(payload)
                // rotate LAZILY, before the next frame while still idle —
                // an over-size segment waits here until the in-flight tx
                // seals, and the new segment always opens with a fresh
                // transaction (never a trailing metadata-only segment)
                maybeRotate(walStart)
                append(walStart, payload)
                payload(0).toChar match {
                  case 'B' | 'b' | 'S' => txIdle = false // tx/block opens
                  case 'C' | 'P' | 'E' | 'c' | 'A' | 'K' | 'r' | 'p' =>
                    // tx sealed / parked / block closed: flush so readers
                    // see whole transactions
                    txIdle = true
                    seg.flush()
                    maybeSync()
                  case _ => () // DML / Relation / Type / Origin / Message
                }
              case Keepalive(walEnd, _, replyRequested) =>
                lastReceived = math.max(lastReceived, walEnd)
                if (replyRequested) { sendStatus(replyRequested = false); lastStatus = clockMicros() }
            }
            case 'c' => done = true // server ended the COPY stream
            case 'E' =>
              throw new PgWire.WireException(PgWire.parseError(m.body))
            case 'Z' | 'C' | 'S' | 'N' => () // end-of-copy bookkeeping
            case other =>
              throw new PgWire.WireException(s"unexpected '$other' in CopyBoth")
          }
          if (clockMicros() - lastStatus >= statusIntervalMicros) {
            sendStatus(replyRequested = false)
            lastStatus = clockMicros()
          }
        }
      }
    } finally {
      seg.flush(); seg.close()
    }
    lastReceived
  }
}
