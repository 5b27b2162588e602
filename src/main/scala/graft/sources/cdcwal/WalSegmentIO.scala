package graft.sources.cdcwal

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.unsafe.types.UTF8String
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** File transport for the cdcwal source: JSON-line WAL segments.
  *
  * Segment files are `segment-*.jsonl`, one event per line:
  * {"op":"c","lsn":1,"txid":1,"commitTsMs":0,"schema":"public",
  *  "table":"t1","before":[...],"after":[{"name":"id","value":"1"}],
  *  "replicaIdentity":"DEFAULT","keyColumns":["id"],"commit":true}
  * `commit:true` marks a commit boundary (the event is the last of its
  * transaction) — mirroring is_final_batch (types.rs:66-70).
  *
  * Segment-level pruning: each segment's [minLsn, maxLsn, counts] is
  * computed once and cached per JVM, keyed by (path, length, mtime) —
  * a sealed segment is never re-read on later triggers, so per-trigger
  * cost is O(new segments), not O(all WAL retained). This mirrors the
  * structure the reference's `{txid}_{seq:06}` segment naming carries
  * (transaction_manager.rs:434-437). An appended-to (still-open)
  * segment changes length and is re-scanned — correct, since its range
  * is still growing.
  */
object WalSegmentIO {

  private val mapper = new ObjectMapper()

  /** Cached per-segment metadata (the seek index the reference keeps in
    * its segment names + .meta files). `events`=0 marks an empty file. */
  final case class SegMeta(min: Long, max: Long, events: Int,
                           firstCommit: Option[Long], lastCommit: Option[Long])

  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, SegMeta)]()

  /** Test instrumentation: number of segment-file opens since JVM start. */
  val filesOpened = new java.util.concurrent.atomic.AtomicLong(0)

  /** Test instrumentation: bytes actually fetched from segment files —
    * the observable for the intra-segment seek contract (a tail-range
    * read of an indexed segment fetches ≪ the segment size). */
  val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)

  def segmentFiles(dir: String): Seq[File] = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("segment-") &&
        (f.getName.endsWith(".jsonl") || f.getName.endsWith(".jsonl.gz") ||
          f.getName.endsWith(".pgo")))
      .sortBy(_.getName).toSeq
  }

  /** One WAL record in transport-independent form: its LSN, whether it
    * is a commit boundary, and a lazy row builder. */
  final case class Rec(lsn: Long, commit: Boolean, make: () => InternalRow)

  /** Plain or gzip'd segments (the reference's PG2ANY_ENABLE_COMPRESSION
    * storage, storage/compressed.rs — here just a transport codec; seek
    * indexing is the [min,max] LSN cache, which applies to both). */
  private def readJsonNodes(f: File): Iterator[JsonNode] = {
    val lines =
      if (f.getName.endsWith(".gz")) {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          new java.util.zip.GZIPInputStream(
            Files.newInputStream(f.toPath)), StandardCharsets.UTF_8))
        try Iterator.continually(in.readLine()).takeWhile(_ != null).toVector
        finally in.close()
      } else Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala.toVector
    lines.iterator.filter(_.nonEmpty).map(mapper.readTree)
  }

  /** Transport-independent record reader: JSON-line segments, or binary
    * `.pgo` segments of framed pgoutput messages
    * ([lsn:Int64][len:Int32][payload]) decoded by PgOutputDecoder/
    * Assembler. A .pgo segment must be self-contained: Relation
    * messages precede the first DML touching them (capture tools
    * re-emit relation metadata at segment rotation, as pgoutput itself
    * does per session). Commit boundaries are the Commit/StreamCommit
    * events (JSON transport: the `commit:true` marker). */
  /** `fromExclusive` is a pruning HINT: the caller will discard events
    * with lsn ≤ it, so an indexed .pgo segment may seek past any sync
    * point whose recorded max-lsn is ≤ the hint. Long.MinValue = no
    * pruning (full decode). */
  private def readFile(f: File, fromExclusive: Long = Long.MinValue): Iterator[Rec] = {
    filesOpened.incrementAndGet()
    if (f.getName.endsWith(".pgo")) readPgo(f, fromExclusive)
    else {
      bytesRead.addAndGet(f.length())
      readJsonNodes(f).map(n => Rec(
        n.get("lsn").asLong(), n.path("commit").asBoolean(false), () => toRow(n)))
    }
  }

  /** Parse a `.idx` seek sidecar: (metaFrames(offset,len), syncs(offset,
    * maxLsn)). Defensive — any malformed content disables the index
    * (a torn sidecar must never lose events, only speed). */
  private def parseIdx(idx: File): Option[(Seq[(Long, Int)], Seq[(Long, Long)])] =
    try {
      val metas = Vector.newBuilder[(Long, Int)]
      val syncs = Vector.newBuilder[(Long, Long)]
      Files.readAllLines(idx.toPath, StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty).foreach { line =>
          line.split(" ") match {
            case Array("m", off, len) => metas += ((off.toLong, len.toInt))
            case Array("s", off, lsn) => syncs += ((off.toLong, lsn.toLong))
            case _ => return None
          }
        }
      Some((metas.result(), syncs.result()))
    } catch { case _: Exception => None }

  private def decodeFrames(bb: java.nio.ByteBuffer,
                           init: graft.sources.pgoutput.PgOutputAssembler.State)
      : Iterator[Rec] = {
    import graft.sources.pgoutput.PgOutputAssembler
    var state = init
    val out = Vector.newBuilder[Rec]
    var torn = false
    while (!torn && bb.remaining() >= 12) {
      val lsn = bb.getLong()
      val len = bb.getInt()
      if (len < 0 || bb.remaining() < len) {
        // torn trailing frame: a still-open segment caught mid-append.
        // Stop at the last complete frame — the grown file changes
        // length, so segMeta re-scans it on the next trigger.
        torn = true
      } else {
        val payload = new Array[Byte](len)
        bb.get(payload)
        val (st2, evs) = PgOutputAssembler.onFrame(state, lsn, payload)
        state = st2
        evs.foreach { e =>
          // admission boundaries: all seal ops (a Prepare is NOT one —
          // conservative: a prepared-but-uncommitted tx stays whole in
          // a later batch together with its Commit Prepared)
          val isCommit = e.op == "commit" || e.op == "stream_commit" ||
            e.op == "commit_prepared"
          out += Rec(e.lsn, isCommit, () => eventToRow(e))
        }
      }
    }
    out.result().iterator
  }

  private def readPgo(f: File, fromExclusive: Long): Iterator[Rec] = {
    import graft.sources.pgoutput.PgOutputAssembler
    // intra-segment seek (reference gzip sync-point analog,
    // storage/compressed.rs:20-58): if a .idx sidecar offers a sync
    // point whose events are all ≤ the prune hint, decode only the
    // metadata frames before it (to rebuild the relation cache — a sync
    // point is tx-idle by construction, so the rest of a fresh decoder
    // state is valid) plus the tail from the sync offset.
    val idxFile = new File(f.getParentFile, f.getName + ".idx")
    val seekTo: Option[(Long, Seq[(Long, Int)])] =
      if (fromExclusive == Long.MinValue || !idxFile.exists()) None
      else parseIdx(idxFile).flatMap { case (metas, syncs) =>
        syncs.filter(_._2 <= fromExclusive).map(_._1)
          .filter(off => off > 0 && off <= f.length()).maxOption
          .map(off => (off, metas.filter(_._1 < off)))
      }
    seekTo match {
      case Some((off, metas)) =>
        val raf = new java.io.RandomAccessFile(f, "r")
        try {
          var state = PgOutputAssembler.State()
          metas.foreach { case (mOff, mLen) =>
            raf.seek(mOff)
            val buf = new Array[Byte](mLen)
            raf.readFully(buf)
            bytesRead.addAndGet(mLen.toLong)
            val mb = java.nio.ByteBuffer.wrap(buf)
            val lsn = mb.getLong(); val len = mb.getInt()
            val payload = new Array[Byte](len); mb.get(payload)
            state = PgOutputAssembler.onFrame(state, lsn, payload)._1
          }
          val tailLen = (raf.length() - off).toInt
          val tail = new Array[Byte](tailLen)
          raf.seek(off)
          raf.readFully(tail)
          bytesRead.addAndGet(tailLen.toLong)
          decodeFrames(java.nio.ByteBuffer.wrap(tail), state)
        } finally raf.close()
      case None =>
        val all = Files.readAllBytes(f.toPath)
        bytesRead.addAndGet(all.length.toLong)
        decodeFrames(java.nio.ByteBuffer.wrap(all), PgOutputAssembler.State())
    }
  }

  /** CdcEvent → InternalRow in CdcSchema.envelope order (the .pgo path's
    * analog of [[toRow]]). */
  private def eventToRow(e: graft.model.CdcEvent): InternalRow = {
    def utf8s(s: String): UTF8String =
      if (s == null) null else UTF8String.fromString(s)
    def cols(cs: Seq[graft.model.CdcColumn]): ArrayData =
      new GenericArrayData(cs.map(c => new GenericInternalRow(Array[Any](
        utf8s(c.name), utf8s(c.value), c.isBinary)): Any).toArray)
    def strs(ss: Seq[String]): ArrayData =
      new GenericArrayData(ss.map(utf8s(_): Any).toArray)
    new GenericInternalRow(Array[Any](
      utf8s(e.op),
      e.lsn,
      e.txid,
      if (e.commitTs == null) null
      else {
        val i = e.commitTs.toInstant
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      },
      utf8s(e.schema),
      utf8s(e.table),
      cols(e.before),
      cols(e.after),
      utf8s(e.replicaIdentity),
      strs(e.keyColumns),
      strs(e.truncateTables),
      e.isFinalBatch,
      utf8s(e.origin)))
  }

  def segMeta(f: File): SegMeta = {
    val key = f.getAbsolutePath
    val (len, mtime) = (f.length(), f.lastModified())
    val cached = metaCache.get(key)
    if (cached != null && cached._1 == len && cached._2 == mtime) cached._3
    else {
      var min = Long.MaxValue; var max = Long.MinValue; var cnt = 0
      var first: Option[Long] = None; var last: Option[Long] = None
      readFile(f).foreach { r =>
        min = math.min(min, r.lsn); max = math.max(max, r.lsn); cnt += 1
        if (r.commit) {
          if (first.isEmpty) first = Some(r.lsn)
          last = Some(r.lsn)
        }
      }
      val m = if (cnt == 0) SegMeta(Long.MaxValue, Long.MinValue, 0, None, None)
              else SegMeta(min, max, cnt, first, last)
      metaCache.put(key, (len, mtime, m))
      m
    }
  }

  def readLines(dir: String): Iterator[Rec] =
    segmentFiles(dir).iterator.flatMap(readFile(_))

  /** Range read with segment pruning: files whose cached [min,max] does
    * not overlap (fromEx, toInc] are never opened. */
  def readLinesInRange(dir: String, fromEx: Long, toInc: Long): Iterator[Rec] =
    segmentFiles(dir).iterator
      .filter { f =>
        val m = segMeta(f); m.events > 0 && m.max > fromEx && m.min <= toInc
      }
      .flatMap(readFile(_, fromEx))
      .filter(r => r.lsn > fromEx && r.lsn <= toInc)

  /** Highest commit-boundary LSN > from, visiting at most `cap` events
    * past `from` (admission control); `from` itself if none.
    *
    * Progress guarantee: when the first transaction past `from` alone
    * exceeds `cap`, returning `from` forever would stall the stream (no
    * batch would ever be planned). Like the reference's bounded channel —
    * which backpressures but still drains large transactions — we then
    * admit at least one whole transaction: the first commit boundary past
    * `from`, regardless of size. */
  def lastCommitBoundary(dir: String, from: Long, cap: Option[Long]): Long = {
    var seen = 0L
    var boundary = from
    var capped = false
    val files = segmentFiles(dir)
    val it = files.iterator
    while (it.hasNext && !capped) {
      val f = it.next()
      val m = segMeta(f)
      if (m.events == 0 || m.max <= from) () // prune: nothing past from
      else if (m.min > from && cap.forall(c => seen + m.events <= c)) {
        // whole file admitted from cached meta — file not reopened
        seen += m.events
        m.lastCommit.foreach(l => boundary = math.max(boundary, l))
      } else {
        val recs = readFile(f, from)
        while (recs.hasNext && !capped) {
          val r = recs.next()
          if (r.lsn > from) {
            seen += 1
            if (cap.exists(seen > _)) capped = true
            else if (r.commit) boundary = math.max(boundary, r.lsn)
          }
        }
      }
    }
    if (capped && boundary == from) firstCommitAfter(dir, from).getOrElse(from)
    else boundary
  }

  /** First commit-boundary LSN > from (cached-meta fast path when the
    * whole segment lies past `from`). */
  private def firstCommitAfter(dir: String, from: Long): Option[Long] = {
    val it = segmentFiles(dir).iterator
    while (it.hasNext) {
      val f = it.next()
      val m = segMeta(f)
      if (m.events > 0 && m.max > from) {
        if (m.min > from && m.firstCommit.isDefined) return m.firstCommit
        val hit = readFile(f, from)
          .filter(r => r.lsn > from && r.commit)
          .map(_.lsn)
        if (hit.hasNext) return Some(hit.next())
      }
    }
    None
  }

  /** ACK feedback: applied LSN persisted via atomic tmp-rename —
    * the lsn_tracker persistence discipline (lsn_tracker.rs:416-443). */
  def writeFeedback(dir: String, lsn: Long): Unit = {
    val tmp = Paths.get(dir, ".flush.lsn.tmp")
    Files.writeString(tmp, lsn.toString)
    Files.move(tmp, Paths.get(dir, "flush.lsn"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readFeedback(dir: String): Option[Long] = {
    val p = Paths.get(dir, "flush.lsn")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  private def utf8(n: JsonNode, field: String): UTF8String = {
    val v = n.get(field)
    if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
  }

  private def image(n: JsonNode, field: String): ArrayData = {
    val v = n.get(field)
    if (v == null || v.isNull) null
    else new GenericArrayData(v.elements().asScala.map { c =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(c.get("name").asText()),
        if (c.get("value") == null || c.get("value").isNull) null
        else UTF8String.fromString(c.get("value").asText()),
        c.path("isBinary").asBoolean(false)))
    }.toArray[Any])
  }

  private def strArray(n: JsonNode, field: String): ArrayData = {
    val v = n.get(field)
    if (v == null || v.isNull) null
    else new GenericArrayData(
      v.elements().asScala.map(e => UTF8String.fromString(e.asText()): Any).toArray)
  }

  /** JSON event → InternalRow in CdcSchema.envelope order. */
  def toRow(n: JsonNode): InternalRow = new GenericInternalRow(Array[Any](
    utf8(n, "op"),
    n.get("lsn").asLong(),
    n.get("txid").asLong(),
    if (n.has("commitTsMs")) n.get("commitTsMs").asLong() * 1000L else null, // micros
    utf8(n, "schema"),
    utf8(n, "table"),
    image(n, "before"),
    image(n, "after"),
    Option(utf8(n, "replicaIdentity")).getOrElse(UTF8String.fromString("DEFAULT")),
    strArray(n, "keyColumns"),
    strArray(n, "truncateTables"),
    n.path("commit").asBoolean(false),
    utf8(n, "origin")))
}

class WalPartitionReader(dir: String, fromExclusive: Long, toInclusive: Long)
    extends PartitionReader[InternalRow] {
  private val it = WalSegmentIO.readLinesInRange(dir, fromExclusive, toInclusive)
  private var current: InternalRow = _
  override def next(): Boolean =
    if (it.hasNext) { current = it.next().make(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
