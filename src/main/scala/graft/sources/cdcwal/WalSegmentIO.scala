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
  * Segment-level pruning: file names carry no LSN metadata, so ranges
  * scan every segment; a production transport would be the pgoutput
  * socket, where this question disappears. Lines are cheap to skip.
  */
object WalSegmentIO {

  private val mapper = new ObjectMapper()

  def segmentFiles(dir: String): Seq[File] = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("segment-") && f.getName.endsWith(".jsonl"))
      .sortBy(_.getName).toSeq
  }

  def readLines(dir: String): Iterator[JsonNode] =
    segmentFiles(dir).iterator.flatMap { f =>
      Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty).map(mapper.readTree)
    }

  /** Highest commit-boundary LSN > from, visiting at most `cap` events
    * past `from` (admission control); `from` itself if none. */
  def lastCommitBoundary(dir: String, from: Long, cap: Option[Long]): Long = {
    var seen = 0L
    var boundary = from
    val it = readLines(dir)
    while (it.hasNext) {
      val n = it.next()
      val lsn = n.get("lsn").asLong()
      if (lsn > from) {
        seen += 1
        if (cap.exists(seen > _)) return boundary
        if (n.path("commit").asBoolean(false)) boundary = lsn
      }
    }
    boundary
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
    n.path("commit").asBoolean(false)))
}

class WalPartitionReader(dir: String, fromExclusive: Long, toInclusive: Long)
    extends PartitionReader[InternalRow] {
  private val it = WalSegmentIO.readLines(dir).filter { n =>
    val lsn = n.get("lsn").asLong()
    lsn > fromExclusive && lsn <= toInclusive
  }
  private var current: InternalRow = _
  override def next(): Boolean =
    if (it.hasNext) { current = WalSegmentIO.toRow(it.next()); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
