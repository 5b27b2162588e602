package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import java.nio.charset.StandardCharsets.UTF_8

/** Native per-key counting aggregate: `count_by_key(k)` returns
  * map<string,bigint> of occurrence counts per distinct non-null key.
  *
  * Built for OBSERVED metrics on streaming plans: the reference exposes
  * per-{event_type,table} labeled Prometheus counters
  * (pg2any-lib/src/monitoring/metrics.rs:28-32); computing them with a
  * `groupBy` would need a second pass over every micro-batch, while this
  * aggregate rides `Dataset.observe` — Spark folds it INTO the batch's
  * existing pass and hands the map to the listener with the progress
  * event. Zero extra jobs per trigger.
  *
  * Scale shape: partial state is O(distinct keys) — for CDC labels that
  * is (4 ops × table count), bounded driver metadata — and merges are
  * additive, so the aggregate is map-side combined like [[KmvAgg]]. Not
  * meant for high-cardinality keys (use groupBy for those).
  */
case class CountByKeyAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "count_by_key"

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(buf: scala.collection.mutable.HashMap[String, Long],
                      input: InternalRow): scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.toString
      buf.update(k, buf.getOrElse(k, 0L) + 1L)
    }
    buf
  }

  override def merge(b1: scala.collection.mutable.HashMap[String, Long],
                     b2: scala.collection.mutable.HashMap[String, Long]): scala.collection.mutable.HashMap[String, Long] = {
    b2.foreach { case (k, n) => b1.update(k, b1.getOrElse(k, 0L) + n) }
    b1
  }

  override def eval(buf: scala.collection.mutable.HashMap[String, Long]): Any = {
    // deterministic key order so observed rows compare stably in tests
    val entries = buf.toSeq.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)).toArray[Any]),
      new GenericArrayData(entries.map(e => e._2: Any).toArray))
  }

  override def serialize(buf: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, n) =>
      val kb = k.getBytes(UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(n)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      buf.update(new String(kb, UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountByKeyAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountByKeyAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountByKeyAgg =
    copy(child = newChildren.head)
}
