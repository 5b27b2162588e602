package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table loaders. Filters/projections applied after these reach
  * the parquet scan via Catalyst pushdown — verified with
  * .explain("formatted") (PushedFilters / ReadSchema). One exception:
  * [[Tables.events]]' TIMESTAMP branch makes `ts` a computed column, so
  * `ts` filters don't push down there (all other columns still do);
  * see the note on that method. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** `events` with `ts` normalized to BIGINT epoch-nanoseconds.
    *
    * Generations of the driver testdata have carried `ts` as either
    * TIMESTAMP(NANOS) (read as long under `nanosAsLong`) or
    * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ). Every query here was
    * written against the epoch-nanos long contract (`ts div 1e9` etc.,
    * matched by `epoch_ns(ts)` on the DuckDB oracle side, which accepts
    * both physical types), so normalize at the source.
    *
    * REQUIRES spark.sql.session.timeZone=UTC (asserted): Spark 4.1's
    * `timestampdiff` takes TIMESTAMP (LTZ) operands, so both NTZ sides
    * are implicitly cast NTZ→LTZ through the session zone. Under UTC
    * the cast is the identity and the arithmetic is exact wall-clock;
    * under a DST zone the epoch literal and `ts` can carry different
    * zone offsets and the difference would shift by the DST delta.
    * Every entry point in this library pins UTC; the assert turns a
    * mis-configured embedding session into a fast failure instead of
    * silently hour-shifted event times. This branch also makes `ts` a
    * computed column — `ts` filters don't reach the parquet scan here
    * (the LongType branch and all non-ts columns still push down). */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ =>
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events(): ts normalization requires spark.sql.session.timeZone=UTC " +
            "(timestampdiff casts NTZ->LTZ through the session zone; a DST " +
            "zone would shift event times by the zone offset delta)")
        raw.withColumn("ts", expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00'," +
            " cast(ts as timestamp_ntz)) * 1000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
