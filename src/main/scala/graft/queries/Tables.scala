package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Testdata table loaders. Filters/projections applied after these reach
  * the parquet scan via Catalyst pushdown — verified with
  * .explain("formatted") (PushedFilters / ReadSchema). */
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
    * both physical types), so normalize at the source. The timestamp →
    * nanos conversion uses `timestampdiff` against an NTZ epoch literal:
    * pure wall-clock arithmetic, no session-timezone interpretation, so
    * it is stable no matter what timezone the caller's session runs in. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw
      case _ => raw.withColumn("ts", expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00'," +
          " cast(ts as timestamp_ntz)) * 1000"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
