package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-bucketed Morton (Z-order) curve: multi-dimensional data-skipping
  * layout for parquet row-group min/max stats (the Delta/Iceberg
  * OPTIMIZE ZORDER idea, format-independent).
  *
  * A single-column sort gives perfect pruning on that column and none on
  * any other; interleaving the columns' RANK-bucket bits gives every
  * listed column bounded min/max spread inside each row group, so a
  * selective predicate on ANY of them skips most groups.
  *
  * Rank buckets (ntile) rather than raw value bits: raw-bit interleaving
  * collapses under skewed or offset distributions (all data sharing high
  * bits interleaves to the same prefix), while ranks are distribution-
  * free. The ntile window is a per-write-partition total order — this is
  * an OFFLINE maintenance transform for data already collected into one
  * rewrite task per bucket (ParquetReplicaSink.compact), not a hot-path
  * operator.
  */
object ZOrder {

  /** Lay `df` out along the curve: rows sorted (within the partition) by
    * the interleaved rank-bucket value of `cols`.
    *
    * GUARDED entry point: the rank windows are a per-write-partition
    * total order, so the input MUST already be a single partition (one
    * rewrite task per bucket — [[graft.sinks.ParquetReplicaSink.compact]]
    * feeds `repartition(1)` per bucket dir). On a distributed DataFrame
    * the global windows would silently drag the whole table to one task;
    * this fails fast instead. */
  def layout(df: org.apache.spark.sql.DataFrame, cols: Seq[String],
             bits: Int = 10): org.apache.spark.sql.DataFrame = {
    val n = df.rdd.getNumPartitions
    require(n <= 1,
      s"ZOrder.layout is an offline per-rewrite-task transform: input has " +
        s"$n partitions — collect each bucket into one partition first " +
        "(repartition(1) per bucket dir), or the global rank windows " +
        "would single-task the whole table")
    df.withColumn("__z", curve(cols, bits))
      .sortWithinPartitions("__z").drop("__z")
  }

  /** The interleaved curve value (≤ 63 bits: `bits × cols.size ≤ 63`).
    * Columns must be orderable; ties rank arbitrarily but
    * deterministically within a sort (ntile over the orderBy). Private:
    * the unpartitioned ntile windows are only safe behind [[layout]]'s
    * single-partition guard. */
  private def curve(cols: Seq[String], bits: Int = 10): Column = {
    require(cols.size >= 2 && cols.size <= 6, "z-order needs 2-6 columns")
    require(bits * cols.size <= 63, s"$bits bits × ${cols.size} cols > 63")
    val ranks = cols.map(c =>
      (ntile(1 << bits).over(Window.orderBy(col(c))) - 1).cast("bigint"))
    (0 until bits).flatMap { i =>
      ranks.zipWithIndex.map { case (r, j) =>
        shiftleft(shiftright(r, i).bitwiseAND(lit(1L)), i * cols.size + j)
      }
    }.reduce((a, b) => a.bitwiseOR(b))
  }
}
