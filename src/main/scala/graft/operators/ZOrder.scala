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

  /** The interleaved curve value (≤ 63 bits: `bits × cols.size ≤ 63`).
    * Columns must be orderable; ties rank arbitrarily but
    * deterministically within a sort (ntile over the orderBy). */
  def curve(cols: Seq[String], bits: Int = 10): Column = {
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
