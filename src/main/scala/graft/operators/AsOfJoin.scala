package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with
  * matching keys and rightTime <= leftTime (backward direction).
  *
  * Spark has no native as-of join; the composed formulation here is the
  * scale-correct one (SURVEY preference (a): compose existing ops):
  * tag both sides, union, ONE hash shuffle on the join keys, then a
  * running `last(_, ignoreNulls)` window carries the latest right
  * payload forward in time order. Cost: one shuffle + one sort —
  * the same as a sort-merge join, with no range-explosion. This is the
  * plan a 1000-executor cluster wants: no broadcast of a big side, no
  * per-row probing, skew bounded by key cardinality.
  */
object RelationalExt {

  /** Backward as-of join (left keeps all rows; unmatched → nulls).
    * Right payload columns are returned with a `prefix`. At equal
    * timestamps the right row matches (inclusive), ties broken by the
    * largest `rightTiebreak`. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightPayload: Seq[String], prefix: String = "asof_",
               rightTiebreak: Option[String] = None): DataFrame = {
    val payloadStruct = struct(
      (rightPayload ++ rightTiebreak.toSeq).distinct.map(col): _*)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(
        // same struct type as the right side
        right.select(payloadStruct).schema.head.dataType))
    val r = right
      .select((keys.map(col) :+ col(rightTime).as("__t")) :+
        payloadStruct.as("__payload"): _*)
      .withColumn("__side", lit(0))
    // align columns for union
    val lCols = l.columns
    val rAligned = lCols.map {
      case c if r.columns.contains(c) => col(c)
      case c => lit(null).cast(l.schema(c).dataType).as(c)
    }
    val unioned = l.select(lCols.map(col): _*).unionByName(
      r.select(rAligned: _*), allowMissingColumns = false)

    // right rows sort BEFORE left rows at equal time → inclusive match
    val order: Seq[Column] = Seq(col("__t").asc, col("__side").asc) ++
      rightTiebreak.map(t => col("__payload").getField(t).asc_nulls_first)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = rightPayload.foldLeft(carried) { (df, p) =>
      df.withColumn(prefix + p, col("__match").getField(p))
    }
    out.drop("__t", "__side", "__payload", "__match")
  }

  /** Banded range join: pairs with matching keys and
    * rightTime ∈ [leftTime - before, leftTime + after].
    *
    * Naive theta-joins explode; here each right row lands in its
    * time bucket and each left row probes only the adjacent buckets
    * covering its window — equi-join on (keys, bucket), then the exact
    * range filter. Bucket width = before+after keeps the probe set at
    * ≤ 3 buckets per row, so cost stays |left|·density, not |left|·|right|. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, rightTime: String,
                before: Long, after: Long,
                rightPayload: Seq[String], prefix: String = "r_"): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0)
    val width = before + after
    val r = right.select(
      (keys.map(col) :+ col(rightTime).as("__rt")) ++
        rightPayload.map(p => col(p).as(prefix + p)): _*)
      .withColumn("__bucket", floor(col("__rt") / width))
    // left probes buckets of [t-before, t+after]
    val l = left
      .withColumn("__bucket", explode(sequence(
        floor((col(leftTime) - before) / width),
        floor((col(leftTime) + after) / width))))
    l.join(r, keys :+ "__bucket")
      .filter(col("__rt") >= col(leftTime) - before &&
        col("__rt") <= col(leftTime) + after)
      .drop("__bucket")
  }
}
