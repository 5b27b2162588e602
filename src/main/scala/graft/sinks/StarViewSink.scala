package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema incrementally-maintained JOIN view — [[JoinViewSink]]
  * generalized to N dimensions:
  *
  *   SELECT d1.g…, d2.g…, count(*), sum(fact.s)…, min/max(fact.m)…
  *   FROM fact JOIN dim1 ON fact.fk1 = dim1.pk1
  *             JOIN dim2 ON fact.fk2 = dim2.pk2 …
  *   GROUP BY d1.g…, d2.g…
  *
  * (the orders × customer × nation dashboard). The same split governs
  * maintenance: fact deltas — the high-volume side — apply
  * INCREMENTALLY, each signed contribution resolving its group columns
  * through a broadcast snapshot of EVERY dim (the `+after` row joins on
  * the new foreign keys, the `−before` row on the old ones, all in one
  * inner-join chain); a change to ANY dim triggers the documented
  * rebuild, exactly as the single-dim sink does. Per-batch cost is
  * O(batch ⋈ Σdims) with every dim broadcast — dims are small and
  * slowly-changing by definition, and the fact replica is never
  * rescanned. Inner-join semantics hold per side: a fact row missing
  * ANY dim key contributes nothing (orphan inserts add nothing, orphan
  * deletes subtract nothing).
  *
  * Invariant (spec-asserted): at every batch boundary the view equals
  * the N-way join + GROUP BY replay over all replicas — the same
  * argument as [[JoinViewSink]], applied per dim: any earlier change to
  * any dim forced a rebuild, so the snapshots the minus side joins are
  * the ones that attributed the plus side. Storage/read/compact/
  * truncate/recover are [[AggViewSink]]'s crash-safe delta layout
  * (including the `distinct_<c>` exact COUNT DISTINCT ride-along). */
class StarViewSink(path: String, dims: Seq[StarDim], sumCols: Seq[String],
                   numParts: Int = 64, minMaxCols: Seq[String] = Nil)
    extends Serializable {
  require(dims.nonEmpty, "star view needs at least one dim")
  require(dims.flatMap(_.groupCols).distinct.size ==
    dims.map(_.groupCols.size).sum,
    "group column names must be distinct across dims")

  val groupCols: Seq[String] = dims.flatMap(_.groupCols)
  private val agg =
    new AggViewSink(path, groupCols, sumCols, numParts, minMaxCols)

  private def sumName(c: String) = s"sum_$c"
  private def mmName(c: String) = s"__mm_$c"

  private def dimFrame(d: StarDim, i: Int,
                       dimSnaps: Map[String, DataFrame]): DataFrame =
    broadcast(dimSnaps(d.dimTable)
      .select(col(d.dimKey).cast("string").as(s"__pk_$i") +:
        d.groupCols.map(c => col(c).cast("string").as(c)): _*))

  private def resolve(rows: DataFrame,
                      dimSnaps: Map[String, DataFrame]): DataFrame =
    dims.zipWithIndex.foldLeft(rows) { case (acc, (d, i)) =>
      acc.join(dimFrame(d, i, dimSnaps), col(s"__fk_$i") === col(s"__pk_$i"))
    }

  /** Incremental fact-side apply — [[JoinViewSink.applyBatch]]'s
    * contract with one `__old_<fk>`/`<fk>` pair per dim. `dimSnaps`
    * maps each dim table to its replica snapshot AS OF this batch's
    * start (the chain guarantees every dim is untouched in the batch —
    * otherwise it rebuilds instead). */
  def applyBatch(spark: SparkSession, flat: DataFrame,
                 dimSnaps: Map[String, DataFrame], batchId: Long): Unit = {
    val bad = flat.filter(col("op").isin("u", "d") && !col("__has_before")).count()
    require(bad == 0,
      s"$bad update/delete events lack a before image — the star view " +
        "needs REPLICA IDENTITY FULL to retract the old contribution")
    def fks(of: String => Column): Seq[Column] =
      dims.zipWithIndex.map { case (d, i) =>
        of(d.factKey).cast("string").as(s"__fk_$i") }
    val plus = flat.filter(col("op").isin("c", "u"))
      .select(fks(col) ++
        (lit(1L).as("cnt") +:
          (sumCols.map(c =>
            coalesce(col(c).cast("double"), lit(0.0)).as(sumName(c))) ++
            minMaxCols.map(c => col(c).cast("double").as(mmName(c))))): _*)
    val minus = flat.filter(col("op").isin("u", "d"))
      .select(fks(c => col(s"__old_$c")) ++
        (lit(-1L).as("cnt") +:
          (sumCols.map(c =>
            (-coalesce(col(s"__old_$c").cast("double"), lit(0.0)))
              .as(sumName(c))) ++
            minMaxCols.map(c =>
              col(s"__old_$c").cast("double").as(mmName(c))))): _*)
    val resolved = resolve(plus.unionByName(minus), dimSnaps)
    val signed = resolved
      .select(groupCols.map(col) ++
        (col("cnt") +: sumCols.map(c => col(sumName(c)))): _*)
    agg.applyDelta(spark, signed, batchId)
    if (minMaxCols.nonEmpty) {
      val mm = minMaxCols.map(c =>
          resolved.select(lit(c).as("mcol") +: groupCols.map(col) :+
            col(mmName(c)).as("v") :+ col("cnt"): _*))
        .reduce(_ unionByName _)
        .filter(col("v").isNotNull)
      agg.applyMmDelta(spark, mm, batchId)
    }
  }

  /** (Re)build from all replicas — the bootstrap AND the any-dim-change
    * recovery. One broadcast-join chain over the fact replica. */
  def rebuild(spark: SparkSession, factSnap: DataFrame,
              dimSnaps: Map[String, DataFrame]): Unit = {
    val joined = resolve(
      factSnap.select(
        dims.zipWithIndex.map { case (d, i) =>
          col(d.factKey).cast("string").as(s"__fk_$i") } ++
          (sumCols ++ minMaxCols).distinct.map(col): _*),
      dimSnaps)
      .select(groupCols.map(col) ++
        (sumCols ++ minMaxCols).distinct.map(col): _*)
    agg.bootstrap(spark, joined)
  }

  def read(spark: SparkSession): DataFrame = agg.read(spark)
  def readGroupTuples(spark: SparkSession, probes: Seq[Seq[String]]): DataFrame =
    agg.readGroupTuples(spark, probes)
  def truncate(spark: SparkSession): Unit = agg.truncate(spark)
  def compact(spark: SparkSession): Int = agg.compact(spark)
  def recover(spark: SparkSession): Unit = agg.recover(spark)
}

/** One spoke of a star view: the dim table, the fact's FK column, the
  * dim's PK column, and the dim's contributed group columns. */
final case class StarDim(dimTable: String, factKey: String, dimKey: String,
                         groupCols: Seq[String])

/** Declared star view, resolved against the warehouse root — keyed by
  * the fact and EVERY dim: the chain feeds fact batches incrementally
  * and rebuilds when any dim changes. */
final case class StarViewDef(factTable: String, dims: Seq[StarDim],
                             sumCols: Seq[String], numParts: Int = 64,
                             minMaxCols: Seq[String] = Nil) {
  def name: String =
    "star_" + dims.map(d =>
      s"${d.dimTable.replace('.', '-')}-${d.factKey}-${d.dimKey}-" +
        d.groupCols.mkString("-")).mkString("__") +
      s"__s_${sumCols.mkString("-")}" +
      (if (minMaxCols.isEmpty) "" else s"__m_${minMaxCols.mkString("-")}")
  def path(rootPath: String): String = s"$rootPath/_star/$factTable/$name"
  def sink(rootPath: String): StarViewSink =
    new StarViewSink(path(rootPath), dims, sumCols, numParts, minMaxCols)
}
