package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN view: a materialized
  *
  *   SELECT dim.g…, count(*), sum(fact.s)…, min(fact.m)…, max(fact.m)…
  *   FROM fact JOIN dim ON fact.fk = dim.pk GROUP BY dim.g…
  *
  * over two warehouse replicas — the per-nation-revenue shape every CDC
  * dashboard eventually needs. Maintenance splits by which side changed:
  *
  *  - **fact deltas** (the high-volume side) apply INCREMENTALLY: each
  *    signed contribution resolves its group columns through a
  *    broadcast snapshot of the dim replica — `+after` rows join on the
  *    new foreign key, `−before` rows on the old one — then feeds the
  *    same additive-delta fold as [[AggViewSink]]. Per-batch cost is
  *    O(batch ⋈ dim) with the dim broadcast; the fact replica is never
  *    rescanned. JOIN semantics are preserved exactly: a fact row whose
  *    key misses the dim contributes nothing on that side (inner join),
  *    so an orphan insert adds nothing and an orphan delete subtracts
  *    nothing — asymmetric per side, which is why the resolution happens
  *    here rather than in the shared op-driven applyBatch.
  *  - **dim changes** (the rare side) trigger a REBUILD from both
  *    replicas — full join-delta algebra (re-attributing every fact row
  *    of a changed dim key) is documented out of scope; a dim table is
  *    small and slowly-changing by definition, and the rebuild is one
  *    broadcast join over the fact replica. The warehouse chain detects
  *    the dim in a batch's touched set and rebuilds after the batch's
  *    replica applies land ([[graft.streaming.CdcPipeline]]).
  *
  * Invariant (spec-asserted): at every batch boundary the view equals
  * the join+groupBy replay over the two replicas. The incremental step
  * preserves it because any earlier dim change already forced a rebuild,
  * so the dim snapshot the minus side joins is the same one that
  * attributed the plus side. Storage/read/compact/truncate/recover are
  * [[AggViewSink]]'s crash-safe delta layout, reused whole. */
class JoinViewSink(path: String, factKey: String, dimKey: String,
                   dimGroupCols: Seq[String], sumCols: Seq[String],
                   numParts: Int = 64, minMaxCols: Seq[String] = Nil)
    extends Serializable {

  private val agg =
    new AggViewSink(path, dimGroupCols, sumCols, numParts, minMaxCols)

  private def sumName(c: String) = s"sum_$c"

  /** Incremental fact-side apply. `flat` carries `op, lsn,
    * __has_before`, the fact key and sum columns from the after image
    * under their names and from the before image as `__old_<c>`.
    * `dimSnap` is the dim replica AS OF this batch's start (the chain
    * guarantees the dim is untouched in the batch — otherwise it
    * rebuilds instead). */
  def applyBatch(spark: SparkSession, flat: DataFrame, dimSnap: DataFrame,
                 batchId: Long): Unit = {
    val bad = flat.filter(col("op").isin("u", "d") && !col("__has_before")).count()
    require(bad == 0,
      s"$bad update/delete events lack a before image — the join view " +
        "needs REPLICA IDENTITY FULL to retract the old contribution")
    val dim = broadcast(
      dimSnap.select(col(dimKey).cast("string").as("__pk") +:
        dimGroupCols.map(c => col(c).cast("string").as(c)): _*))
    def mmName(c: String) = s"__mm_$c"
    val plus = flat.filter(col("op").isin("c", "u"))
      .select(col(factKey).cast("string").as("__fk") +:
        (lit(1L).as("cnt") +:
          (sumCols.map(c =>
            coalesce(col(c).cast("double"), lit(0.0)).as(sumName(c))) ++
            minMaxCols.map(c => col(c).cast("double").as(mmName(c))))): _*)
    val minus = flat.filter(col("op").isin("u", "d"))
      .select(col(s"__old_$factKey").cast("string").as("__fk") +:
        (lit(-1L).as("cnt") +:
          (sumCols.map(c =>
            (-coalesce(col(s"__old_$c").cast("double"), lit(0.0)))
              .as(sumName(c))) ++
            minMaxCols.map(c =>
              col(s"__old_$c").cast("double").as(mmName(c))))): _*)
    // inner join per SIDE: unmatched contributions vanish, exactly as
    // they would in the replayed fact-join-dim aggregate
    val resolved = plus.unionByName(minus)
      .join(dim, col("__fk") === col("__pk"))
    val signed = resolved
      .select(dimGroupCols.map(col) ++
        (col("cnt") +: sumCols.map(c => col(sumName(c)))): _*)
    agg.applyDelta(spark, signed, batchId)
    if (minMaxCols.nonEmpty) {
      // the value multiset resolves through the SAME per-side join: a
      // +after value counts into the new key's group, a −before value
      // out of the old key's — the signed cnt doubles as the multiset
      // occurrence delta
      val mm = minMaxCols.map(c =>
          resolved.select(lit(c).as("mcol") +: dimGroupCols.map(col) :+
            col(mmName(c)).as("v") :+ col("cnt"): _*))
        .reduce(_ unionByName _)
        .filter(col("v").isNotNull) // SQL MIN/MAX ignore NULLs
      agg.applyMmDelta(spark, mm, batchId)
    }
  }

  /** (Re)build from both replicas — the bootstrap AND the documented
    * dim-change recovery. One broadcast join over the fact replica. */
  def rebuild(spark: SparkSession, factSnap: DataFrame,
              dimSnap: DataFrame): Unit = {
    val dim = broadcast(
      dimSnap.select(col(dimKey).cast("string").as("__pk") +:
        dimGroupCols.map(c => col(c).cast("string").as(c)): _*))
    val joined = factSnap
      .select(col(factKey).cast("string").as("__fk") +:
        (sumCols ++ minMaxCols).distinct.map(c => col(c)): _*)
      .join(dim, col("__fk") === col("__pk"))
      .select(dimGroupCols.map(col) ++
        (sumCols ++ minMaxCols).distinct.map(col): _*)
    agg.bootstrap(spark, joined)
  }

  def read(spark: SparkSession): DataFrame = agg.read(spark)
  def readGroups(spark: SparkSession, groups: Seq[String]): DataFrame =
    agg.readGroups(spark, groups)
  def readGroupTuples(spark: SparkSession, probes: Seq[Seq[String]]): DataFrame =
    agg.readGroupTuples(spark, probes)
  def truncate(spark: SparkSession): Unit = agg.truncate(spark)
  def compact(spark: SparkSession): Int = agg.compact(spark)
  def recover(spark: SparkSession): Unit = agg.recover(spark)
}

/** Declared join view, resolved against the warehouse root — the
  * [[AggViewDef]] pattern, keyed by BOTH tables: the warehouse chain
  * feeds fact batches incrementally and rebuilds on dim changes. */
final case class JoinViewDef(factTable: String, dimTable: String,
                             factKey: String, dimKey: String,
                             dimGroupCols: Seq[String], sumCols: Seq[String],
                             numParts: Int = 64,
                             minMaxCols: Seq[String] = Nil) {
  def name: String =
    s"d_${dimTable.replace('.', '-')}__k_$factKey-$dimKey" +
      s"__g_${dimGroupCols.mkString("-")}__s_${sumCols.mkString("-")}" +
      (if (minMaxCols.isEmpty) "" else s"__m_${minMaxCols.mkString("-")}")
  def path(rootPath: String): String = s"$rootPath/_join/$factTable/$name"
  def sink(rootPath: String): JoinViewSink =
    new JoinViewSink(path(rootPath), factKey, dimKey, dimGroupCols, sumCols,
      numParts, minMaxCols)
}
