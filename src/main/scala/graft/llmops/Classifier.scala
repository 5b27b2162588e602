package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed-trained logistic-regression quality classifier — the
  * fastText/DCLM-style "does this look like curated text?" filter,
  * trained IN the engine instead of imported from one.
  *
  * Setup: integer-milli features from the existing quality signals
  * (stopword rate, capped length, distinct-token rate) + bias, weak
  * labels from a heuristic target (here: the language-ID gate — the
  * standard bootstrap when no human labels exist). Batch gradient
  * descent, `steps` full passes.
  *
  * Scale factoring: ONE map-side-combined aggregate per step (4 exact
  * integer gradient sums over one corpus scan); the weight vector is
  * DRIVER METADATA between steps (like IVF centroids / BPE merges) and
  * re-enters the next step's scan as literals. Nothing corpus-sized
  * ever leaves the executors; T steps = T scans.
  *
  * Engine-exact determinism (the oracle replays the unrolled loop):
  *  - features and labels are exact integers; the margin
  *    z_nano = Σ w_micro·x_milli is an exact integer;
  *  - the ONLY transcendental, σ(z), is micro-rounded immediately
  *    (p_micro = round(1e6·σ(z_nano/1e9)) — the ln-micro idiom), so
  *    gradient sums are order-independent exact integers;
  *  - the weight update rounds once per step:
  *    w' = w − round(lr·grad/(n·1000)) — identical arithmetic in SQL.
  */
object Classifier {

  final case class Weights(b: Long, w1: Long, w2: Long, w3: Long)

  /** Integer-milli feature columns over `documents(text, lang, …)`:
    * (y, x1 stopword-rate, x2 capped-length, x3 distinct-token-rate).
    * Shared by training and the oracle (as SQL below). */
  def features(docs: DataFrame, targetLang: String = "en"): DataFrame = {
    val t = split(col("text"), " ")
    docs.select(
      (col("lang") === targetLang).cast("int").cast("bigint").as("y"),
      expr("""size(filter(split(text, ' '), x ->
          x IN ('the','a','and','of','to','in','is')))""")
        .cast("bigint").as("n_stop"),
      size(t).cast("bigint").as("n_tok"),
      size(array_distinct(t)).cast("bigint").as("n_dis"))
      .filter(col("n_tok") > 0)
      .select(col("y"),
        expr("(n_stop * 1000) div n_tok").as("x1"),
        least(col("n_tok"), lit(1000L)).as("x2"),
        expr("(n_dis * 1000) div n_tok").as("x3"))
  }

  /** σ(z_nano) in micro units — the one transcendental, rounded to an
    * exact integer immediately so every downstream sum is exact. */
  def pMicro(zNano: Column): Column =
    round(lit(1e6) / (lit(1.0) + exp(-zNano.cast("double") / lit(1e9))))
      .cast("bigint")

  private def zNano(w: Weights): Column =
    lit(w.b) * lit(1000L) + lit(w.w1) * col("x1") +
      lit(w.w2) * col("x2") + lit(w.w3) * col("x3")

  /** One batch-gradient step at learning rate `lrMilli`/1000:
    * grad_j = Σ (p_micro − y·1e6)·x_j (exact), then
    * w_j' = w_j − round(lrMilli·grad_j/(n·1e3·1000)). */
  def step(feats: DataFrame, w: Weights, lrMilli: Long = 100L): Weights = {
    val g = feats
      .withColumn("e", pMicro(zNano(w)) - col("y") * lit(1000000L))
      .agg(count(lit(1)).as("n"), sum(col("e") * lit(1000L)).as("g0"),
        sum(col("e") * col("x1")).as("g1"),
        sum(col("e") * col("x2")).as("g2"),
        sum(col("e") * col("x3")).as("g3"))
      .first()
    val n = g.getLong(0)
    // HALF_UP on the exact double (away from zero — SQL round()
    // semantics; Math.round rounds negative halves the other way)
    // lrMilli.toDouble FIRST: a Long×Long product can wrap for corpora
    // around 1e8 rows (|e|≤1e6 × x≤1000 per row); the quotient is
    // double-divided anyway, so compute the whole update in floating
    // point and round once
    def upd(wj: Long, gj: Long): Long =
      wj - new java.math.BigDecimal(lrMilli.toDouble * gj / (n * 1000.0 * 1000.0))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    Weights(upd(w.b, g.getLong(1)), upd(w.w1, g.getLong(2)),
      upd(w.w2, g.getLong(3)), upd(w.w3, g.getLong(4)))
  }

  /** Train `steps` full-batch GD steps from zero weights. */
  def trainWeights(docs: DataFrame, steps: Int = 3, lrMilli: Long = 100L,
                   targetLang: String = "en"): Weights = {
    val feats = features(docs, targetLang)
    var w = Weights(0L, 0L, 0L, 0L)
    (0 until steps).foreach(_ => w = step(feats, w, lrMilli))
    w
  }

  /** Persist/load the trained weight row — the model ARTIFACT a gate
    * mounts (one bounded file, the tokenizer-artifact pattern). */
  def writeWeights(spark: org.apache.spark.sql.SparkSession, path: String,
                   w: Weights): Unit = {
    import spark.implicits._
    Seq((w.b, w.w1, w.w2, w.w3)).toDF("w_bias", "w_stop", "w_len", "w_dis")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: org.apache.spark.sql.SparkSession, path: String): Weights = {
    val r = spark.read.parquet(path).first()
    Weights(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  /** The margin z (nano units, exact integer) of each doc under `w`,
    * computed inline over the text column — the σ-free serving
    * arithmetic shared by [[gateDocs]] and [[scoreDocs]]. */
  def marginNano(w: Weights): Column = {
    val x1 = expr("""(size(filter(split(text, ' '), x ->
        x IN ('the','a','and','of','to','in','is'))) * 1000)
      div size(split(text, ' '))""")
    val x2 = least(size(split(col("text"), " ")).cast("bigint"), lit(1000L))
    val x3 = expr("""(size(array_distinct(split(text, ' '))) * 1000)
      div size(split(text, ' '))""")
    lit(w.b) * lit(1000L) + lit(w.w1) * x1 +
      lit(w.w2) * x2 + lit(w.w3) * x3
  }

  /** σ-free model gate: keep docs whose margin z ≥ 0 under `w` — the
    * serving form of the classifier (exact integer arithmetic over the
    * same milli features, computed inline so every input column
    * survives). Empty-token docs score bias-only. */
  def gateDocs(docs: DataFrame, w: Weights): DataFrame =
    docs.filter(marginNano(w) >= 0)

  /** Per-doc margins + the z ≥ 0 decision — the score DISTRIBUTION a
    * trimming budget or threshold sweep reads (the gate keeps/drops;
    * this says by how much). */
  def scoreDocs(docs: DataFrame, w: Weights,
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), marginNano(w).as("z_nano"))
      .withColumn("pred", (col("z_nano") >= 0).cast("int").cast("bigint"))

  /** Train `steps` full-batch GD steps from zero weights; returns the
    * weights plus the confusion counts of the final model (decision at
    * p ≥ ½ ⟺ z ≥ 0 — integer-exact, no σ needed to predict). */
  def trainReport(docs: DataFrame, steps: Int = 3,
                  lrMilli: Long = 100L,
                  targetLang: String = "en"): DataFrame = {
    val feats = features(docs, targetLang)
    val w = trainWeights(docs, steps, lrMilli, targetLang)
    feats
      .withColumn("pred", (zNano(w) >= 0).cast("int").cast("bigint"))
      .agg(sum(when(col("y") === 1 && col("pred") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === 0 && col("pred") === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 0 && col("pred") === 0, 1L).otherwise(0L)).as("tn"),
        sum(when(col("y") === 1 && col("pred") === 0, 1L).otherwise(0L)).as("fn"))
      .select(lit(steps.toLong).as("steps"), lit(w.b).as("w_bias"),
        lit(w.w1).as("w_stop"), lit(w.w2).as("w_len"), lit(w.w3).as("w_dis"),
        col("tp"), col("fp"), col("tn"), col("fn"))
  }
}
