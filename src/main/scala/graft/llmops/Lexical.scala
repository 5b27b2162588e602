package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 lexical retrieval — the keyword-search modality next to the
  * embedding stack ([[Similarity]]): term-match ranking over an
  * inverted-index join, the other half every hybrid-search pipeline
  * fuses with ANN (reciprocal-rank fusion). A training-data engine
  * needs it for corpus search, eval-query retrieval baselines, and as
  * the lexical leg of hard-negative mining.
  *
  * Integer-exact scoring: BM25's floats (idf, the length norm) are
  * fixed-point — idf micro-rounded immediately after the one `ln`
  * (the llm_lm_score idiom), k1/b carried in milli units, and every
  * division an integer `div` — so both engines produce bit-identical
  * scores and the ranking is engine-reproducible, never
  * float-accumulation-ordered.
  *
  * Scale shape: one corpus explode → (doc, term, tf) partial-aggregated
  * postings (the inverted index); query terms broadcast against it, so
  * the scored candidate set is the postings of the QUERY's terms, never
  * query × corpus; df/idf is computed only for those terms; per-query
  * top-k is a rank window (WindowGroupLimit — a k-row heap per task).
  * No global sort, no driver-side scoring.
  */
object Lexical {

  /** Inverted postings: one row per (doc, term) with the term frequency
    * — [[TextOps.tokens]] tokenization (shared with the tfidf/LM
    * family, so lexical scores and quality signals agree on what a
    * token is). */
  def postings(docs: DataFrame, textCol: String = "text",
               idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Per-doc token length (the BM25 length-norm input). */
  def docLens(docs: DataFrame, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("dl"))

  /** BM25 top-k per query. `queries` carries (qid, term) rows — term
    * multiplicity is ignored (distinct query terms score once, the
    * common simplification). Scoring follows the standard BM25+idf
    * form, idf = ln((N+1)/(df+0.5)) kept rational as (2N+2)/(2df+1):
    *
    *   score(q, d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    *
    * with k1/b in MILLI units and idf in MICRO units, every step an
    * integer op after the single rounded ln. Returns
    * (qid, rank, doc_id, score_micro), rank ≤ k by (score desc, doc
    * asc). */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
               k1Milli: Long = 1200L, bMilli: Long = 750L,
               textCol: String = "text", idCol: String = "doc_id",
               maxDfPermille: Long = 1000L)
      : DataFrame = {
    val lens = docLens(docs, textCol, idCol)
    // Corpus stats ride the plan as a 1-row broadcast instead of a
    // driver-collected pre-action: the previous `.first()` forced a
    // separate full doc-length pass (its own job) before the scoring
    // plan even started (guide §5: the driver does no data work in a
    // query path). Same integer arithmetic, on stat COLUMNS.
    val stats = lens.agg(count(lit(1)).as("n"), sum("dl").as("tot"))
      .withColumn("avgdl_milli",
        greatest(expr("tot * 1000 div greatest(n, 1)"), lit(1L)))
      .select("n", "avgdl_milli")
    // Prune the exploded token rows to the QUERY's terms BEFORE the
    // (doc, term) aggregation (guide §3.2 pre-filter / §2.3 shuffle
    // fewer bytes): the join key is a grouping key, so
    // groupBy∘join ≡ join∘groupBy and the candidate postings are
    // row-identical to `postings(docs) ⋈ terms` — but the tf exchange
    // carries only the query terms' token rows instead of the whole
    // corpus vocabulary. This is the batch-side analog of the
    // TextIndexStore's index-pruned serving path.
    val qTerms = broadcast(queries.select(col("term")).distinct())
    val cand = docs.select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .join(qTerms, "term")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    scoreBm25Stats(queries, cand, lens, stats,
      k, k1Milli, bMilli, maxDfPermille)
  }

  /** The shared scoring tail: `cand0` = (term, doc_id, tf) postings
    * (full or index-pruned — [[TextIndexStore]] serves the pruned
    * form), `lens` = (doc_id, dl) covering at least the candidate
    * docs, `n`/`totTokens` the corpus-wide stats the caller owns.
    *
    * `maxDfPermille` is the stopword df-cap: a query term whose df
    * exceeds maxDfPermille·N/1000 is SKIPPED (its idf is near zero, its
    * posting list is near corpus-sized — at 100 TB a single "the" in a
    * query would otherwise score the whole corpus). 1000 = off (df ≤ N
    * always); the standard serving default is 600. The same integer
    * predicate (1000·df ≤ cap·N) runs on both engines, so capped
    * rankings stay oracle-exact. */
  private[llmops] def scoreBm25(queries: DataFrame, cand0: DataFrame,
      lens: DataFrame, n: Long, totTokens: Long, k: Int,
      k1Milli: Long, bMilli: Long, maxDfPermille: Long = 1000L,
      hint: DataFrame => DataFrame = broadcast): DataFrame = {
    // literal-stats form for callers that OWN the corpus stats (the
    // persisted TextIndexStore serves them from its _lens summary):
    // a 1-row local relation delegates to the column-stats scorer
    val avgdlMilli = math.max(totTokens * 1000L / math.max(n, 1L), 1L)
    val stats = queries.sparkSession.range(1)
      .select(lit(n).as("n"), lit(avgdlMilli).as("avgdl_milli"))
    scoreBm25Stats(queries, cand0, lens, stats, k, k1Milli, bMilli,
      maxDfPermille, hint)
  }

  /** [[scoreBm25]] with the corpus stats as a 1-row DataFrame
    * (n, avgdl_milli) cross-joined into the term table — lets a caller
    * keep stat derivation INSIDE the one query plan instead of
    * collecting it first. */
  private[llmops] def scoreBm25Stats(queries: DataFrame, cand0: DataFrame,
      lens: DataFrame, stats: DataFrame, k: Int,
      k1Milli: Long, bMilli: Long, maxDfPermille: Long = 1000L,
      hint: DataFrame => DataFrame = broadcast): DataFrame = {
    val q = queries.select(col("qid"), col("term")).distinct()
    // candidate postings = the query terms' posting lists only — the
    // tiny term set broadcasts, the corpus side stays one scan. A
    // CORPUS-SIZED query set (TextIndexStore.searchDistributed) passes
    // hint = identity: same arithmetic, shuffle joins instead of
    // driver broadcasts — the ranking is bit-identical by construction
    val cand = cand0.join(hint(q.select("term").distinct()), "term")
    val dfT = cand.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .filter(lit(1000L) * col("df") <= lit(maxDfPermille) * col("n"))
      .withColumn("idf_micro",
        round(log((lit(2.0) * col("n") + lit(2)) / (col("df") * 2 + 1)) * 1e6)
          .cast("bigint"))
      .select("term", "idf_micro", "avgdl_milli")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("score_micro"), col("doc_id"))
    q.join(cand, "term")
      .join(hint(dfT), "term")
      .join(lens, "doc_id")
      .withColumn("ratio_milli", expr("(dl * 1000000) div avgdl_milli"))
      .withColumn("norm_milli",
        expr(s"(1000 - $bMilli) + ($bMilli * ratio_milli) div 1000"))
      .withColumn("denom_milli",
        expr(s"tf * 1000 + ($k1Milli * norm_milli) div 1000"))
      .withColumn("contrib_micro",
        expr(s"(idf_micro * tf * (1000 + $k1Milli)) div denom_milli"))
      .groupBy("qid", "doc_id")
      .agg(sum("contrib_micro").as("score_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "rank", "doc_id", "score_micro")
  }
}
