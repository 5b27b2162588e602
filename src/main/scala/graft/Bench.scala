package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Runs the headline queries on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints exactly one JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Headline set = the queries that exercise the scale-sensitive paths:
  * full-scan agg, shuffled + broadcast joins, windows, the CDC session /
  * apply operators, and the LSH dedup + quantized ANN llm ops.
  *
  * "value" sums the ROUND-1 query set only, so round-over-round totals
  * compare the same work; queries added in later rounds are measured in
  * "queries" and summed in "total_all".
  */
object Bench {
  /** The round-1 headline set — the regression-gate total. */
  private val round1Set = Seq(
    "q1_pricing", "q2_top_orders", "q3_revenue", "q4_region_stats",
    "q5_window_rank", "q6_rollup", "q13_asof", "q14_range",
    "cdc_t1_sessions", "cdc_apply_latest", "cdc_a1_chunks",
    "llm_dedup_exact", "llm_dedup_minhash", "llm_simhash",
    "llm_ann_cosine", "llm_cos_neardup", "llm_tokens", "llm_quality")

  private val headline = Seq(
    "q1_pricing", "q2_top_orders", "q3_revenue", "q4_region_stats",
    "q5_window_rank", "q6_rollup", "q13_asof", "q14_range",
    "q19_market_share", "q20_waiting_supplier", "q22_nation_balance",
    "q23_event_windows", "q24_grouping_sets", "q25_pivot", "q26_rolling",
    "q27_small_qty", "q28_quantiles", "q29_local_volume",
    "q30_promo_share", "q31_disjunctive", "q32_priority_exists",
    "q33_custdist", "q34_top_supplier", "q35_ship_priority",
    "q36_ntile", "q37_event_gaps", "q38_json", "q39_unpivot", "q40_stragg",
    "q41_rank_family", "q42_selective", "q43_arrays", "q44_bagops",
    "q45_sql_notin", "q46_sql_latest",
    "cdc_t1_sessions", "cdc_apply_latest", "cdc_a1_chunks",
    "cdc_transforms",
    "llm_dedup_exact", "llm_dedup_minhash", "llm_simhash",
    "llm_ann_cosine", "llm_ann_lsh", "llm_ann_ivf", "llm_cos_neardup",
    "llm_tokens", "llm_quality", "llm_curate",
    "llm_dedup_cluster", "llm_quality_rep", "llm_tfidf", "llm_mix",
    "llm_sample_stratified", "llm_entropy", "llm_embed_stats",
    "llm_dedup_semantic", "llm_label_classify", "llm_lm_score",
    "llm_dataset_card", "llm_winnow", "llm_chunk", "llm_zipf",
    "llm_quant_ann", "llm_ann_batch", "llm_cluster_stats",
    "llm_boilerplate", "llm_kmv_distinct", "llm_edit_distance",
    "llm_dataset_diff", "llm_dup_matrix", "llm_len_hist",
    "llm_pmi_bigrams", "llm_split_assign", "llm_vocab_coverage",
    "llm_split_leakage", "llm_pii_scrub", "llm_dedup_keep_best",
    "llm_block_dedup", "llm_dup_spans", "llm_source_cap",
    "llm_embed_outliers", "llm_shuffle_shard", "llm_ann_recall",
    "llm_mix_temperature", "llm_novelty", "q47_sessionize",
    "llm_quality_trim", "llm_bpe_pairs", "q48_funnel",
    "llm_dsir_weights", "llm_ann_filtered", "llm_cms_counts",
    "llm_curate_funnel", "llm_bpe_encode", "llm_pack_emit",
    "llm_bpe_fertility",
    "llm_hll_distinct", "llm_hist_quantile", "llm_bloom_decontam",
    "llm_rp_ann", "llm_rp_rerank", "llm_kmv_overlap", "llm_split_bycluster",
    "llm_mix_schedule", "llm_exact_quantile",
    "llm_dedup_soft", "llm_hard_negatives", "llm_feature_embed",
    "llm_lm_kn", "llm_unigram_encode", "llm_quality_classifier",
    "llm_unigram_ids", "llm_ann_mrr", "llm_cluster_sample", "llm_clf_margin",
    "llm_ann_ndcg", "llm_shard_manifest", "llm_pq_sweep",
    "cdc_scd2", "cdc_time_travel", "llm_pack_spans", "llm_bm25",
    "llm_hybrid_rrf", "llm_phrase")

  /** Honest-run history from the previous artifact: its `honest_runs`
    * list if present, else its own `run_secs` when it was NOT
    * load-warned. The load-warning norm is the MIN over this window —
    * comparing against just the previous run_secs let one contaminated
    * artifact (2.4× the norm in round 14) raise the bar for its
    * successor, silently blessing a moderately-loaded run. */
  private[graft] def honestRuns(prevJson: Option[String]): Seq[Double] =
    prevJson.toSeq.flatMap { txt =>
      val listed = "\"honest_runs\":\\[([0-9.,Ee+-]*)\\]".r
        .findFirstMatchIn(txt)
        .map(_.group(1).split(",").filter(_.nonEmpty).toSeq
          .flatMap(s => scala.util.Try(s.toDouble).toOption))
      listed.getOrElse {
        val warned = "\"load_warning\":(true|false)".r
          .findFirstMatchIn(txt).exists(_.group(1) == "true")
        if (warned) Seq.empty
        else "\"run_secs\":([0-9.]+)".r.findFirstMatchIn(txt)
          .map(_.group(1).toDouble).toSeq
      }
    }

  /** This run is suspect when it took >2× the best recent honest run. */
  private[graft] def loadWarn(honest: Seq[Double], runSecs: Double): Boolean =
    honest.nonEmpty && runSecs > 2.0 * honest.min

  /** Roll the honest window forward: a clean run joins it (last 5 kept,
    * so a genuinely slower machine ages the old fast norm out), a
    * load-warned run never does. */
  private[graft] def nextHonestRuns(honest: Seq[Double], runSecs: Double,
                                    loaded: Boolean): Seq[Double] =
    (if (loaded) honest else honest :+ runSecs).takeRight(5)

  /** COMPACT summary line, printed LAST on stdout. The full line (with
    * the 125-entry queries map, spread, remeasured, honest_runs) is
    * ~6 KB; a harness that keeps only a bounded stdout tail (the driver
    * keeps 2000 chars) always lost its head — every BENCH_r11..r15
    * artifact has `parsed: null`. This line carries the gate totals in
    * ≤ ~300 chars so it survives any tail window; the per-query map
    * stays in the full line above it AND in the BENCH_LAST.json file
    * artifact (atomic rename), which is the canonical per-query record.
    * Error messages are capped at 60 chars here (full text in the file). */
  private[graft] def compactLine(r1: Double, totalAll: Double,
      runSecs: Double, loaded: Boolean,
      errors: collection.Map[String, String], sfDir: String): String = {
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.take(60) + "\"" }.mkString("{", ",", "}")
    f"""{"metric":"total","value":$r1%.3f,"unit":"sec","total_all":$totalAll%.3f,"run_secs":$runSecs%.1f,"load_warning":$loaded,"errors":$errJson,"sf":"$sfDir","queries_file":"BENCH_LAST.json"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup on the smallest SF so measured numbers reflect
    // steady-state execution, not first-query classloading.
    val warmDir = "/root/testdata/sf0.001"
    Seq("q1_pricing", "llm_dedup_minhash").foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }

    // Median of 5 INTERLEAVED passes per query. Back-to-back repeats of
    // a ~1 s query all land inside the same shared-box contention window
    // (minutes long), so even a min-of-3 recorded 6× phantom swings two
    // rounds running. Sweeping the whole set instead puts a query's
    // repetitions minutes apart; five sweeps let the median discard TWO
    // contended passes (an A/B re-run of interleaved median-of-3 still
    // moved 6/91 sub-second queries >30% when two passes of one run
    // were slow). "spread" reports max/min per query where the passes
    // disagreed >1.5×, so residual noise is visible IN the artifact
    // instead of needing a re-measure. A failed run is recorded in
    // "errors", never as a (fast) wall time.
    // Dev-only subset filter (comma-separated names) for perf
    // iteration on one query; the driver never sets it, so the
    // driver-run bench always measures the full headline set.
    val only = sys.env.get("GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val measured = headline.filter(n => only.forall(_.contains(n)))
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val times = scala.collection.mutable.LinkedHashMap.empty[String, List[Double]]
    def measureOnce(name: String): Unit =
      SparkEntry.queries.get(name).foreach { fn =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          times(name) = times.getOrElse(name, Nil) :+
            (System.nanoTime() - t0) / 1e9
        } catch {
          case t: Throwable =>
            errors(name) = Option(t.getMessage).getOrElse(t.getClass.getName)
              .replaceAll("[\"\\n\\r]", " ").take(200)
        }
      }
    val runT0 = System.nanoTime()
    (1 to 5).foreach { _ => measured.foreach(measureOnce) }
    // Spread-sanity pass: a query whose five interleaved passes
    // disagree >5× was measured through a foreign load spike — a
    // regression gate trusting that median would flag phantom 3–6×
    // "regressions" (or hide real ones). Re-measure just those queries
    // with three more passes; the median over all samples then discards
    // the contended ones. The artifact records who was re-measured, so
    // a noisy run is visible IN the evidence rather than silently
    // blessed.
    val remeasured = measured.filter { name =>
      val ts = times.getOrElse(name, Nil)
      ts.size >= 2 && ts.min > 0 && ts.max / ts.min > 5.0
    }
    remeasured.foreach { name => (1 to 3).foreach(_ => measureOnce(name)) }
    val runSecs = (System.nanoTime() - runT0) / 1e9
    val results = measured.filter(SparkEntry.queries.contains).map { name =>
      val ts = times.getOrElse(name, Nil).sorted
      name -> (if (ts.isEmpty) -1.0 else ts(ts.size / 2))
    }
    val spread = measured.flatMap { name =>
      val ts = times.getOrElse(name, Nil)
      if (ts.size >= 2 && ts.min > 0 && ts.max / ts.min > 1.5)
        Some(name -> ts.max / ts.min)
      else None
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val spreadJson = spread.map { case (k, v) => "\"" + k + f"\":$v%.2f" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val r1 = results.filter(r => round1Set.contains(r._1))
      .map(_._2).filter(_ >= 0).sum
    val totalAll = results.map(_._2).filter(_ >= 0).sum
    val remJson = remeasured.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Load warning: compare this run's wall clock to the MIN of the
    // last few honest (not-load-warned) runs — a machine busy with
    // other work inflates the whole sweep (the round-13 artifact ran
    // 2.5× its norm and its numbers were garbage). Comparing against
    // just the previous artifact let one contaminated run raise the
    // bar 2.4× for its successor; the honest-runs window keeps the
    // norm honest (and ages out after 5 runs, so a genuinely slower
    // machine eventually stops warning). The warning goes to stderr
    // AND rides the artifact, so a gate reading it knows the evidence
    // is suspect.
    val outPath = java.nio.file.Paths.get(sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")).toAbsolutePath
    val prevJson = try Some(new String(
      java.nio.file.Files.readAllBytes(outPath),
      java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => None }
    val honest = honestRuns(prevJson)
    val loaded = loadWarn(honest, runSecs)
    if (loaded) System.err.println(
      f"bench: LOAD WARNING — run took $runSecs%.0f s vs best recent " +
        f"honest run ${honest.min}%.0f s (>2x): this machine was busy, " +
        "do not trust these numbers for a regression gate")
    val honestJson = nextHonestRuns(honest, runSecs, loaded)
      .map(v => f"$v%.1f").mkString("[", ",", "]")
    val line =
      f"""{"metric":"total","value":$r1%.3f,"unit":"sec","queries":$qs,"total_all":$totalAll%.3f,"spread":$spreadJson,"remeasured":$remJson,"run_secs":$runSecs%.1f,"load_warning":$loaded,"honest_runs":$honestJson,"errors":$errJson,"sf":"$sfDir"}"""
    println(line)
    // Compact duplicate of the headline numbers, printed AFTER the full
    // line so a bounded stdout-tail capture always holds one complete,
    // parseable JSON line (see compactLine). Same measurements, zero
    // methodology change; the full line above and BENCH_LAST.json keep
    // the complete per-query map.
    println(compactLine(r1, totalAll, runSecs, loaded, errors, sfDir))
    // Also persist the artifact as a FILE (atomic rename), so a stdout
    // capture that keeps only the tail can never truncate the queries
    // map. SPARK_GRAFT_BENCH_OUT overrides the default path
    // (toAbsolutePath above: a bare-filename override has a null
    // getParent, which would NPE the temp-file creation below).
    try {
      val tmp = java.nio.file.Files.createTempFile(
        outPath.getParent, ".bench", ".json.tmp")
      java.nio.file.Files.write(tmp,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, outPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case t: Throwable =>
      System.err.println(s"bench artifact write failed: ${t.getMessage}")
    }
    spark.stop()
  }
}
