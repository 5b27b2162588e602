package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (driver mandate).
  *
  * Scale design: every operator is a fixed number of hash-partitioned
  * shuffles keyed on content-derived keys; nothing is quadratic in the
  * corpus except within explicit candidate buckets.
  *  - exact: one shuffle on a 128-bit hash
  *  - minhash LSH: shingle explode (map-side), one groupBy(doc) for
  *    signatures, band explode, one groupBy(bucket-pair) — candidates
  *    only ever compared within a band bucket
  *  - ngram jaccard: exact verification, for candidate pairs or small
  *    corpora — the shingle inverted index join is the quadratic one,
  *    so at scale feed it ONLY LSH candidates
  */
object Dedup {

  /** Exact dedup: keep the smallest id per canonical-content hash. */
  def exact(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val h = TextOps.contentHash(col(textCol))
    df.withColumn("__h", h)
      .groupBy("__h")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))
      .withColumnRenamed("__h", "content_hash")
  }

  /** The KEPT ROWS of exact dedup — `df` minus every row whose content
    * hash has a smaller id. Same keep rule as [[exact]], computed as a
    * min-id window over ONE content-hash shuffle instead of
    * groupBy + join-back: the join form reshuffles the full rows on
    * `idCol` (and the keep side again) once the keep set outgrows a
    * broadcast, so at corpus scale this is one full-row exchange
    * instead of three. */
  def exactKept(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(TextOps.contentHash(col(textCol)))
    df.withColumn("__keep", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keep"))
      .drop("__keep")
  }

  /** Mersenne prime 2^31-1: the affine minhash family modulus. */
  val MinhashP: Long = 2147483647L
  /** Fixed affine coefficients (a_i, b_i) — one cheap integer hash per
    * seed derived from a single base md5, instead of k md5 invocations
    * per shingle (k-fold md5 measured ~2× slower end-to-end at sf0.1). */
  val MinhashCoeffs: Seq[(Long, Long)] = Seq(
    (1583L, 507), (2671L, 1231L), (3877L, 2089L), (5099L, 3181L),
    (6317L, 4327L), (7561L, 5443L), (8783L, 6563L), (10037L, 7687L))

  /** Per-doc minhash signature columns mh0..mh{k-1}.
    *
    * Shape matters twice here:
    *  - explode once, then k partial-aggregated min()s. The tempting
    *    no-shuffle alternative — k × array_min(transform(...)) in one
    *    projection — is 5× slower because CollapseProject re-inlines the
    *    shingle construction into every signature column (measured at
    *    sf0.1: 54 s vs 11 s). The explode computes shingles exactly
    *    once, and the min() partial agg keeps the shuffle at |docs|.
    *  - one 60-bit md5-derived base hash per shingle, then the affine
    *    family h_i = (a_i·h + b_i) mod 2^31-1 — h < 2^31 so products
    *    stay in long range; identical arithmetic is SQL-expressible for
    *    the oracle. */
  def minhashSignatures(df: DataFrame, k: Int = 8, shingleN: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k <= MinhashCoeffs.size, s"at most ${MinhashCoeffs.size} minhash seeds")
    // dedup=false: min() is insensitive to duplicate shingles, so skip
    // the distinct shuffle
    val sh = TextOps.shingleRows(df, shingleN, idCol, textCol, dedup = false)
      .withColumn("h", TextOps.tokenHash60(col("shingle")) % MinhashP)
    // one native TypedImperativeAggregate carries all k minhashes in a
    // primitive long[] buffer (graft.expressions.MinHashAgg), replacing
    // k separate min() aggregation columns
    sh.groupBy(idCol)
      .agg(graft.expressions.GraftFunctions.minhash_agg(col("h"), k).as("__mh"))
      .select(col(idCol) +:
        (0 until k).map(i => element_at(col("__mh"), i + 1).as(s"mh$i")): _*)
  }

  /** LSH banding: bands of `rowsPerBand` signatures → bucket ids.
    * `carry` names extra signature-frame columns to keep on each row. */
  def lshBuckets(sigs: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
                 idCol: String = "doc_id",
                 carry: Seq[String] = Nil): DataFrame = {
    val bands = k / rowsPerBand
    val bucketCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      // "-" separator: (12,345) must not collide with (123,45)
      concat_ws("-", lit(b) +: parts: _*)
    }
    sigs.select(col(idCol) +: explode(array(bucketCols: _*)).as("bucket") +:
      carry.map(col): _*)
  }

  /** Sort tasks that carried the last hot-bucket neighborhood sort —
    * the "one degenerate bucket must not serialize on one core"
    * contract made observable (spec-pinned). */
  @volatile var lastHotSortTasks: Int = 0

  /** Contiguous global rank over `sortCols` WITHOUT a single-task
    * window: a distributed range sort (explicit partition count so AQE
    * cannot re-coalesce a small-but-degenerate key group onto one
    * task) + `zipWithIndex` (per-partition offsets — O(#partitions)
    * driver metadata). Rows sharing a leading key are contiguous in
    * the rank, so per-key ranks are rank differences — the scalable
    * replacement for `row_number().over(partitionBy(key))`, whose
    * window gathers each key group into ONE task. Returns the frame
    * with a `__rn` LONG column; sets [[lastHotSortTasks]]. */
  private[graft] def globalRank(df: DataFrame,
                                sortCols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(spark.sessionState.conf.numShufflePartitions,
        sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "__rn", org.apache.spark.sql.types.LongType))
    val ranked = sorted.rdd.zipWithIndex
    lastHotSortTasks = ranked.getNumPartitions
    spark.createDataFrame(
      ranked.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }, schema)
  }

  /** Candidate near-dup pairs (a<b) from shared LSH buckets.
    *
    * The DEFAULT (`maxBucket = Int.MaxValue`) is the exact all-pairs
    * bucket self-join — output is the textbook LSH candidate set, the
    * semantics the DuckDB oracle replays for the `llm_dedup_near`
    * family. Pass a finite `maxBucket` at scale-sensitive call sites
    * (the release funnel, corpora with template boilerplate) to cap
    * hot buckets: the self-join is quadratic WITHIN a bucket, and real
    * web corpora have degenerate buckets (boilerplate templates that
    * survive exact dedup land thousands of near-identical docs in one
    * band bucket) — at 100 TB one such bucket emits O(n²) pairs and
    * everything downstream (overlap join, Jaccard verify) inherits the
    * blowup. Buckets of ≤ `maxBucket` docs keep the exact all-pairs
    * join; buckets ABOVE it switch to a sorted neighborhood: docs are
    * ordered by (full signature, id) so near-identical docs are
    * adjacent, and each doc pairs with only its `hotWindow`
    * predecessors — ≤ n·hotWindow pairs instead of n²/2. For the
    * degenerate case that motivates the cap (a bucket of near-identical
    * docs, i.e. equal signatures) the chain pairs every doc with its
    * id-predecessor, so greedy min-id dedup and connected components
    * both reach the SAME result as the uncapped join; for a mixed
    * oversized bucket recall degrades gracefully with distance in
    * signature order (the standard sorted-neighborhood trade, Hernández
    * & Stolfo's merge/purge).
    *
    * The capped path never gathers a bucket into one task: bucket
    * sizes come from a partial-aggregated groupBy (not a windowed
    * count), and the neighborhood order is a DISTRIBUTED range sort on
    * (bucket, signature, id) with a contiguous global rank from
    * `zipWithIndex` (per-partition offsets — O(#partitions) driver
    * metadata) instead of a per-bucket `row_number` window, so a
    * 100M-doc degenerate bucket sorts across the cluster rather than
    * serializing on a single core. Within a bucket the global ranks
    * are contiguous (the sort leads with the bucket), so rank-window
    * pairing joined back on (bucket, rank) emits exactly the pairs the
    * single-task window produced. Mirrors the streaming path's
    * per-bucket state cap (StreamingDedup.maxPerBucket); reference
    * analog: the bounded-packet discipline of pg2any's coalescing
    * (`coalescing.rs:915-944`). */
  def minhashCandidates(df: DataFrame, k: Int = 8, rowsPerBand: Int = 2,
                        shingleN: Int = 3, idCol: String = "doc_id",
                        textCol: String = "text",
                        maxBucket: Int = Int.MaxValue,
                        hotWindow: Int = 8,
                        dedupPairs: Boolean = true): DataFrame = {
    // dedupPairs=false skips the final pair `distinct()` (one exchange
    // + its AQE stage) for consumers that only ever SEMI-join against
    // the candidate set (nearDedup, the clustering backbone): a
    // left-semi probe is insensitive to duplicate build keys, so the
    // multi-band duplicates are harmless there. Consumers that COUNT
    // or EMIT pairs (llm_dedup_minhash, llm_dup_matrix,
    // llm_edit_distance) keep the default distinct set.
    val sigs = minhashSignatures(df, k, shingleN, idCol, textCol)
    if (maxBucket == Int.MaxValue) {
      // exact path: no sizing pass, no signature carry — one self-join.
      // The lazy checkpoint measured FASTER than relying on AQE
      // exchange reuse across the self-join sides (removing it cost
      // +0.1–0.4 s on every dedup-family query at sf0.1): the snapshot
      // also truncates the composite plan, which the reuse cache can't.
      val buckets = lshBuckets(sigs, k, rowsPerBand, idCol)
        .localCheckpoint(false) // both self-join sides reuse it
      val a = buckets.as("a"); val b = buckets.as("b")
      val pairs = a.join(b, col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
      return if (dedupPairs) pairs.distinct() else pairs
    }
    val spark = df.sparkSession
    val sigKey = concat_ws("-", (0 until k).map(i => col(s"mh$i")): _*)
    val buckets = lshBuckets(sigs.withColumn("__sk", sigKey), k, rowsPerBand, idCol,
        carry = Seq("__sk"))
      .localCheckpoint(false) // small/hot split + self-join reuse it
    // bucket sizes via partial-aggregated groupBy + join (AQE-splittable)
    // — a windowed count would gather each bucket into ONE task first
    val sized = buckets.join(
      buckets.groupBy("bucket").agg(count(lit(1)).as("__n")), "bucket")
    val small = sized.filter(col("__n") <= maxBucket).select(col(idCol), col("bucket"))
    val a = small.as("a"); val b = small.as("b")
    val fullPairs = a.join(b, col("a.bucket") === col("b.bucket") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
    // hot path: distributed neighborhood sort — a contiguous global
    // rank over (bucket, signature, id) spreads even a single
    // degenerate bucket (equal __sk) across tasks by id
    val hot = globalRank(
        sized.filter(col("__n") > maxBucket)
          .select(col(idCol), col("bucket"), col("__sk")),
        Seq("bucket", "__sk", idCol))
      .select(col(idCol), col("bucket"), col("__rn"))
      .localCheckpoint(false) // probe + anchor sides reuse it
    val probes = hot.filter(col("__rn") >= 1)
      .select(col(idCol).as("__ib"), col("bucket"),
        explode(sequence(greatest(col("__rn") - hotWindow, lit(0L)),
          col("__rn") - 1)).as("__rn"))
    // the join key (bucket, __rn) is high-cardinality even inside one
    // bucket, so the pairing shuffle spreads a hot bucket too; ranks
    // that fall before the bucket's first row belong to the PREVIOUS
    // bucket and the bucket equality drops them
    val hotPairs = probes
      .join(hot.withColumnRenamed(idCol, "__ia"), Seq("bucket", "__rn"))
      .select(least(col("__ia"), col("__ib")).as("da"),
        greatest(col("__ia"), col("__ib")).as("db"))
    val pairs = fullPairs.union(hotPairs)
    if (dedupPairs) pairs.distinct() else pairs
  }

  /** Shared shingle-overlap core: (da, db, inter, sza, szb) for every
    * overlapping pair. `candidates` (da, db) restricts the comparison
    * set; None = all pairs via the shingle inverted index (small
    * corpora only). */
  private def pairOverlap(df: DataFrame, shingleN: Int, idCol: String,
                          textCol: String,
                          candidates: Option[DataFrame]): DataFrame = {
    // With candidates, the inverted-index self-join runs over candidate
    // docs ONLY — at scale the candidate set is a vanishing fraction of
    // the corpus, and joining the full index just to semi-filter
    // afterwards would dominate the whole pipeline. The semi-join is
    // applied to the DOC rows, BELOW the shingle explode: a per-doc
    // restriction commutes with a per-doc explode+distinct, so the
    // result is identical to restricting the exploded rows, but the
    // explode (and the shingle distinct's exchange) runs over candidate
    // docs instead of the whole corpus — Catalyst does not push a
    // semi-join through a Generate, so the r15 shape re-exploded and
    // re-deduped the FULL corpus once per reference (3× in the plan).
    // lazy checkpoints: the candidate pipeline (usually the whole
    // minhash+LSH chain) is referenced twice below (doc semi-join +
    // pair semi-join), and `sh` three times (sizes + both self-join
    // sides); without the snapshots each reference re-evaluates its
    // chain.
    val cands = candidates.map(_.localCheckpoint(false))
    val sh = cands match {
      case Some(c) =>
        // no distinct on candDocs: a left-semi probe is insensitive to
        // duplicate build keys, so the dedup aggregation was a pure
        // extra stage
        val candDocs = c.select(col("da").as(idCol))
          .union(c.select(col("db").as(idCol)))
        TextOps.shingleRows(df.join(candDocs, Seq(idCol), "left_semi"),
            shingleN, idCol, textCol)
          .localCheckpoint(false)
      case None =>
        // full-index path (small corpora only): ONE shingle-keyed
        // exchange — multiset rows repartition by shingle and the
        // (id, shingle) distinct runs partition-local on top of it
        // (HashPartitioning(shingle) satisfies the clustering); the
        // snapshot keeps the three references below (sizes + both
        // self-join sides) from re-running the explode, and preserves
        // the shingle partitioning so the self-join plans without a
        // further exchange.
        TextOps.shingleRows(df, shingleN, idCol, textCol, dedup = false)
          .repartition(col("shingle"))
          .dropDuplicates(idCol, "shingle")
          .localCheckpoint(false)
    }
    // sizes from the (possibly candidate-restricted) rows: the size of
    // a doc the pair join never references is never read, and the
    // semi-join keeps EVERY shingle row of a kept doc, so each retained
    // doc's count is identical to its full-corpus count — this removes
    // a second full shingle-explode pass in the candidate-restricted
    // case (the dominant mode: every near-dedup pipeline).
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val a = sh.as("a"); val b = sh.as("b")
    val joined = a.join(b, col("a.shingle") === col("b.shingle") &&
      col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("da"), col(s"b.$idCol").as("db"))
    val restricted = cands match {
      case Some(c) => joined.join(c, Seq("da", "db"), "left_semi")
      case None => joined
    }
    restricted
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed(idCol, "da").withColumnRenamed("sz", "sza"), "da")
      .join(sizes.withColumnRenamed(idCol, "db").withColumnRenamed("sz", "szb"), "db")
  }

  /** Exact n-gram Jaccard similarity for pairs above a threshold. */
  def ngramJaccard(df: DataFrame, threshold: Double, shingleN: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   candidates: Option[DataFrame] = None): DataFrame =
    pairOverlap(df, shingleN, idCol, textCol, candidates)
      .withColumn("un", col("sza") + col("szb") - col("inter"))
      .withColumn("jaccard", col("inter") * lit(1.0) / col("un"))
      .filter(col("jaccard") >= threshold)
      .select("da", "db", "inter", "un", "jaccard")

  /** Containment near-dup: inter / min(|A|,|B|) ≥ threshold — catches a
    * small document EMBEDDED in a larger one (quotes, concatenated
    * shards, boilerplate wrappers), where Jaccard dilutes toward
    * |small|/|large| and no usable threshold exists. Standard alongside
    * Jaccard in training-data dedup (the "containment" of Broder's
    * resemblance/containment pair). Same inverted-index shape and the
    * same LSH-candidate restriction path as [[ngramJaccard]]. */
  def ngramContainment(df: DataFrame, threshold: Double, shingleN: Int = 3,
                       idCol: String = "doc_id", textCol: String = "text",
                       candidates: Option[DataFrame] = None): DataFrame =
    pairOverlap(df, shingleN, idCol, textCol, candidates)
      .withColumn("containment", col("inter") * lit(1.0) / least(col("sza"), col("szb")))
      .filter(col("containment") >= threshold)
      .select("da", "db", "inter", "containment")

  /** 60-bit SimHash per document.
    *
    * Shape: 60 per-bit sums as aggregation COLUMNS over the token rows —
    * not an explode of 60 bit-positions per token, which multiplies the
    * row count 60× before the shuffle. One groupBy(doc), map-side
    * partial aggregation, rows stay |tokens|. */
  def simhash(df: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))
      .withColumn("h", TextOps.tokenHash60(col("tok")))
    // one native TypedImperativeAggregate (primitive long[60] buffer)
    // replaces 60 per-bit sum() columns — 60 expression evals per token
    // row collapsed into one; bit-identical packing (sign of each ±1
    // sum), see graft.expressions.SimHashAgg
    tok.groupBy(idCol)
      .agg(graft.expressions.GraftFunctions.simhash_agg(col("h"))
        .as("simhash"))
  }

  /** Hamming distance between two simhash columns (near-dup test). */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Eval-set contamination check: docs sharing ≥ `minShared` distinct
    * shingles with any document of the evaluation set. The eval set's
    * shingle vocabulary is small (eval sets are, by definition) —
    * broadcast it; per-doc overlap is then one map-side join plus a
    * single groupBy(doc) count, linear in the corpus at any scale. */
  def contamination(df: DataFrame, evalDocs: DataFrame, minShared: Int = 3,
                    shingleN: Int = 3, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val evalSh = TextOps.shingleRows(evalDocs, shingleN, idCol, textCol)
      .select("shingle").distinct()
    // corpus side dedup=false + distinct AFTER the broadcast join: the
    // eval side is distinct, so the inner join keeps corpus-row
    // multiplicity and distinct∘join ≡ join∘distinct — but the distinct
    // exchange now carries only the MATCHED rows (the eval overlap)
    // instead of the whole corpus's (id, shingle) set
    TextOps.shingleRows(df, shingleN, idCol, textCol, dedup = false)
      .join(broadcast(evalSh), "shingle")
      .select(col(idCol), col("shingle")).distinct()
      .groupBy(idCol).agg(count(lit(1)).as("shared_shingles"))
      .filter(col("shared_shingles") >= minShared)
  }

  /** Bloom bit position r of a shingle: k independent md5-salted hashes
    * into an m-bit address space. */
  private def bloomPos(sh: Column, r: Int, mBits: Int): Column =
    pmod(TextOps.tokenHash60(concat(lit(s"bloom$r:"), sh)), lit(mBits.toLong))

  /** Bloom-filter form of the decontamination gate's benchmark side:
    * the eval set's shingles folded into a set of ≤ mBits bit positions.
    *
    * Why this exists next to [[contamination]]: that gate broadcasts the
    * eval set's DISTINCT SHINGLE STRINGS, which is fine for one
    * benchmark but grows linearly with the held-out corpus — a sweep
    * against a large eval union (every benchmark ever published) stops
    * being broadcastable. The Bloom form is bounded at mBits rows
    * (64 Ki positions ≈ 512 KiB as a bitset) REGARDLESS of benchmark
    * size, at the price of a quantified, deterministic false-positive
    * rate (~(1-e^{-kn/m})^k; same md5 hashes on both engines, so even
    * the false positives are oracle-reproducible). */
  def bloomBits(evalDocs: DataFrame, mBits: Int = 1 << 16, kHashes: Int = 4,
                shingleN: Int = 3, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame =
    TextOps.shingleRows(evalDocs, shingleN, idCol, textCol)
      .select(explode(array((0 until kHashes).map(r =>
        bloomPos(col("shingle"), r, mBits)): _*)).as("bit"))
      .distinct()

  /** Corpus docs whose count of bloom-POSITIVE distinct shingles (all k
    * positions set) reaches `minShared` — flag-then-verify companion to
    * [[contamination]]. One shingle scan, a broadcast join against the
    * bounded bit table, two bounded partial aggregations. */
  def bloomContamination(df: DataFrame, bits: DataFrame, minShared: Int = 3,
                         mBits: Int = 1 << 16, kHashes: Int = 4,
                         shingleN: Int = 3, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame =
    // dedup=false: the groupBy(id, shingle) below already collapses
    // duplicate shingles (countDistinct over r is insensitive to
    // repeated (shingle, r) rows), so the pre-join per-corpus distinct
    // was a redundant full exchange — the partial agg dedups map-side
    TextOps.shingleRows(df, shingleN, idCol, textCol, dedup = false)
      .select(col(idCol), col("shingle"),
        posexplode(array((0 until kHashes).map(r =>
          bloomPos(col("shingle"), r, mBits)): _*)).as(Seq("r", "bit")))
      .join(broadcast(bits), "bit")
      // a shingle is bloom-positive iff ALL k of its positions are set:
      // count the DISTINCT matched hash indices (two r's may share a bit)
      .groupBy(idCol, "shingle")
      .agg(countDistinct("r").as("nr"))
      .filter(col("nr") === kHashes)
      .groupBy(idCol).agg(count(lit(1)).as("n_flagged"))
      .filter(col("n_flagged") >= minShared)

  /** Persist the Bloom benchmark artifact — VERSIONED so a live serving
    * side (the curate intake re-reads the artifact per trigger) can
    * never observe a half-refreshed one: each build writes a complete
    * `dir/v<N>/{bits,meta}` (bits = the position set, meta = m/k/shingle
    * so serving can never hash into a different address space than the
    * build), then atomically swings `dir/CURRENT` to N via a temp-file
    * rename. In-flight readers of v<N-1> finish against their complete
    * version; the PREVIOUS version is removed only when the new pointer
    * is durable (older ones are already gone by induction). */
  def writeBloom(spark: org.apache.spark.sql.SparkSession, dir: String,
                 evalDocs: DataFrame, mBits: Int = 1 << 16, kHashes: Int = 4,
                 shingleN: Int = 3, idCol: String = "doc_id",
                 textCol: String = "text"): Long = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val cur = new Path(root, "CURRENT")
    val prev = currentBloomVersion(fs, cur)
    val next = prev.getOrElse(0L) + 1L
    bloomBits(evalDocs, mBits, kHashes, shingleN, idCol, textCol)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/v$next/bits")
    import spark.implicits._
    Seq((mBits, kHashes, shingleN)).toDF("m_bits", "k_hashes", "shingle_n")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/v$next/meta")
    val tmp = new Path(root, s"_CURRENT.$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(cur, false)
    fs.rename(tmp, cur)
    prev.foreach(p => fs.delete(new Path(root, s"v$p"), true))
    spark.read.schema("bit BIGINT").parquet(s"$dir/v$next/bits").count()
  }

  private def currentBloomVersion(fs: org.apache.hadoop.fs.FileSystem,
                                  cur: org.apache.hadoop.fs.Path): Option[Long] =
    if (!fs.exists(cur)) None
    else {
      val in = fs.open(cur)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }

  /** [[bloomContamination]] against a persisted artifact — parameters
    * come from the artifact's own meta, not the caller; the version is
    * resolved ONCE per call, so bits and meta always come from the same
    * complete build even if a refresh lands mid-read. */
  def bloomContaminationFrom(spark: org.apache.spark.sql.SparkSession,
                             dir: String, df: DataFrame, minShared: Int = 3,
                             idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val v = currentBloomVersion(fs, new Path(root, "CURRENT")).getOrElse(
      throw new IllegalArgumentException(s"$dir has no CURRENT bloom version"))
    val meta = spark.read.parquet(s"$dir/v$v/meta").head()
    val bits = spark.read.schema("bit BIGINT").parquet(s"$dir/v$v/bits")
    bloomContamination(df, bits, minShared,
      mBits = meta.getAs[Int]("m_bits"), kHashes = meta.getAs[Int]("k_hashes"),
      shingleN = meta.getAs[Int]("shingle_n"), idCol = idCol, textCol = textCol)
  }

  /** Connected components over an undirected edge set (aCol, bCol):
    * the TRANSITIVE closure of near-duplicate pairs, where greedy min-id
    * dropping under-merges chains (a~b, b~c, a≁c is one cluster here).
    *
    * Algorithm: min-label propagation with pointer jumping — each round
    * takes the min over neighbor labels, then rewrites every label by
    * its own label (path halving), so convergence is O(log diameter)
    * rounds, not O(diameter). Each round is two hash-shuffles of the
    * edge list; `localCheckpoint` truncates the plan between rounds
    * (iterative lineage otherwise grows exponentially). Labels only
    * decrease, so the fixpoint (min id of the component) is reached
    * deterministically regardless of partitioning. At 100 TB this is
    * the standard alternating-contraction shape (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond" — public
    * literature); near-dup clusters have tiny diameters, so expected
    * rounds ≈ 3-4.
    *
    * Returns (id, comp) for every vertex that appears in an edge;
    * comp = min doc id reachable. */
  def connectedComponents(edges: DataFrame, aCol: String = "da",
                          bCol: String = "db", maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    // each round both propagates (labels ⋈ edges) and pointer-jumps
    // (labels ⋈ labels): self-joins on an iteratively-rebuilt plan
    // collide on attribute ids, so every round snapshots the label
    // table (eager localCheckpoint truncates lineage — iterative plans
    // otherwise grow without bound) and `view()` re-wraps the snapshot
    // RDD with FRESH attribute ids per use site
    def view(snap: DataFrame): DataFrame =
      spark.createDataFrame(snap.rdd, snap.schema)
    // snapshot the edge list FIRST: `edges` is typically the output of
    // a whole candidate+verify pipeline, and building the symmetric
    // closure from the raw plan would evaluate that pipeline once per
    // union side
    val edgeSnap = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint(true)
    val symSnap = view(edgeSnap)
      .select(col("a").as("id"), col("b").as("nb"))
      .union(view(edgeSnap).select(col("b").as("id"), col("a").as("nb")))
      .localCheckpoint(true)
    var labelsSnap = view(symSnap).select("id").distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    // convergence detection: labels are MONOTONE (min/least only ever
    // lower them), so the fixpoint is reached exactly when the label-sum
    // stops decreasing — one cheap scan aggregation per round on the
    // checkpointed table, instead of a full self-join diff. decimal(38)
    // keeps the sum exact at any vertex count.
    def labelSum(snap: DataFrame): java.math.BigDecimal = {
      val r = view(snap).agg(sum(col("comp").cast("decimal(38,0)"))).head()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    var prevSum = labelSum(labelsSnap)
    var changed = true
    var iter = 0
    while (changed && iter < maxIter) {
      val viaNb = view(symSnap)
        .join(view(labelsSnap).withColumnRenamed("id", "nb"), "nb")
        .select(col("id"), col("comp"))
      val stepMin = view(labelsSnap).union(viaNb)
        .groupBy("id").agg(min("comp").as("comp"))
      val mapSide = view(labelsSnap)
        .select(col("id").as("cid"), col("comp").as("ccomp"))
      val jumpedSnap = stepMin
        .join(mapSide, col("comp") === col("cid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ccomp"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      val newSum = labelSum(jumpedSnap)
      changed = newSum.compareTo(prevSum) != 0
      prevSum = newSum
      labelsSnap = jumpedSnap
      iter += 1
    }
    labelsSnap
  }

  /** End-to-end near-dedup: LSH candidates verified by exact Jaccard,
    * then keep min-id per duplicate component (greedy: a doc is dropped
    * if any smaller-id doc is near-identical — one pass, no iterative
    * connected components; good enough for dedup where clusters are
    * small and transitivity holds at high thresholds).
    *
    * `maxBucket` defaults to the EXACT all-pairs candidate semantics
    * (the oracle contract); scale-sensitive callers opt into the
    * hot-bucket sorted-neighborhood cap explicitly — see
    * [[minhashCandidates]]. */
  def nearDedup(df: DataFrame, threshold: Double = 0.8,
                idCol: String = "doc_id", textCol: String = "text",
                maxBucket: Int = Int.MaxValue,
                hotWindow: Int = 8): DataFrame = {
    // dedupPairs=false: every consumer below is a semi-join, so the
    // candidate distinct's exchange is pure overhead (see
    // minhashCandidates)
    val cands = minhashCandidates(df, idCol = idCol, textCol = textCol,
      maxBucket = maxBucket, hotWindow = hotWindow, dedupPairs = false)
    val verified = ngramJaccard(df, threshold, idCol = idCol, textCol = textCol,
      candidates = Some(cands))
    // no distinct: left-anti is insensitive to duplicate build keys
    val drops = verified.select(col("db").as(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /** Winnowing fingerprints (the MOSS local-fingerprint family): the set
    * of window-minima of the positional shingle-hash sequence. Unlike the
    * global sketches above (minhash/simhash summarize the WHOLE document),
    * winnowing guarantees any shared run of ≥ `w + n - 1` tokens
    * contributes at least one common fingerprint — it catches partial
    * overlap (quoted passages, concatenated shards) that whole-document
    * sketches dilute away.
    *
    * Shape: positional shingle hashes (posexplode, codegen'd element_at
    * construction — same bulk path as [[TextOps.shingleRows]]), then ONE
    * partition-local window min per doc and a distinct. Rows stay
    * |tokens|; the only shuffle is the per-doc window partition.
    * Returns (idCol, m) — the doc's fingerprint set. */
  def winnowFingerprints(df: DataFrame, shingleN: Int = 3, w: Int = 4,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    winnowRaw(df, shingleN, w, idCol, textCol)
      .select(col(idCol), col("m")).distinct()

  /** Pre-distinct winnowing rows (idCol, m) — the shared core of
    * [[winnowFingerprints]] and [[winnowPairs]], which dedups under a
    * DIFFERENT partitioning (by fingerprint, so the whole pair chain
    * rides one exchange). */
  private def winnowRaw(df: DataFrame, shingleN: Int, w: Int,
                        idCol: String, textCol: String): DataFrame = {
    val base = df
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .select(col(idCol), col("__t"), posexplode(col("__t")))
      .filter(col("pos") <= size(col("__t")) - shingleN)
    val parts = col("col") +:
      (2 to shingleN).map(j => element_at(col("__t"), col("pos") + j))
    val hashed = base.select(col(idCol), col("pos"),
      TextOps.tokenHash60(concat_ws(" ", parts: _*)).as("h"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos").rowsBetween(-(w - 1), 0)
    hashed
      .withColumn("m", min("h").over(win))
      .filter(col("pos") >= w - 1) // full windows only
      .select(col(idCol), col("m"))
  }

  /** Winnowing candidate pairs: docs sharing ≥ `minShared` fingerprints.
    * `dfCap` drops ubiquitous fingerprints first (document frequency
    * > cap ⇒ boilerplate/stop-fingerprint — the standard index trim that
    * also bounds the inverted-index join: every posting list is ≤ dfCap,
    * so the pair blow-up is ≤ dfCap per fingerprint, never corpus²). */
  def winnowPairs(df: DataFrame, dfCap: Int = 50, minShared: Int = 2,
                  shingleN: Int = 3, w: Int = 4,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // Dedup FIRST (map-side partial agg keeps the shuffle at the
    // distinct-fingerprint volume — guide §2.3), then ONE
    // fingerprint-keyed exchange of the deduped rows: the df-cap count
    // becomes a partition-frame window and the inverted-index
    // self-join reuses the same clustering (guide §2.4). The previous
    // form paid a groupBy(m) aggregation plus a join reshuffle here;
    // at corpus scale that join is a sort-merge that sorts BOTH sides
    // on m anyway — the window sorts the one table once.
    // checkpoint AFTER the df-cap cut: both self-join sides read the
    // already-filtered snapshot (window computed once), and the
    // snapshot keeps the hash(m) partitioning, so the self-join below
    // needs no exchange
    val idx = winnowFingerprints(df, shingleN, w, idCol, textCol)
      .repartition(col("m"))
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("m")))
      .filter(col("__df") <= dfCap)
      .drop("__df")
      .localCheckpoint(false)
    idx.select(col("m"), col(idCol).as("da"))
      .join(idx.select(col("m"), col(idCol).as("db")), "m")
      .filter(col("da") < col("db"))
      .groupBy("da", "db").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
