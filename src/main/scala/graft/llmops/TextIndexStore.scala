package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable BM25 inverted index — the persisted serving form of
  * [[Lexical.bm25TopK]], the lexical sibling of [[AnnIndexStore]]: a
  * corpus search surface that outlives the session, restarts from
  * object storage, and serves each query by reading ONLY the query
  * terms' posting lists.
  *
  * Layout: `path/batch=B/part=P/…` parquet postings
  * `(term, doc_id, tf, dl)` with `part = pmod(hash(term), numParts)` —
  * the doc length rides each posting row (the Lucene norms-in-posting
  * idiom) so serving never touches a second per-doc table. Corpus-wide
  * stats live as per-batch rows under `_stats/batch=B` — additive
  * (n_docs, n_tokens), so the store total is one tiny sum and a
  * replayed batch OVERWRITES its own stats row instead of
  * double-counting.
  *
  * Serving ([[search]]): the probe's distinct terms (driver-bounded —
  * query strings, not corpus data) hash to their parts; only those
  * `part=P` dirs of each batch are read (Catalyst partition pruning —
  * `lastPlannedDirs` pins the contract), df comes exact from the pruned
  * read (a term's postings live entirely in its part), and the scoring
  * tail is the SAME integer-exact chain as the batch operator — a
  * store-served ranking equals the one-shot ranking bit-for-bit.
  *
  * Intake contract: doc_ids are NEW per batch (the intake dedups
  * upstream, as with [[LshIndexStore]]); re-adding an id would inflate
  * df/tf. Replay-idempotent by construction: `addBatch` deletes +
  * dynamically overwrites its own `batch=B` dirs and stats row, marker
  * after data. [[delete]] retracts documents without touching a
  * posting (tombstones + exact stat adjustment through the per-batch
  * `_lens` table — a post-delete ranking equals a fresh build over the
  * survivors bit-for-bit). [[compact]] folds batch dirs into `batch=0`
  * with the family's committed-staging swap so planning stops growing
  * with trigger count, purging tombstoned postings physically.
  */
class TextIndexStore(path: String, numParts: Int = 64,
                     serveDeadBound: Long = TextIndexStore.DefaultServeDeadBound,
                     storePositions: Boolean = true)
    extends Serializable {

  /** Posting part-dirs planned by the last [[search]] — the
    * O(query terms) read contract made observable. */
  @transient @volatile var lastPlannedDirs: Seq[String] = Nil

  private def root = new Path(path)
  private def fsOf(spark: SparkSession) =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  private val baseFields = Seq(
    StructField("term", StringType), StructField("doc_id", LongType),
    StructField("tf", LongType), StructField("dl", LongType))
  private val posSchema = StructType(baseFields :+
    StructField("pos", ArrayType(LongType)))
  private val noPosSchema = StructType(baseFields)

  // ------------------------------------------------------- position mode

  private def posModePath = new Path(path, "_posmode")

  /** Whether THIS store's postings carry positions — the disk marker
    * (written by the first addBatch) is the truth for an existing
    * index; when the marker is ABSENT but batch dirs exist (an index
    * built before the marker existed), the mode is INFERRED from the
    * stored schema itself (a `pos` column in any batch ⇒ positional):
    * letting the constructor flag decide there would serve a positional
    * legacy index as position-free the day a deployment flips
    * GRAFT_TEXT_POSITIONS=0 — refusing phraseSearch despite positions
    * on disk, and worse, stamping `_posmode=0` at the next addBatch so
    * the next compact silently DROPS every stored position. The
    * constructor flag only seeds a truly empty index. Memoized: the
    * mode of an index never changes after its first batch. */
  @transient @volatile private var posModeCache: java.lang.Boolean = _
  private def positionsStored(spark: SparkSession): Boolean = {
    val c = posModeCache
    if (c != null) return c.booleanValue()
    val fs = fsOf(spark)
    val mode =
      if (fs.exists(posModePath)) {
        val in = fs.open(posModePath)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim == "1"
        finally in.close()
      } else batchDirs(spark) match {
        case Seq() => storePositions
        case dirs => // legacy index: the footer schema is the truth
          spark.read.parquet(dirs.head.toString)
            .schema.fieldNames.contains("pos")
      }
    posModeCache = java.lang.Boolean.valueOf(mode)
    mode
  }

  /** The stored posting schema: positional (default — [[phraseSearch]]
    * verifies adjacency inside the index) or position-FREE
    * (`storePositions = false`): positions are the bulk of a positional
    * index's bytes, and a BM25/sweep-only serving tier never reads them
    * — the Lucene `IndexOptions.DOCS_AND_FREQS` storage knob. The
    * BM25 ranking chain is byte-identical in either mode (spec-pinned);
    * only [[phraseSearch]] requires positions and fails fast without
    * them. */
  private def rowSchema(spark: SparkSession): StructType =
    if (positionsStored(spark)) posSchema else noPosSchema

  private def batchDirs(spark: SparkSession): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
  }

  private def markerPath(batchId: Long) = new Path(path, s"_applied/$batchId")

  /** One pass to postings with the doc length denormalized onto every
    * row. In positional mode `pos` carries the term's sorted 1-based
    * token positions (tf = |pos|) — what [[phraseSearch]] verifies
    * adjacency against without ever re-reading a document; in
    * position-free mode the column (and its collect_list shuffle
    * weight) is never built. */
  private def postingsOf(docs: DataFrame, textCol: String, idCol: String,
                         withPos: Boolean): DataFrame = {
    val exploded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("long"))
      .select(col("doc_id"), col("dl"),
        posexplode(col("ts")).as(Seq("p", "term")))
      .groupBy("doc_id", "term")
    if (withPos)
      exploded.agg(count(lit(1)).as("tf"), first("dl").as("dl"),
        sort_array(collect_list(col("p").cast("long") + 1)).as("pos"))
    else
      exploded.agg(count(lit(1)).as("tf"), first("dl").as("dl"))
  }

  /** Add a batch of NEW docs. Replay-safe: deletes + dynamically
    * overwrites this batch's own dirs and stats row; marker after
    * data. */
  def addBatch(spark: SparkSession, docs: DataFrame, batchId: Long,
               textCol: String = "text", idCol: String = "doc_id"): Unit = {
    healPurge(spark)
    val fs = fsOf(spark)
    // position mode is fixed at the FIRST batch: the disk state — the
    // marker, or for a pre-marker legacy index the stored schema
    // itself — is the truth thereafter; a handle opened with the other
    // flag fails fast instead of silently writing a mixed-schema index
    // (or, for a legacy index, stamping the wrong mode and letting the
    // next compact drop every stored position)
    val withPos = positionsStored(spark)
    require(withPos == storePositions,
      s"$path was built with storePositions=$withPos; " +
        s"this handle says $storePositions — position mode is fixed at " +
        "the first batch")
    if (!fs.exists(posModePath)) {
      val out = fs.create(posModePath, true)
      try out.write((if (withPos) "1" else "0")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      posModeCache = java.lang.Boolean.valueOf(withPos)
    }
    val post = postingsOf(docs, textCol, idCol, withPos).localCheckpoint(false)
    fs.delete(new Path(path, s"batch=$batchId"), true)
    post
      .select((baseFields.map(f => col(f.name)) ++
          (if (withPos) Seq(col("pos")) else Nil)) ++ Seq(
        lit(batchId).as("batch"),
        pmod(hash(col("term")), lit(numParts)).as("part")): _*)
      .repartition(numParts, col("part"))
      // term-sorted within each part file: parquet row-group min/max on
      // `term` then SKIPS the heavy lists of terms a serve read filters
      // out (the df-cap's physical teeth below dir-level pruning)
      .sortWithinPartitions("part", "term")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "part")
      .parquet(path)
    // per-batch (term, df) summary — vocabulary-sized, part-partitioned
    // like the postings, so a serve read prices each probe term (df-cap
    // decision) from O(probe parts) tiny rows WITHOUT opening a single
    // posting list; replay overwrites its own dir like everything else
    post.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("part", pmod(hash(col("term")), lit(numParts)))
      .repartition(numParts, col("part"))
      .write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(s"$path/_df/batch=$batchId")
    // per-batch (doc, length) table — what lets [[delete]] adjust the
    // corpus stats exactly without touching a posting; replay
    // overwrites its own dir like everything else
    val lens = docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(TextOps.tokens(col(textCol))).cast("long").as("dl"))
    lens.write.mode(SaveMode.Overwrite).parquet(s"$path/_lens/batch=$batchId")
    // per-batch additive stats — replay overwrites its own row
    val st = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tokens"))
      .first()
    import spark.implicits._
    Seq((st.getLong(0), Option(st.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)))
      .toDF("n_docs", "n_tokens")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/_stats/batch=$batchId")
    fs.create(markerPath(batchId), true).close()
  }

  // ------------------------------------------------------------ retraction

  private def tombDir = new Path(path, "_tombstones")

  /** Retract documents (the GDPR/curation delete): ids land in a
    * tombstone set consulted by every serve path — no rebuild, no
    * posting rewrite at delete time; [[compact]] purges them
    * physically. Corpus stats (N, avgdl) adjust EXACTLY through the
    * per-batch `_lens` table and df shrinks with the filtered
    * candidates, so a post-delete ranking equals a fresh build over the
    * surviving docs bit-for-bit (spec-asserted). */
  def delete(spark: SparkSession, ids: Seq[Long]): Unit = {
    if (ids.isEmpty) return
    healPurge(spark)
    val fs = fsOf(spark)
    fs.mkdirs(tombDir)
    val next = fs.listStatus(tombDir).length
    import spark.implicits._
    ids.toDF("doc_id").coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(new Path(tombDir, s"d$next").toString)
    deadCache = null
  }

  /** Distributed retraction: the id set never collects to the driver
    * on the WRITE path (a wide retraction — a whole source — lands as
    * a parquet tombstone dir straight from the cluster). The serve-time
    * dead set stays driver-bounded like every tombstone read; follow a
    * wide retraction with [[compact]] to purge it physically. */
  def delete(spark: SparkSession, ids: DataFrame): Unit = {
    healPurge(spark)
    val fs = fsOf(spark)
    fs.mkdirs(tombDir)
    val next = fs.listStatus(tombDir).length
    ids.select(col("doc_id").cast("long").as("doc_id"))
      .write.mode(SaveMode.Overwrite)
      .parquet(new Path(tombDir, s"d$next").toString)
    deadCache = null
  }

  /** Any of `ids` currently tombstoned — the corpus-sync's RESURRECTION
    * probe (a tombstoned id about to be re-added: the global dead set
    * would shadow the fresh postings until a [[compact]] purges it).
    * One ids-only join against the tombstone dirs, never a driver set
    * (as [[AnnIndexStore.anyTombstoned]]). */
  private[llmops] def anyTombstoned(spark: SparkSession,
                                    ids: DataFrame): Boolean =
    deadDf(spark).exists(_
      .join(ids.select(col(ids.columns.head).cast("long").as("doc_id")),
        Seq("doc_id"))
      .limit(1).count() > 0)

  /** Reclaim every per-batch artifact with id above `lo` — postings,
    * `_df`/`_lens`/`_stats` rows and the applied marker. A versioned
    * syncer's commit point is its OWN marker, written after the batch:
    * batch ids above the synced version can only be a crashed sync
    * attempt's writes, and they must not survive into a retry that
    * targets a LATER version (its adds would then double-index the
    * crashed batch's docs under a second id — stats and scores both
    * wrong). The same uncommitted-range-reclaim principle as the
    * release stores' [[StreamingCurate.reclaimBatchRange]]. */
  def reclaimBatchesAbove(spark: SparkSession, lo: Long): Int = {
    val fs = fsOf(spark)
    def sweep(parent: Path, prefix: String): Int =
      if (!fs.exists(parent)) 0
      else fs.listStatus(parent).toSeq
        .filter(_.getPath.getName.startsWith(prefix))
        .flatMap(s => scala.util.Try(
          s.getPath.getName.stripPrefix(prefix).toLong).toOption
          .map(id => (s.getPath, id)))
        .count { case (p, id) =>
          if (id > lo) { fs.delete(p, true); true } else false }
    sweep(root, "batch=") +
      sweep(new Path(path, "_df"), "batch=") +
      sweep(new Path(path, "_lens"), "batch=") +
      sweep(new Path(path, "_stats"), "batch=") +
      sweep(new Path(path, "_applied"), "")
  }

  /** The tombstones as a DataFrame (None when none exist) — what every
    * PURGE path ([[compact]], [[liveStats]]) joins against instead of
    * collecting a driver set: a whole-source retraction's dead set is
    * corpus-sized exactly when compact must clear it, and compact is
    * the one operation that must not OOM the driver then (the
    * [[AnnIndexStore.deadDf]] discipline). Rows are NOT deduped here;
    * consumers that need a set `.distinct()` it. */
  private def deadDf(spark: SparkSession): Option[DataFrame] = {
    val fs = fsOf(spark)
    if (!fs.exists(tombDir)) None
    else {
      val dirs = fs.listStatus(tombDir).toSeq.filter(_.isDirectory)
        .map(_.getPath.toString)
      if (dirs.isEmpty) None
      else Some(spark.read.parquet(dirs: _*).select("doc_id"))
    }
  }

  private def dropDeadDf(df: DataFrame,
                         dead: Option[DataFrame]): DataFrame =
    // re-select in the caller's column order: a USING-column join moves
    // the join key FIRST in its output — positional consumers downstream
    // must never see a reordered frame
    dead.fold(df)(d => df.join(d.distinct(), Seq("doc_id"), "left_anti")
      .select(df.columns.map(col).toSeq: _*))

  /** Memoized serve-time dead state: (distinct dead count, the id set
    * iff it fits under `serveDeadBound`). The count prices the df-cap
    * slack and decides the serve filter's shape — a bounded set rides
    * the driver and broadcasts (the cheap steady-state: retractions
    * between compacts are maintenance-bounded), while a WIDE pending
    * retraction serves by distributed anti-join until [[compact]]
    * clears it, never materializing on the driver. Mutations through
    * this instance invalidate the memo (single-writer discipline, as
    * [[AnnIndexStore]]). */
  @transient @volatile private var deadCache: (Long, Option[Set[Long]]) = _
  /** Observability for the spec: driver collects of the tombstone set
    * actually performed (only the bounded serve path ever does one). */
  @transient private[graft] var driverDeadLoads: Int = 0

  private def deadInfo(spark: SparkSession): (Long, Option[Set[Long]]) = {
    val cached = deadCache
    if (cached != null) cached
    else {
      val info = deadDf(spark) match {
        case None => (0L, Some(Set.empty[Long]))
        case Some(df) =>
          val d = df.distinct()
          val n = d.count()
          if (n <= serveDeadBound) {
            driverDeadLoads += 1
            (n, Some(d.collect().map(_.getLong(0)).toSet))
          } else (n, None)
      }
      deadCache = info
      info
    }
  }

  /** Distinct pending-tombstone count — the auto-compact trigger and
    * the `graft_index_tombstones` gauge read this; one memoized
    * metadata-sized job, never an id collect. */
  def tombstoneCount(spark: SparkSession): Long = deadInfo(spark)._1

  /** Serve-path tombstone filter: broadcast anti-join on the memoized
    * bounded set, or a distributed anti-join when the pending dead set
    * exceeds `serveDeadBound` (wide retraction awaiting compact). */
  private def dropDead(spark: SparkSession, df: DataFrame): DataFrame =
    deadInfo(spark) match {
      case (0L, _) => df
      case (_, Some(s)) =>
        import spark.implicits._
        df.join(broadcast(s.toSeq.toDF("doc_id")), Seq("doc_id"), "left_anti")
          .select(df.columns.map(col).toSeq: _*)
      case (_, None) => dropDeadDf(df, deadDf(spark))
    }

  /** (live N, live total tokens): the stored additive stats minus the
    * tombstoned docs' contribution from `_lens` — one join against the
    * tombstone dirs, driver-free at any retraction width (AQE
    * broadcasts the build side itself when it is small). */
  private def liveStats(spark: SparkSession,
                        dead: Option[DataFrame]): (Long, Long) = {
    val (n, tot) = stats(spark)
    val lensPath = new Path(path, "_lens")
    if (dead.isEmpty || !fsOf(spark).exists(lensPath)) (n, tot)
    else {
      val r = spark.read.option("basePath", s"$path/_lens")
        .parquet(lensPath.toString)
        .join(dead.get.distinct(), "doc_id")
        .agg(count(lit(1)).as("nd"), sum("dl").as("td")).first()
      (n - r.getLong(0),
        tot - Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }
  }

  /** Which of `ids` are LIVE in the index (present in any batch's
    * `_lens` doc table and not tombstoned) — the doc-fate membership
    * probe: one ids-filtered two-column scan of the doc-length table,
    * never a posting read. */
  def hasDocs(spark: SparkSession, ids: Seq[Long]): Set[Long] = {
    healPurge(spark)
    val lensPath = new Path(path, "_lens")
    if (ids.isEmpty || !fsOf(spark).exists(lensPath)) return Set.empty
    // tombstones excluded by anti-join BEFORE the collect: only the
    // (ids-bounded) live membership ever reaches the driver
    dropDeadDf(
      spark.read.option("basePath", s"$path/_lens").parquet(lensPath.toString)
        .select(col("doc_id")).filter(col("doc_id").isin(ids: _*))
        .distinct(),
      deadDf(spark))
      .collect().map(_.getLong(0)).toSet
  }

  /** Number of `batch=` dirs in the serve plan — the release verb's
    * auto-fold trigger reads this (one directory listing, no data). */
  def batchCount(spark: SparkSession): Int = batchDirs(spark).size

  /** (N docs, total tokens) over every batch — a #batches-row read. */
  def stats(spark: SparkSession): (Long, Long) = {
    val p = new Path(path, "_stats")
    if (!fsOf(spark).exists(p)) (0L, 0L)
    else {
      val r = spark.read.option("basePath", s"$path/_stats").parquet(p.toString)
        .agg(sum("n_docs"), sum("n_tokens")).first()
      (Option(r.get(0)).map(_.asInstanceOf[Long]).getOrElse(0L),
        Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }
  }

  /** (term, part) of each probe term — driver-bounded: query terms are
    * the probe's own words, never corpus data. */
  private def termParts(spark: SparkSession, terms: DataFrame)
      : Seq[(String, Int)] =
    terms.select(col("term"),
        pmod(hash(col("term")), lit(numParts)).as("p"))
      .distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toSeq

  /** The pruned posting read every serve path shares: only the probe
    * terms' `part=` dirs of each batch are listed/opened, and the
    * pushed `term IN (…)` predicate lets parquet row-group min/max on
    * the term-sorted files skip every other term's rows inside them. */
  private def prunedPostings(spark: SparkSession, tp: Seq[(String, Int)])
      : DataFrame = {
    val fs = fsOf(spark)
    val parts = tp.map(_._2).toSet
    val dirs = for {
      b <- batchDirs(spark)
      p <- parts.toSeq.sorted
      d = new Path(b, s"part=$p") if fs.exists(d)
    } yield d.toString
    lastPlannedDirs = dirs
    val schema = rowSchema(spark)
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
    else spark.read.schema(StructType(schema.fields ++ Seq(
        StructField("batch", LongType), StructField("part", IntegerType))))
      .option("basePath", path).parquet(dirs: _*)
      .filter(col("term").isin(tp.map(_._1): _*))
      .select(schema.fieldNames.map(col).toSeq: _*)
  }

  /** Stored df per probe term from the `_df` summaries — O(probe
    * parts) tiny reads, no posting list opened. Counts
    * not-yet-compacted tombstoned docs, so it is only an upper bound
    * on live df while deletes are pending — the serve paths subtract
    * the dead count as slack in that window (stored df − |dead| lower-
    * bounds live df, so a stale-high df can never skip a term whose
    * LIVE df is under the cap) and [[compact]] makes it exact again. */
  private def storedDf(spark: SparkSession, tp: Seq[(String, Int)])
      : Map[String, Long] = {
    val fs = fsOf(spark)
    val dfRoot = new Path(path, "_df")
    if (!fs.exists(dfRoot)) return Map.empty
    val batches = fs.listStatus(dfRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
    val parts = tp.map(_._2).toSet
    val dirs = for {
      b <- batches
      p <- parts.toSeq.sorted
      d = new Path(b, s"part=$p") if fs.exists(d)
    } yield d.toString
    if (dirs.isEmpty) Map.empty
    else spark.read
      .schema("term STRING, df BIGINT, batch BIGINT, part INT")
      .option("basePath", s"$path/_df").parquet(dirs: _*)
      .filter(col("term").isin(tp.map(_._1): _*))
      .groupBy("term").agg(sum("df").as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** BM25 top-k per query against the stored index. `queries` carries
    * (qid, term); only the query terms' `part=` dirs are read. The
    * ranking is bit-identical to [[Lexical.bm25TopK]] over the same
    * corpus (same `maxDfPermille`, no deletes pending).
    *
    * `maxDfPermille` < 1000 bounds the READ, not just the scoring: the
    * `_df` summary prices every probe term first (O(probe parts) tiny
    * rows), terms over the cap never reach the posting read — a
    * stopword in the query can never trigger a corpus-sized scan — and
    * the surviving terms' read skips the dropped terms' row groups via
    * the pushed IN predicate over term-sorted files. [[Lexical
    * .scoreBm25]] re-applies the cap on live df, so the ranking
    * semantics stay exact.
    *
    * While deletes are PENDING (tombstones present, [[compact]] not yet
    * run) the stored df is an upper bound that over-counts dead docs,
    * so a naive prefilter could skip a term whose LIVE df is under the
    * cap — a silent ranking divergence from the exact semantics. In
    * that window the prefilter subtracts the dead count as SLACK:
    * stored df − |dead| lower-bounds live df, so only terms provably
    * over the cap are skipped (scoreBm25's live-df cap keeps the
    * ranking exact for the rest) and the stopword guard never
    * disengages; compaction restores the slack-free pricing. */
  def search(spark: SparkSession, queries: DataFrame, k: Int,
             k1Milli: Long = 1200L, bMilli: Long = 750L,
             maxDfPermille: Long = 1000L): DataFrame = {
    healPurge(spark)
    val nDead = deadInfo(spark)._1
    val (n, tot) =
      liveStats(spark, if (nDead == 0L) None else deadDf(spark))
    val tp0 = termParts(spark, queries.select("term").distinct())
    val tp =
      if (maxDfPermille >= 1000L) tp0
      else {
        // stored df over-counts tombstoned docs — an UPPER bound on
        // live df while deletes are pending. Live df is in turn
        // ≥ stored df − |dead|, so dropping only terms over the cap by
        // MORE than the dead count stays exact (scoreBm25 re-applies
        // the live-df cap on the survivors) while keeping the stopword
        // guard ENGAGED in the pre-compact window: a blanket bypass
        // would let a single pending retraction re-admit every
        // stopword's posting read — and re-explode a corpus-sized
        // query set by queries × corpus. Compaction restores slack 0.
        val slack = nDead
        val dfs = storedDf(spark, tp0)
        tp0.filter { case (t, _) =>
          1000L * math.max(dfs.getOrElse(t, 0L) - slack, 0L) <=
            maxDfPermille * n }
      }
    val cand = dropDead(spark, prunedPostings(spark, tp))
    Lexical.scoreBm25(queries, cand.select("term", "doc_id", "tf"),
      cand.select("doc_id", "dl").distinct(), n, tot, k, k1Milli, bMilli,
      maxDfPermille)
  }

  /** CORPUS-SIZED batch retrieval — the lexical sibling of
    * [[AnnIndexStore.sweepDistributed]]. [[search]] is built for
    * bounded query batches: it collects the probe terms to the driver
    * to PRUNE the posting read to their part dirs. When the query set
    * is itself a corpus (every doc queries its own lead terms — RAG
    * eval, contamination sweeps, hybrid sweeps), that collect is the
    * scale limit, so this form keeps everything on the cluster: ONE
    * scan of the postings (term-joined against the distinct query
    * terms — shuffle joins, AQE-planned; no driver term list, no
    * broadcast of corpus-derived data) through the SAME integer scoring
    * chain ([[Lexical.scoreBm25]] with shuffle hints), ending in a
    * per-qid window top-k. Ranking is bit-identical to [[search]] over
    * the same queries (spec-pinned).
    *
    * The df-cap prices terms from the `_df` summary as a DISTRIBUTED
    * anti-join (over-cap terms leave the query set before the postings
    * join — a stopword shared by every query must never explode
    * queries × corpus); as in [[search]], pending deletes widen the
    * threshold by the dead count (stored df − |dead| lower-bounds live
    * df) so the guard stays engaged AND sound, and
    * [[Lexical.scoreBm25]]'s live-df cap keeps the ranking exact. */
  def searchDistributed(queries: DataFrame, k: Int,
                        k1Milli: Long = 1200L, bMilli: Long = 750L,
                        maxDfPermille: Long = 1000L): DataFrame = {
    val spark = queries.sparkSession
    healPurge(spark)
    val nDead = deadInfo(spark)._1
    val (n, tot) =
      liveStats(spark, if (nDead == 0L) None else deadDf(spark))
    val dirs = batchDirs(spark).map(_.toString)
    if (dirs.isEmpty) // empty frame, qid typed as the caller's
      return queries.select(col("qid")).limit(0)
        .withColumn("rank", lit(0))
        .withColumn("doc_id", lit(0L))
        .withColumn("score_micro", lit(0L))
    val fs = fsOf(spark)
    val dfRoot = new Path(path, "_df")
    val q =
      if (maxDfPermille >= 1000L || !fs.exists(dfRoot)) queries
      else {
        // slack-adjusted as in [[search]]: stored df − |dead| lower-
        // bounds live df, so the anti-join stays SOUND with tombstones
        // pending — critical here, where the query set is itself a
        // corpus and an un-dropped stopword multiplies the join by
        // queries × corpus
        val slack = nDead
        val overCap = spark.read
          .schema("term STRING, df BIGINT, batch BIGINT, part INT")
          .option("basePath", s"$path/_df").parquet(dfRoot.toString)
          .groupBy("term").agg(sum("df").as("df"))
          .filter(lit(1000L) * (col("df") - lit(slack)) >
            lit(maxDfPermille) * lit(n))
          .select("term")
        queries.join(overCap, Seq("term"), "left_anti")
      }
    // materialize the term-joined candidate postings ONCE: the scoring
    // chain consumes them in three branches (df aggregation, the main
    // score join, the lens projection) — without the bounded path's
    // broadcasts each branch would otherwise re-run the whole
    // postings ⋈ terms join tree
    val schema = rowSchema(spark)
    val cand = dropDead(spark, spark.read
      .schema(StructType(schema.fields ++ Seq(
        StructField("batch", LongType), StructField("part", IntegerType))))
      .option("basePath", path).parquet(dirs: _*)
      .select(schema.fieldNames.map(col).toSeq: _*))
      .join(q.select("term").distinct(), "term")
      .drop("pos")
      .localCheckpoint(false)
    Lexical.scoreBm25(q, cand.select("term", "doc_id", "tf"),
      cand.select("doc_id", "dl").distinct(), n, tot, k, k1Milli, bMilli,
      maxDfPermille, hint = identity)
  }

  /** Exact phrase search from the positional postings: docs containing
    * `phrase` as ADJACENT tokens, with the occurrence count — no
    * document is ever re-read, adjacency is verified inside the index.
    * Planning reads only the phrase terms' part dirs; candidates are
    * the docs carrying ALL phrase terms (an inner join chain over the
    * ≤|phrase| posting frames), and the position arrays decide
    * adjacency: an occurrence is a position p of word 0 with word i at
    * p+i for every slot. Returns (doc_id, n_occ), n_occ > 0. */
  def phraseSearch(spark: SparkSession, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phraseSearch: at least two words")
    import spark.implicits._
    // the single-phrase form IS the batch form with one qid — same
    // rarest-slot-first read bounds (a stopword slot contributes its
    // candidate-doc rows, never its corpus-sized pos-bearing posting
    // list), same slot-map adjacency fold; parity with the historical
    // per-slot join chain is spec-pinned (PhraseBatchSpec's loop arm)
    phraseSearchBatch(spark,
        phrase.zipWithIndex.map { case (w, i) => (0L, i, w) }
          .toDF("qid", "slot", "term"))
      .select("doc_id", "n_occ")
      .orderBy("doc_id")
  }

  // ------------------------------------------------------- selective purge

  private def purgeStage = new Path(root, "_purge_stage")
  private def purgeDone = new Path(purgeStage, "_graft_purge_done")

  /** (affected batches, untouched batches) of the last [[purge]] — the
    * selectivity contract made observable for specs and probes. */
  @transient @volatile var lastPurge: (Int, Int) = (0, 0)
  /** Test hook: simulate a crash immediately after the purge's commit
    * marker lands (staging complete, no swap performed) — the window
    * [[healPurge]] must roll forward from. */
  @transient private[graft] var crashAfterCommit = false

  /** SELECTIVE physical purge — the maintenance the 100 TB retraction
    * path actually wants. [[compact]] clears tombstones by rewriting
    * the WHOLE index (it also folds batch dirs — a different job);
    * but a retraction is usually LOCALIZED: a source leaves the
    * corpus, and that source arrived in specific ingest batches
    * (corpus-sync retractions are per-release batches by
    * construction). The per-batch `_lens` doc tables pinpoint exactly
    * which batches hold dead docs — ONE metadata-sized join — so this
    * purge rewrites ONLY those batches' postings/`_df`/`_lens`/
    * `_stats` and leaves every other batch's files byte-untouched
    * (spec-pinned: paths and mtimes identical). Lucene's
    * per-segment-delete discipline, mapped onto the batch-dir layout;
    * the reference's consumer likewise applies deletes as bounded
    * per-table statements, never a full-destination rewrite
    * (pg2any-lib/src/destinations/coalescing.rs:1045-1076).
    *
    * Driver-free like [[compact]]: the dead set stays a DataFrame
    * end-to-end (anti-joins); only the affected BATCH IDS collect —
    * O(#batches) rows, metadata. Crash-safe: all staged writes land
    * under `_purge_stage`, a commit marker records the affected
    * batches and staged subdirs, the swap rolls FORWARD from the
    * marker ([[healPurge]], also invoked from every serve entry at
    * one `exists` probe), and tombstones clear only after the last
    * swap — in every intermediate window the serve-time tombstone
    * filter plus `_lens`-exact [[liveStats]] keep rankings identical
    * to a fresh build over the survivors. A batch whose docs ALL died
    * is removed outright (no empty dirs). Offline discipline like
    * [[compact]]: no concurrent addBatch/purge.
    *
    * Returns (affected, untouched) batch counts. */
  def purge(spark: SparkSession): (Int, Int) = {
    healPurge(spark)
    val fs = fsOf(spark)
    val batches = batchDirs(spark)
      .map(_.getName.stripPrefix("batch=").toLong).sorted
    val dead = deadDf(spark).map(_.distinct().localCheckpoint(false))
    if (dead.isEmpty || batches.isEmpty) {
      lastPurge = (0, batches.size); return lastPurge
    }
    val lensRoot = new Path(path, "_lens")
    // WHICH batches hold dead docs: one join against the per-batch doc
    // tables — the collected result is batch IDS (≤ #batches rows),
    // never doc ids
    val affected: Seq[Long] =
      if (!fs.exists(lensRoot)) batches
      else spark.read.option("basePath", s"$path/_lens")
        .parquet(lensRoot.toString)
        .join(dead.get, "doc_id")
        // partition discovery types the batch dir value as INT
        .select(col("batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
    if (affected.isEmpty) {
      // tombstoned ids not in the index (already purged / never added):
      // nothing to rewrite, the tombstones are spent
      fs.delete(tombDir, true)
      deadCache = null
      lastPurge = (0, batches.size)
      return lastPurge
    }
    val stage = purgeStage
    if (fs.exists(stage)) fs.delete(stage, true)
    val fullSchema = StructType(rowSchema(spark).fields ++ Seq(
      StructField("batch", LongType), StructField("part", IntegerType)))
    // 1) purged postings for the affected batches only — an all-dead
    //    batch simply produces no staged dir
    val postDirs = affected.map(b => new Path(root, s"batch=$b"))
      .filter(fs.exists(_)).map(_.toString)
    if (postDirs.nonEmpty)
      dropDeadDf(spark.read.schema(fullSchema)
          .option("basePath", path).parquet(postDirs: _*), dead)
        .repartition(col("batch"), col("part"))
        .sortWithinPartitions("batch", "part", "term")
        .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
        .parquet(stage.toString)
    // 2) their df summaries, recomputed from the staged postings (so
    //    the serve-time cap pricing is exact again for these batches)
    val stagedPost = affected.map(b => new Path(stage, s"batch=$b"))
      .filter(fs.exists(_)).map(_.toString)
    if (stagedPost.nonEmpty)
      spark.read.schema(fullSchema).option("basePath", stage.toString)
        .parquet(stagedPost: _*)
        .groupBy("batch", "part", "term").agg(count(lit(1)).as("df"))
        .select(col("term"), col("df"), col("batch"), col("part"))
        // re-key on the write partitions: the groupBy leaves each
        // shuffle partition holding terms of EVERY (batch, part), so a
        // bare partitionBy write would spray ~#shuffle-partitions small
        // files into every part dir — breaking addBatch's
        // one-file-per-part discipline that storedDf's pruned reads rely
        // on (hash on the composite key lands each dir in one task)
        .repartition(col("batch"), col("part"))
        .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
        .parquet(s"$stage/_df")
    // 3) purged doc tables + exact per-batch stats over the survivors
    val lensDirs = affected.map(b => new Path(lensRoot, s"batch=$b"))
      .filter(fs.exists(_)).map(_.toString)
    if (lensDirs.nonEmpty) {
      val liveLens = dropDeadDf(
        spark.read.option("basePath", s"$path/_lens").parquet(lensDirs: _*)
          .select("doc_id", "dl", "batch"), dead)
        .localCheckpoint(false)
      liveLens.write.mode(SaveMode.Overwrite).partitionBy("batch")
        .parquet(s"$stage/_lens")
      liveLens.groupBy("batch")
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tokens"))
        .select(col("n_docs"), col("n_tokens"), col("batch"))
        .write.mode(SaveMode.Overwrite).partitionBy("batch")
        .parquet(s"$stage/_stats")
    }
    // 4) commit: the marker records the affected batches AND which
    //    subdirs were staged — the swap (and any post-crash heal) is a
    //    pure function of this manifest, so it rolls forward
    //    idempotently: staged → promote, affected-but-unstaged
    //    (all-dead) → delete
    commitSwapMarker(spark, affected, clearTombs = true)
    lastPurge = (affected.size, batches.size - affected.size)
    if (crashAfterCommit) return lastPurge // test hook: die pre-swap
    finishPurgeSwap(spark)
    lastPurge
  }

  /** Write the staged-swap commit marker: whether the swap retires the
    * tombstones (purge: yes — the dead are physically gone everywhere;
    * fold: no — unfolded batches may still hold dead docs), the
    * affected batch ids, and which of their subdirs were staged.
    *
    * ATOMIC: the manifest lands at a temp path and RENAMES into place —
    * the rename is the commit point. The marker's existence means
    * "committed", so a torn write must be impossible: a crash mid-write
    * of a direct create would leave a 0-byte marker (every serve's
    * healPurge then throws parsing it — store unserveable) or a
    * truncated affected-id ("12" torn to "1") that the roll-forward
    * would act on by deleting a LIVE batch dir as affected-but-unstaged.
    * The `#end` terminator guards the read side independently:
    * [[finishPurgeSwap]] treats a manifest without it as uncommitted
    * staging and discards it, never rolls it forward. */
  private def commitSwapMarker(spark: SparkSession, affected: Seq[Long],
                               clearTombs: Boolean): Unit = {
    val fs = fsOf(spark)
    val staged = purgeSubs(affected)
      .filter(s => fs.exists(new Path(purgeStage, s)))
    val lines = Seq(if (clearTombs) "clear" else "keep",
      affected.mkString(",")) ++ staged :+ "#end"
    val tmp = new Path(purgeStage, "_graft_purge_done.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(purgeDone)) fs.delete(purgeDone, false)
    require(fs.rename(tmp, purgeDone),
      s"purge commit rename failed: $tmp -> $purgeDone")
  }

  /** (folded batches, kept batches) of the last [[fold]]. */
  @transient @volatile var lastFold: (Int, Int) = (0, 0)

  /** TIERED batch fold — the LSM answer to batch-count growth. The
    * release sync appends ONE batch per version, so a year of nightly
    * releases leaves hundreds of `batch=` dirs in every serve plan;
    * [[compact]]'s remedy rewrites the WHOLE index. This fold merges
    * only the SMALLEST batches (sizes from directory metadata, zero
    * data reads) into one batch dir until at most `keepBatches`
    * remain, leaving every large batch's files byte-untouched — the
    * rewrite cost is the folded bytes, which a small-batches-first
    * policy keeps near the minimum possible. The merged dir takes the
    * LARGEST folded id, so the crashed-sync invariant (`batch id >
    * synced version ⟺ uncommitted attempt`,
    * [[reclaimBatchesAbove]]) survives folding.
    *
    * Pending tombstones are NOT cleared (unfolded batches may still
    * hold dead docs) — but the folded subset is purged in passing
    * (anti-join; its `_df`/`_lens`/`_stats` rebuilt live-exact), which
    * only tightens the serve-time df-cap slack. Same committed-staging
    * manifest + roll-forward heal as [[purge]]; offline discipline as
    * [[compact]]. Returns (folded, kept) batch counts. */
  def fold(spark: SparkSession, keepBatches: Int): (Int, Int) = {
    require(keepBatches >= 1, s"keepBatches must be >= 1: $keepBatches")
    healPurge(spark)
    val fs = fsOf(spark)
    val dirs = batchDirs(spark)
    if (dirs.size <= keepBatches) {
      lastFold = (0, dirs.size); return lastFold
    }
    val sized = dirs.map(p =>
      (p.getName.stripPrefix("batch=").toLong,
        fs.getContentSummary(p).getLength))
    // fold the smallest (size - keep + 1) batches into ONE
    val folded = sized.sortBy { case (id, len) => (len, id) }
      .take(sized.size - keepBatches + 1).map(_._1).sorted
    val target = folded.max
    val dead = deadDf(spark).map(_.distinct().localCheckpoint(false))
    val stage = purgeStage
    if (fs.exists(stage)) fs.delete(stage, true)
    val fullSchema = StructType(rowSchema(spark).fields ++ Seq(
      StructField("batch", LongType), StructField("part", IntegerType)))
    // merged postings under the target id — tombstoned docs of the
    // folded subset drop in passing (their stats rebuild below)
    val postDirs = folded.map(b => new Path(root, s"batch=$b"))
      .filter(fs.exists(_)).map(_.toString)
    if (postDirs.nonEmpty)
      dropDeadDf(spark.read.schema(fullSchema)
          .option("basePath", path).parquet(postDirs: _*), dead)
        .select(rowSchema(spark).fieldNames.map(col) ++ Seq(
          lit(target).as("batch"),
          pmod(hash(col("term")), lit(numParts)).as("part")): _*)
        .repartition(numParts, col("part"))
        .sortWithinPartitions("part", "term")
        .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
        .parquet(stage.toString)
    val stagedTarget = new Path(stage, s"batch=$target")
    if (fs.exists(stagedTarget))
      spark.read.schema(fullSchema).option("basePath", stage.toString)
        .parquet(stagedTarget.toString)
        .groupBy("batch", "part", "term").agg(count(lit(1)).as("df"))
        .select(col("term"), col("df"), col("batch"), col("part"))
        // one file per part dir, as in [[purge]]'s df rebuild
        .repartition(col("batch"), col("part"))
        .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
        .parquet(s"$stage/_df")
    val lensDirs = folded.map(b => new Path(path, s"_lens/batch=$b"))
      .filter(fs.exists(_)).map(_.toString)
    if (lensDirs.nonEmpty) {
      val liveLens = dropDeadDf(
        spark.read.option("basePath", s"$path/_lens").parquet(lensDirs: _*)
          .select("doc_id", "dl"), dead)
        .withColumn("batch", lit(target))
        .localCheckpoint(false)
      liveLens.write.mode(SaveMode.Overwrite).partitionBy("batch")
        .parquet(s"$stage/_lens")
      liveLens.groupBy("batch")
        .agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tokens"))
        .select(col("n_docs"), col("n_tokens"), col("batch"))
        .write.mode(SaveMode.Overwrite).partitionBy("batch")
        .parquet(s"$stage/_stats")
    }
    commitSwapMarker(spark, folded, clearTombs = false)
    lastFold = (folded.size, sized.size - folded.size)
    if (crashAfterCommit) return lastFold // test hook: die pre-swap
    finishPurgeSwap(spark)
    lastFold
  }

  private def purgeSubs(affected: Seq[Long]): Seq[String] =
    affected.flatMap(b => Seq(
      s"batch=$b", s"_df/batch=$b", s"_lens/batch=$b", s"_stats/batch=$b"))

  /** Complete a COMMITTED staged swap ([[purge]] or [[fold]]) from its
    * marker manifest — idempotent roll-forward: a staged subdir still
    * present is promoted (delete target, rename staged in), one
    * already renamed away is done, an affected-but-never-staged subdir
    * (its batch died entirely, or was folded into another id) has its
    * target removed. Tombstones clear LAST and only when the marker
    * says so (purge: the dead are physically gone everywhere; fold:
    * unfolded batches may still hold dead docs): until then every
    * serve filters the dead set, so any crash window serves exactly. */
  private def finishPurgeSwap(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    val stage = purgeStage
    val in = fs.open(purgeDone)
    val lines =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").toSeq
      finally in.close()
    // manifest validation: only a complete, terminator-carrying,
    // parseable manifest is a commit. Anything else (a 0-byte or torn
    // marker from a legacy non-atomic writer, a corrupted file) is
    // treated as UNCOMMITTED staging and discarded — tombstones are
    // still in place, so serving never depended on this swap; rolling
    // a torn manifest forward could instead delete live batch dirs.
    val affectedOpt =
      if (lines.size < 3 || lines.last != "#end" ||
          !Set("clear", "keep")(lines.head)) None
      else scala.util.Try(
        lines(1).split(",").filter(_.nonEmpty).map(_.toLong).toSeq).toOption
    if (affectedOpt.isEmpty) { fs.delete(stage, true); return }
    val clearTombs = lines.head == "clear"
    val affected = affectedOpt.get
    val staged = lines.drop(2).dropRight(1).filter(_.nonEmpty).toSet
    purgeSubs(affected).foreach { sub =>
      val tgt = new Path(path, sub)
      val src = new Path(stage, sub)
      if (staged(sub)) {
        if (fs.exists(src)) { // not yet promoted
          if (fs.exists(tgt)) fs.delete(tgt, true)
          fs.mkdirs(tgt.getParent)
          fs.rename(src, tgt)
        } // else: promoted by a previous (crashed) pass — done
      } else if (fs.exists(tgt)) fs.delete(tgt, true) // dead or folded away
    }
    if (clearTombs) fs.delete(tombDir, true)
    fs.delete(stage, true)
    deadCache = null
  }

  /** Heal an interrupted [[purge]]: committed staging (marker present)
    * rolls forward, uncommitted staging is discarded (tombstones are
    * still in place — serving never needed the purge for correctness).
    * One `exists` probe when idle; called from every serve entry. */
  private def healPurge(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    if (!fs.exists(purgeStage)) return
    if (fs.exists(purgeDone)) finishPurgeSwap(spark)
    else fs.delete(purgeStage, true)
  }

  /** BATCHED exact phrase retrieval — many phrases against the index in
    * ONE plan (the phrase analog of the ANN store's batch forms).
    * `phrases` carries (qid, slot, term): one row per phrase word,
    * `slot` its 0-based position, one phrase per qid, length ≥ 1.
    * Planning reads only the phrase vocabulary's part dirs (the
    * vocabulary is driver-bounded probe data, as in [[search]]); the
    * per-(qid, doc) adjacency check folds each candidate's ≤|phrase|
    * position arrays into a slot map and counts the word-0 positions
    * whose successors land in every later slot's array — the same
    * verification as [[phraseSearch]], vectorized across phrases, with
    * candidates bounded by docs carrying ALL the phrase's words.
    * Returns (qid, doc_id, n_occ), n_occ > 0. */
  def phraseSearchBatch(spark: SparkSession, phrases: DataFrame): DataFrame = {
    healPurge(spark)
    require(positionsStored(spark),
      s"$path was built with storePositions=false — phrase search needs " +
        "positional postings; rebuild the index with storePositions=true")
    import spark.implicits._
    val ph = phrases.select(col("qid"), col("slot").cast("int").as("slot"),
        col("term").cast("string").as("term"))
      .localCheckpoint(false) // consumed by the slot count AND the join
    // no df-cap, as in phraseSearch: a stopword inside a phrase is a
    // REQUIRED positional slot — but the READ/shuffle volume is bounded
    // rarest-slot-first below, so the stopword's corpus-sized posting
    // list never rides a shuffle with its position arrays
    val tp = termParts(spark, ph.select("term").distinct())
    val pruned = prunedPostings(spark, tp)
    phraseRarestFirst(spark, ph,
      postIds = dropDead(spark, pruned.select("term", "doc_id")),
      postPos = pruned.select("term", "doc_id", "pos"),
      dfPrice = storedDf(spark, tp).toSeq.toDF("term", "df"))
  }

  /** CORPUS-SIZED batched phrase retrieval — the phrase sibling of
    * [[searchDistributed]]: when the phrase set is itself a corpus
    * (every doc probing its own n-grams — contamination sweeps, exact
    * span audits), [[phraseSearchBatch]]'s driver-collected term
    * pruning is the scale limit, so this form keeps everything on the
    * cluster: ONE scan of the positional postings term-joined against
    * the distinct phrase words (shuffle joins, no driver term list —
    * row-group term min/max still skips inside files), then the SAME
    * per-(qid, doc) slot-map adjacency fold. Results are identical to
    * [[phraseSearchBatch]] over the same phrases (spec-pinned). */
  def phraseSearchDistributed(phrases: DataFrame): DataFrame = {
    val spark = phrases.sparkSession
    healPurge(spark)
    require(positionsStored(spark),
      s"$path was built with storePositions=false — phrase search needs " +
        "positional postings; rebuild the index with storePositions=true")
    val ph = phrases.select(col("qid"), col("slot").cast("int").as("slot"),
        col("term").cast("string").as("term"))
      .localCheckpoint(false)
    val dirs = batchDirs(spark).map(_.toString)
    if (dirs.isEmpty)
      return ph.select(col("qid")).limit(0)
        .withColumn("doc_id", lit(0L)).withColumn("n_occ", lit(0L))
    val schema = rowSchema(spark)
    val full = spark.read
      .schema(StructType(schema.fields ++ Seq(
        StructField("batch", LongType), StructField("part", IntegerType))))
      .option("basePath", path).parquet(dirs: _*)
    // ids restricted to the phrase vocabulary by a SHUFFLE join (no
    // driver term list — the contract of this form); the position
    // column is read only by the survivor fetch inside the shared tail
    val postIds = dropDead(spark, full.select("term", "doc_id"))
      .join(ph.select("term").distinct(), "term")
    phraseRarestFirst(spark, ph,
      postIds = postIds,
      postPos = full.select("term", "doc_id", "pos"),
      dfPrice = dfSummaryAll(spark))
  }

  /** Per-term stored df over ALL batches as a DataFrame — the
    * distributed (vocabulary-sized, never collected) sibling of
    * [[storedDf]], for the corpus-sized phrase form's slot pricing. */
  private def dfSummaryAll(spark: SparkSession): DataFrame = {
    val dfRoot = new Path(path, "_df")
    if (!fsOf(spark).exists(dfRoot))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("term", StringType),
          StructField("df", LongType))))
    else spark.read
      .schema("term STRING, df BIGINT, batch BIGINT, part INT")
      .option("basePath", s"$path/_df").parquet(dfRoot.toString)
      .groupBy("term").agg(sum("df").as("df"))
  }

  /** The shared RAREST-SLOT-FIRST tail of both batched phrase forms —
    * Lucene's df-ordered conjunction mapped onto the batch layout.
    * Phrases are df-cap-exempt by design (a stopword inside a phrase is
    * a REQUIRED positional slot), so a naive plan that joins every
    * slot's full posting list WITH its position arrays before the
    * adjacency fold shuffles Σ_phrase Σ_slot df(term) pos-array rows —
    * the one serving shape whose worst case was not locality-bounded at
    * 100×. Instead:
    *
    *   1. price each phrase's slots from the `_df` summary (stored df:
    *      an upper bound while deletes are pending — a pure ordering
    *      HEURISTIC, any order is correct);
    *   2. candidates = ids-only postings of each phrase's RAREST slot —
    *      Σ_phrase min_slot df rows, no `pos` read or moved;
    *   3. verify the remaining slots by ids only, with the posting read
    *      restricted to the candidate docs map-side (broadcast when the
    *      candidate set is bounded): a stopword slot contributes its
    *      candidate-doc rows, never its corpus df;
    *   4. fetch position arrays ONLY for the surviving (qid, doc) pairs
    *      and run the slot-map adjacency fold on them.
    *
    * The broadcast/shuffle choice is decided by ONE count of the
    * candidate set ([[TextIndexStore.PhraseBroadcastBound]]); above the
    * bound every restriction stays a distributed join — same results,
    * spec-pinned. */
  private def phraseRarestFirst(spark: SparkSession, ph: DataFrame,
                                postIds: DataFrame, postPos: DataFrame,
                                dfPrice: DataFrame): DataFrame = {
    val nSlots = ph.groupBy("qid")
      .agg((max("slot") + 1).cast("int").as("n"))
    val ranked = ph.join(dfPrice, Seq("term"), "left")
      .na.fill(0L, Seq("df")) // a term absent from the index: df 0 —
                              // its (empty) slot is the cheapest anchor
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(col("df"), col("slot"))))
      .localCheckpoint(false)
    val cand = postIds
      .join(ranked.filter(col("rnk") === 1).select("qid", "term"), "term")
      .select("qid", "doc_id")
      .localCheckpoint(false)
    val b: DataFrame => DataFrame =
      if (cand.count() <= TextIndexStore.PhraseBroadcastBound) broadcast
      else identity
    val rest = ranked.filter(col("rnk") > 1).select("qid", "slot", "term")
    val found = postIds.join(b(cand.select("doc_id").distinct()), "doc_id")
      .join(rest, "term")
      .join(b(cand), Seq("qid", "doc_id"), "left_semi")
      .groupBy("qid", "doc_id").agg(countDistinct("slot").as("f"))
    val survivors = cand.join(nSlots, "qid")
      .join(found, Seq("qid", "doc_id"), "left")
      .filter(coalesce(col("f"), lit(0L)) === col("n").cast("long") - 1L)
      .select("qid", "doc_id")
      .localCheckpoint(false)
    postPos.join(b(survivors.select("doc_id").distinct()), "doc_id")
      .join(ph, "term")
      .join(b(survivors), Seq("qid", "doc_id"), "left_semi")
      .groupBy("qid", "doc_id")
      .agg(map_from_entries(collect_list(struct(col("slot"), col("pos"))))
        .as("m"))
      .join(nSlots, "qid")
      // belt-and-braces: survivors carry all slots by construction
      .filter(size(map_keys(col("m"))) === col("n"))
      .withColumn("n_occ",
        // single-word phrase: the occurrence count is just tf (|pos|);
        // the general form's sequence(1, n-1) would run BACKWARDS at
        // n = 1 and probe a slot that does not exist
        when(col("n") === 1,
          expr("CAST(size(element_at(m, 0)) AS BIGINT)"))
        .otherwise(expr(
          """CAST(size(filter(element_at(m, 0), p ->
            |  forall(sequence(1L, CAST(n AS BIGINT) - 1L), i ->
            |    array_contains(element_at(m, CAST(i AS INT)), p + i))))
            |AS BIGINT)""".stripMargin)))
      .filter(col("n_occ") > 0)
      .select("qid", "doc_id", "n_occ")
  }

  /** Offline maintenance: fold all batch dirs into `batch=0` (planning
    * stops growing with trigger count). Committed-staging swap; an
    * interrupted swap rolls forward on the next call. Run with no
    * concurrent addBatch. For a purge-only maintenance pass prefer
    * [[purge]] — it rewrites only the batches that hold dead docs. */
  def compact(spark: SparkSession): Unit = {
    healPurge(spark)
    val fs = fsOf(spark)
    val staging = new Path(root.getParent, root.getName + "._text_compact")
    val done = new Path(staging, "_graft_compact_done")
    if (fs.exists(staging) && fs.exists(done)) { // crashed mid-swap
      if (fs.exists(root)) fs.delete(root, true)
      fs.rename(staging, root)
      return
    }
    if (batchDirs(spark).isEmpty) return
    if (fs.exists(staging)) fs.delete(staging, true)
    // tombstoned docs are PURGED here: postings and lens rows dropped,
    // stats recomputed from the surviving lens table, tombstones gone.
    // The dead set stays a DataFrame end-to-end — anti-joins, never a
    // driver collect: a whole-source retraction's compact is exactly
    // when this set is corpus-sized, and compact is the one operation
    // that must clear it (the AnnIndexStore.deadDf discipline)
    val dead = deadDf(spark).map(_.distinct().localCheckpoint(false))
    val schema = rowSchema(spark)
    val folded = dropDeadDf(
      spark.read.schema(StructType(schema.fields ++ Seq(
          StructField("batch", LongType), StructField("part", IntegerType))))
        .option("basePath", path).parquet(path), dead)
      .select(schema.fieldNames.map(col) ++ Seq(
        lit(0L).as("batch"),
        pmod(hash(col("term")), lit(numParts)).as("part")): _*)
      .repartition(numParts, col("part"))
      .sortWithinPartitions("part", "term")
      .localCheckpoint(false)
    folded
      .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
      .parquet(staging.toString)
    // folded df summary: tombstone-purged, so the serve-time cap
    // decision is exact again after every compact
    folded.groupBy("term", "part").agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"), col("part"))
      .repartition(numParts, col("part"))
      .write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(s"$staging/_df/batch=0")
    val lensPath = new Path(path, "_lens")
    val liveLens =
      if (fs.exists(lensPath))
        dropDeadDf(spark.read.option("basePath", s"$path/_lens")
          .parquet(lensPath.toString).select("doc_id", "dl"), dead)
          .localCheckpoint(true)
      else null
    import spark.implicits._
    if (liveLens != null) {
      liveLens.write.mode(SaveMode.Overwrite).parquet(s"$staging/_lens/batch=0")
      val st = liveLens.agg(count(lit(1)).as("n"), sum("dl").as("t")).first()
      Seq((st.getLong(0),
          Option(st.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L)))
        .toDF("n_docs", "n_tokens")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/_stats/batch=0")
    } else {
      val (n, tot) = liveStats(spark, dead)
      Seq((n, tot)).toDF("n_docs", "n_tokens")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/_stats/batch=0")
    }
    val applied = new Path(path, "_applied")
    if (fs.exists(applied))
      org.apache.hadoop.fs.FileUtil.copy(fs, applied, fs,
        new Path(staging, "_applied"), false,
        spark.sessionState.newHadoopConf())
    // the CorpusIndexSync version marker must survive the swap — a
    // compact that dropped it would force the next sync into a full
    // rebuild (syncedVersion None), silently re-paying the corpus
    val marker = new Path(path, "_corpus_version")
    if (fs.exists(marker))
      org.apache.hadoop.fs.FileUtil.copy(fs, marker, fs,
        new Path(staging, "_corpus_version"), false,
        spark.sessionState.newHadoopConf())
    // the position-mode marker likewise: losing it would let a handle
    // with the other flag silently mix schemas after the compact
    if (fs.exists(posModePath))
      org.apache.hadoop.fs.FileUtil.copy(fs, posModePath, fs,
        new Path(staging, "_posmode"), false,
        spark.sessionState.newHadoopConf())
    fs.create(done, true).close()
    fs.delete(root, true)
    fs.rename(staging, root)
    deadCache = null // tombstones purged with the swap
  }
}

object TextIndexStore {
  /** Serve-path dead-set bound: at or under this many pending
    * tombstones the serve filter memoizes a driver id set and
    * broadcasts it (retractions between compacts are bounded by the
    * same maintenance cadence that bounds append file counts); above
    * it — a wide retraction awaiting its compact — every serve
    * anti-joins the tombstone dirs distributed instead, so no
    * retraction width can ever materialize on the driver. */
  val DefaultServeDeadBound = 1000000L

  /** Default serve-plan batch-dir bound for the release verb's
    * AUTO-fold (GRAFT_TEXT_FOLD_BATCHES overrides, =0 opts out): each
    * release sync appends one batch dir, and without a default a year
    * of nightly releases on default config leaves ~365 dirs in every
    * serve plan. 32 keeps planning flat while the smallest-first fold
    * policy keeps the rewrite cost near minimum. */
  val DefaultFoldBatches = 32

  /** Phrase candidate sets at or under this many (qid, doc) rows ride
    * the rarest-slot-first plan as BROADCASTS (the remaining-slot and
    * position fetches then filter map-side — zero corpus-volume
    * shuffles); above it every restriction stays a distributed join —
    * identical results, spec-pinned. ~16 bytes/row: the ceiling is a
    * ~16 MB broadcast, comfortably under executor budgets. */
  val PhraseBroadcastBound = 1000000L
}
