package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
class TextIndexStore(path: String, numParts: Int = 64) extends Serializable {

  /** Posting part-dirs planned by the last [[search]] — the
    * O(query terms) read contract made observable. */
  @transient @volatile var lastPlannedDirs: Seq[String] = Nil

  private def root = new Path(path)
  private def fsOf(spark: SparkSession) =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  private val rowSchema = StructType(Seq(
    StructField("term", StringType), StructField("doc_id", LongType),
    StructField("tf", LongType), StructField("dl", LongType),
    StructField("pos", ArrayType(LongType))))

  private def batchDirs(spark: SparkSession): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
  }

  private def markerPath(batchId: Long) = new Path(path, s"_applied/$batchId")

  /** One pass to POSITIONAL postings with the doc length denormalized
    * onto every row: `pos` carries the term's sorted 1-based token
    * positions (tf = |pos|) — what [[phraseSearch]] verifies adjacency
    * against without ever re-reading a document. */
  private def postingsOf(docs: DataFrame, textCol: String, idCol: String)
      : DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextOps.tokens(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("long"))
      .select(col("doc_id"), col("dl"),
        posexplode(col("ts")).as(Seq("p", "term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), first("dl").as("dl"),
        sort_array(collect_list(col("p").cast("long") + 1)).as("pos"))

  /** Add a batch of NEW docs. Replay-safe: deletes + dynamically
    * overwrites this batch's own dirs and stats row; marker after
    * data. */
  def addBatch(spark: SparkSession, docs: DataFrame, batchId: Long,
               textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val fs = fsOf(spark)
    val post = postingsOf(docs, textCol, idCol)
    fs.delete(new Path(path, s"batch=$batchId"), true)
    post
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("pos"),
        lit(batchId).as("batch"), pmod(hash(col("term")), lit(numParts)).as("part"))
      .repartition(numParts, col("part"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "part")
      .parquet(path)
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
    val fs = fsOf(spark)
    fs.mkdirs(tombDir)
    val next = fs.listStatus(tombDir).length
    import spark.implicits._
    ids.toDF("doc_id").coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(new Path(tombDir, s"d$next").toString)
  }

  /** The dead set — driver-bounded (deletes are retractions, not a
    * corpus); empty when no tombstones exist. */
  private def tombstoned(spark: SparkSession): Set[Long] = {
    val fs = fsOf(spark)
    if (!fs.exists(tombDir)) Set.empty
    else {
      val dirs = fs.listStatus(tombDir).toSeq.filter(_.isDirectory)
        .map(_.getPath.toString)
      if (dirs.isEmpty) Set.empty
      else spark.read.parquet(dirs: _*).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    }
  }

  private def dropDead(spark: SparkSession, df: DataFrame,
                       dead: Set[Long]): DataFrame =
    if (dead.isEmpty) df
    else {
      import spark.implicits._
      df.join(broadcast(dead.toSeq.toDF("doc_id")), Seq("doc_id"), "left_anti")
    }

  /** (live N, live total tokens): the stored additive stats minus the
    * tombstoned docs' contribution from `_lens`. */
  private def liveStats(spark: SparkSession, dead: Set[Long]): (Long, Long) = {
    val (n, tot) = stats(spark)
    val lensPath = new Path(path, "_lens")
    if (dead.isEmpty || !fsOf(spark).exists(lensPath)) (n, tot)
    else {
      import spark.implicits._
      val r = spark.read.option("basePath", s"$path/_lens")
        .parquet(lensPath.toString)
        .join(broadcast(dead.toSeq.toDF("doc_id")), "doc_id")
        .agg(count(lit(1)).as("nd"), sum("dl").as("td")).first()
      (n - r.getLong(0),
        tot - Option(r.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }
  }

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

  /** The pruned posting read every serve path shares: only the probe
    * terms' `part=` dirs of each batch are listed/opened. */
  private def prunedPostings(spark: SparkSession, terms: DataFrame)
      : DataFrame = {
    val fs = fsOf(spark)
    // driver-bounded: query terms are the probe's own words
    val parts = terms
      .select(pmod(hash(col("term")), lit(numParts)).as("p"))
      .distinct().collect().map(_.getInt(0)).toSet
    val dirs = for {
      b <- batchDirs(spark)
      p <- parts.toSeq.sorted
      d = new Path(b, s"part=$p") if fs.exists(d)
    } yield d.toString
    lastPlannedDirs = dirs
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        rowSchema)
    else spark.read.schema(StructType(rowSchema.fields ++ Seq(
        StructField("batch", LongType), StructField("part", IntegerType))))
      .option("basePath", path).parquet(dirs: _*)
      .select(rowSchema.fieldNames.map(col).toSeq: _*)
  }

  /** BM25 top-k per query against the stored index. `queries` carries
    * (qid, term); only the query terms' `part=` dirs are read. The
    * ranking is bit-identical to [[Lexical.bm25TopK]] over the same
    * corpus. */
  def search(spark: SparkSession, queries: DataFrame, k: Int,
             k1Milli: Long = 1200L, bMilli: Long = 750L): DataFrame = {
    val dead = tombstoned(spark)
    val (n, tot) = liveStats(spark, dead)
    val cand = dropDead(spark,
      prunedPostings(spark, queries.select("term").distinct()), dead)
    Lexical.scoreBm25(queries, cand.select("term", "doc_id", "tf"),
      cand.select("doc_id", "dl").distinct(), n, tot, k, k1Milli, bMilli)
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
    val post = dropDead(spark,
      prunedPostings(spark, phrase.distinct.toDF("term")),
      tombstoned(spark)).select("term", "doc_id", "pos")
    val slots = phrase.zipWithIndex
    val joined = slots.map { case (w, i) =>
      post.filter(col("term") === w)
        .select(col("doc_id"), col("pos").as(s"pos_$i"))
    }.reduce(_.join(_, "doc_id"))
    val adjacency = (1 until phrase.size)
      .map(i => s"array_contains(pos_$i, p + $i)").mkString(" AND ")
    joined
      .withColumn("n_occ",
        expr(s"CAST(size(filter(pos_0, p -> $adjacency)) AS BIGINT)"))
      .filter(col("n_occ") > 0)
      .select("doc_id", "n_occ")
      .orderBy("doc_id")
  }

  /** Offline maintenance: fold all batch dirs into `batch=0` (planning
    * stops growing with trigger count). Committed-staging swap; an
    * interrupted swap rolls forward on the next call. Run with no
    * concurrent addBatch. */
  def compact(spark: SparkSession): Unit = {
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
    // stats recomputed from the surviving lens table, tombstones gone
    val dead = tombstoned(spark)
    dropDead(spark,
      spark.read.schema(StructType(rowSchema.fields ++ Seq(
          StructField("batch", LongType), StructField("part", IntegerType))))
        .option("basePath", path).parquet(path), dead)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"), col("pos"),
        lit(0L).as("batch"), pmod(hash(col("term")), lit(numParts)).as("part"))
      .repartition(numParts, col("part"))
      .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
      .parquet(staging.toString)
    val lensPath = new Path(path, "_lens")
    val liveLens =
      if (fs.exists(lensPath))
        dropDead(spark, spark.read.option("basePath", s"$path/_lens")
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
    fs.create(done, true).close()
    fs.delete(root, true)
    fs.rename(staging, root)
  }
}
