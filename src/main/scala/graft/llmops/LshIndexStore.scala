package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable incremental LSH dedup index: the persisted complement of
  * [[StreamingDedup]] (whose per-bucket state lives in the streaming
  * checkpoint). A training-data intake that runs for months needs the
  * "have I seen something near-identical?" index as a TABLE — restartable
  * from object storage, shared by several pipelines, compactable offline.
  *
  * Layout: `path/batch=B/part=P/…` parquet where
  * `part = pmod(hash(bucket), numParts)` and `bucket` is the same banded
  * minhash bucket string the streaming operator keys state by
  * ([[StreamingDedup.bucketArrivals]] — identical banding, so batch,
  * stream, and index agree on candidates). Per `addBatch`:
  *
  *  1. incoming docs → (bucket, docId, sig) arrivals (bands rows/doc);
  *  2. the arrivals' TOUCHED parts (≤ numParts driver-side ints) select
  *     which `part=P` dirs of which batch dirs are read — planning and
  *     I/O are O(touched + batch), never O(index);
  *  3. candidate pairs = bucket-equality join (arrivals × touched index
  *     rows, plus arrivals × smaller-id arrivals for intra-batch pairs),
  *     scored by minhash match fraction (E[frac] = Jaccard) — greedy
  *     smaller-id-wins, the same semantics as [[Dedup.nearDedup]];
  *  4. survivors' arrival rows are written via DYNAMIC overwrite of the
  *     `(batch, part)` partitions — a replayed batch overwrites its own
  *     dirs instead of appending twice (idempotent by construction), and
  *     the `_applied/<batchId>` marker (written AFTER data) makes the
  *     replay a detectable no-op.
  *
  * At 100 TB the index is millions of small signature rows, not
  * documents: rows are (bucket, id, k longs). Batch-dir count grows with
  * trigger count — [[compact]] folds all batches into one offline (same
  * committed-staging + roll-forward swap discipline as the replica
  * sink's maintenance ops).
  */
class LshIndexStore(path: String, simThreshold: Double = 0.5,
                    numParts: Int = 64, k: Int = 8, rowsPerBand: Int = 2,
                    shingleN: Int = 3) extends Serializable {

  /** Instrumentation: index part-dirs planned by the last addBatch —
    * the O(touched) contract made observable. */
  @transient @volatile var lastPlannedDirs: Seq[String] = Nil

  private def root = new Path(path)
  private def fsOf(spark: SparkSession) =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  private val rowSchema = StructType(Seq(
    StructField("bucket", StringType), StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType))))
  private val hitSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("dup_of", LongType),
    StructField("est_jaccard", DoubleType)))

  private def partOf(bucket: Column): Column =
    pmod(hash(bucket), lit(numParts))

  /** Minhash match fraction of two k-signatures — k codegen'd element
    * comparisons, matching [[StreamingDedup.matchFraction]]. */
  private def matchFrac(a: Column, b: Column): Column =
    (0 until k).map(i =>
      when(element_at(a, i + 1) === element_at(b, i + 1), 1).otherwise(0))
      .reduce(_ + _) * lit(1.0) / lit(k)

  private def batchDirs(spark: SparkSession): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
  }

  private def markerPath(batchId: Long) = new Path(path, s"_applied/$batchId")

  /** The part modulus is LAYOUT, not configuration: planning prunes by
    * `pmod(hash(bucket), numParts)`, so opening a store with a different
    * value silently plans dirs that don't exist — dup candidates are
    * missed instead of found. Persist it on first write; refuse a
    * mismatched open. (Underscore-prefixed: parquet listing ignores it.) */
  private def enforceParts(fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val p = new Path(path, "_parts")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val v = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      in.close()
      require(v == numParts,
        s"LSH index at $path was built with numParts=$v, opened with $numParts")
    } else {
      val out = fs.create(p, true)
      out.write(numParts.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
  }

  /** Full index content (tests/maintenance; production reads prune). */
  def indexRows(spark: SparkSession): DataFrame =
    if (batchDirs(spark).isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rowSchema)
    else spark.read
      .schema(StructType(rowSchema.fields ++ Seq(
        StructField("batch", LongType), StructField("part", IntegerType))))
      .option("basePath", path).parquet(path)
      .drop("batch", "part")

  /** Ingest one batch: returns the dup hits (doc_id, dup_of,
    * est_jaccard — distinct pairs) and indexes the survivors. A batch
    * whose `_applied` marker exists returns no hits and writes nothing
    * (replay no-op). */
  def addBatch(spark: SparkSession, docs: DataFrame, batchId: Long,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fs = fsOf(spark)
    enforceParts(fs)
    if (fs.exists(markerPath(batchId)))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], hitSchema)

    val arrivals = StreamingDedup
      .bucketArrivals(docs, k, rowsPerBand, shingleN, idCol, textCol)
      .toDF()
      // several joins + the write reuse the arrivals; the signature
      // projection is regex/shingle-heavy, so materialize it once
      .localCheckpoint(true)

    // ≤ numParts ints — bounded driver collect
    val touched = arrivals.select(partOf(col("bucket")).as("p")).distinct()
      .collect().map(_.getInt(0)).toSet
    // a crashed prior attempt of THIS batch may have left batch=<id>
    // rows — they are not "prior corpus" (a doc must not dup-match its
    // own crashed write), so exclude them from the candidate read
    val touchedDirs = for {
      b <- batchDirs(spark) if b.getName != s"batch=$batchId"
      p <- touched.toSeq.sorted
      dir = new Path(b, s"part=$p") if fs.exists(dir)
    } yield dir.toString
    lastPlannedDirs = touchedDirs

    val indexed =
      if (touchedDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rowSchema)
      else spark.read.schema(StructType(rowSchema.fields ++ Seq(
          StructField("batch", LongType), StructField("part", IntegerType))))
        .option("basePath", path).parquet(touchedDirs: _*)
        .drop("batch", "part")

    // greedy smaller-id-wins (Dedup.nearDedup semantics): a doc dups if
    // it bucket-collides with an already-indexed doc or a smaller-id
    // batch doc, at signature match fraction ≥ threshold
    def score(cand: DataFrame): DataFrame = cand
      .withColumn("est_jaccard", matchFrac(col("sig"), col("prior_sig")))
      .filter(col("est_jaccard") >= simThreshold)
      .select(col("docId").as("doc_id"), col("prior_id").as("dup_of"),
        col("est_jaccard"))
    val vsIndex = score(arrivals.join(
      indexed.select(col("bucket"), col("doc_id").as("prior_id"),
        col("sig").as("prior_sig")), "bucket"))
    val vsBatch = score(arrivals.join(
      arrivals.select(col("bucket"), col("docId").as("prior_id"),
        col("sig").as("prior_sig")), "bucket")
      .filter(col("prior_id") < col("docId")))
    val hits = vsIndex.unionByName(vsBatch)
      .dropDuplicates("doc_id", "dup_of")
      .localCheckpoint(true) // consumed twice: survivors filter + caller

    val survivors = arrivals.join(
      hits.select(col("doc_id").as("docId")).distinct(), Seq("docId"), "left_anti")
    // clean slate for this batch's partition dirs: a crashed attempt may
    // have written parts this retry's survivor set no longer touches —
    // dynamic overwrite alone would leave those stale
    fs.delete(new Path(path, s"batch=$batchId"), true)
    survivors
      .select(col("bucket"), col("docId").as("doc_id"), col("sig"),
        lit(batchId).as("batch"), partOf(col("bucket")).as("part"))
      .repartition(math.max(touched.size, 1), col("part"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "part")
      .parquet(path)
    // marker AFTER data: a crash in between replays the (idempotent)
    // overwrite — the gate discipline shared with the warehouse sink
    val out = fs.create(markerPath(batchId), true)
    out.close()
    hits
  }

  /** Offline maintenance: fold all batch dirs into `batch=0` so read
    * planning stops growing with trigger count. Committed-staging swap:
    * the staging dir is fully written (with `_graft_compact_done`)
    * before the root is replaced; an interrupted swap rolls forward on
    * the next call. Run with no concurrent addBatch. */
  def compact(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    val staging = new Path(root.getParent, root.getName + "._lsh_compact")
    val done = new Path(staging, "_graft_compact_done")
    if (fs.exists(staging) && fs.exists(done)) { // crashed mid-swap
      if (fs.exists(root)) fs.delete(root, true)
      fs.rename(staging, root)
      return
    }
    if (batchDirs(spark).isEmpty) return
    enforceParts(fs)
    if (fs.exists(staging)) fs.delete(staging, true)
    indexRows(spark)
      .select(col("bucket"), col("doc_id"), col("sig"),
        lit(0L).as("batch"), partOf(col("bucket")).as("part"))
      .repartition(numParts, col("part"))
      .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
      .parquet(staging.toString)
    // applied-markers + the layout modulus survive compaction (replayed
    // old batches must still be recognized; mismatched re-opens must
    // still be refused)
    for (side <- Seq("_applied", "_parts")) {
      val src = new Path(path, side)
      if (fs.exists(src))
        org.apache.hadoop.fs.FileUtil.copy(
          fs, src, fs, new Path(staging, side), false,
          spark.sessionState.newHadoopConf())
    }
    fs.create(done, true).close()
    fs.delete(root, true)
    fs.rename(staging, root)
  }
}
