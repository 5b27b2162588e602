package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Durable incremental block-dedup store: the streaming form of the
  * batch `llm_block_dedup` operator (CCNet-style paragraph dedup over
  * deterministic 16-token blocks). A months-long intake can't re-run
  * the corpus-wide window per trigger — it needs "has any earlier doc
  * owned this block?" as a persisted index, restartable from object
  * storage, with per-trigger cost bounded by the BATCH.
  *
  * Layout: `path/batch=B/part=P/…` parquet rows `(bhash, doc_id,
  * block_idx)` where `part = pmod(hash(bhash), numParts)` — the same
  * part-pruned layout as [[LshIndexStore]], and the same disciplines:
  *
  *  1. incoming docs → 16-token blocks with md5 block hashes;
  *  2. the batch's TOUCHED parts (≤ numParts driver-side ints) select
  *     which `part=P` dirs are read — planning and I/O are
  *     O(touched + batch), never O(index);
  *  3. a block survives iff its hash is absent from the touched index
  *     rows AND this (doc_id, block_idx) is the batch's first occurrence
  *     (block-hash-partitioned window — never global);
  *  4. new owners are written via DYNAMIC overwrite of this batch's
  *     `(batch, part)` dirs (own dir cleared first, so a crashed attempt
  *     can't leak stale parts), `_applied/<batchId>` marker AFTER data —
  *     a replayed batch is a detectable no-op.
  *
  * Sequential intake over doc_id-ordered batches reproduces the batch
  * operator exactly (parity-tested): first corpus occurrence wins in
  * both. Returns the REWRITTEN docs — per doc the surviving-block count
  * and reassembled text — which is what the downstream tokenizer reads.
  */
class BlockDedupStore(path: String, blockTokens: Int = 16,
                      numParts: Int = 64) extends Serializable {

  /** Instrumentation: index part-dirs planned by the last addBatch —
    * the O(touched) contract made observable. */
  @transient @volatile var lastPlannedDirs: Seq[String] = Nil

  private def root = new Path(path)
  private def fsOf(spark: SparkSession) =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  private val rowSchema = StructType(Seq(
    StructField("bhash", StringType), StructField("doc_id", LongType),
    StructField("block_idx", LongType)))
  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_blocks", LongType),
    StructField("n_kept", LongType), StructField("kept_text", StringType)))

  private def partOf(bhash: Column): Column =
    pmod(hash(bhash), lit(numParts))

  private def batchDirs(spark: SparkSession): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
  }

  private def markerPath(batchId: Long) = new Path(path, s"_applied/$batchId")

  /** The part modulus is LAYOUT, not configuration: planning prunes by
    * `pmod(hash, numParts)`, so opening a store with a different value
    * silently plans dirs that don't exist — blocks get re-owned instead
    * of deduped. Persist it on first write; refuse a mismatched open.
    * (Underscore-prefixed, so parquet dir listing ignores it.) */
  private def enforceParts(fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val p = new Path(path, "_parts")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val v = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8).trim.toInt
      in.close()
      require(v == numParts,
        s"block store at $path was built with numParts=$v, opened with $numParts")
    } else {
      val out = fs.create(p, true)
      out.write(numParts.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
  }

  /** Full block ownership table (tests/maintenance; intake reads prune). */
  def indexRows(spark: SparkSession): DataFrame =
    if (batchDirs(spark).isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rowSchema)
    else spark.read
      .schema(StructType(rowSchema.fields ++ Seq(
        StructField("batch", LongType), StructField("part", IntegerType))))
      .option("basePath", path).parquet(path)
      .drop("batch", "part")

  /** Explode docs into (doc_id, block_idx, btext, bhash) block rows —
    * byte-identical blocking to the batch `llm_block_dedup` query. */
  private def blockRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("t"))
      .withColumn("n", size(col("t")))
      .select(col("doc_id"), col("t"),
        posexplode(expr(s"sequence(0, CAST((n - 1) div $blockTokens AS INT))")))
      .select(col("doc_id"), col("pos").cast("bigint").as("block_idx"),
        array_join(slice(col("t"), col("col") * blockTokens + 1,
          lit(blockTokens)), " ").as("btext"))
      .withColumn("bhash", md5(col("btext")))

  /** Ingest one batch: returns the rewritten docs (doc_id, n_blocks,
    * n_kept, kept_text) and records the new block owners. A batch whose
    * `_applied` marker exists writes NOTHING and recomputes the same
    * rewrite from the durable ownership (this batch's owner rows are
    * already on disk) — so a caller that persists the rewrite downstream
    * can replay a crashed trigger and converge, instead of losing the
    * batch to an empty no-op. */
  def addBatch(spark: SparkSession, docs: DataFrame, batchId: Long,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val fs = fsOf(spark)
    enforceParts(fs)
    if (fs.exists(markerPath(batchId))) {
      // replay path: kept = the rows this batch's original run recorded
      // as owners; read prunes to the batch's touched parts as usual
      val blocks = blockRows(docs, idCol, textCol).localCheckpoint(true)
      val touched = blocks.select(partOf(col("bhash")).as("p")).distinct()
        .collect().map(_.getInt(0)).toSet
      val dirs = for {
        b <- batchDirs(spark) // INCLUDING this batch's own dir
        p <- touched.toSeq.sorted
        dir = new Path(b, s"part=$p") if fs.exists(dir)
      } yield dir.toString
      lastPlannedDirs = dirs
      val owners =
        if (dirs.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rowSchema)
        else spark.read.schema(StructType(rowSchema.fields ++ Seq(
            StructField("batch", LongType), StructField("part", IntegerType))))
          .option("basePath", path).parquet(dirs: _*)
          .drop("batch", "part")
      return blocks
        .join(owners.withColumn("kept", lit(1)),
          Seq("bhash", "doc_id", "block_idx"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_blocks"),
          sum(coalesce(col("kept"), lit(0))).as("n_kept"),
          array_join(
            transform(
              array_sort(collect_list(when(col("kept") === 1,
                struct(col("block_idx"), col("btext"))))),
              x => x.getField("btext")),
            " ").as("kept_text"))
    }

    // the blocks feed three consumers (touched-part collect, the kept
    // computation, the write) — materialize the split/md5 work once
    val blocks = blockRows(docs, idCol, textCol).localCheckpoint(true)

    // ≤ numParts ints — bounded driver collect
    val touched = blocks.select(partOf(col("bhash")).as("p")).distinct()
      .collect().map(_.getInt(0)).toSet
    // exclude this batch's own (possibly crashed) dir: a doc must not
    // lose its blocks to its own half-written attempt
    val touchedDirs = for {
      b <- batchDirs(spark) if b.getName != s"batch=$batchId"
      p <- touched.toSeq.sorted
      dir = new Path(b, s"part=$p") if fs.exists(dir)
    } yield dir.toString
    lastPlannedDirs = touchedDirs

    val seen =
      if (touchedDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], rowSchema)
      else spark.read.schema(StructType(rowSchema.fields ++ Seq(
          StructField("batch", LongType), StructField("part", IntegerType))))
        .option("basePath", path).parquet(touchedDirs: _*)
        .drop("batch", "part")

    // in-batch canonical owner per block hash (hash-partitioned window),
    // then drop everything the index already owns
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("bhash").orderBy("doc_id", "block_idx")
    val ranked = blocks.withColumn("rn", row_number().over(w))
    val newOwners = ranked.filter(col("rn") === 1)
      .join(seen.select("bhash"), Seq("bhash"), "left_anti")
      .select("bhash", "doc_id", "block_idx")
      .localCheckpoint(true) // consumed by the write AND the kept join

    // kept = this row IS the new owner; rewrite each doc from survivors
    val kept = blocks.join(
      newOwners.withColumn("kept", lit(1)),
      Seq("bhash", "doc_id", "block_idx"), "left")
    val out = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(coalesce(col("kept"), lit(0))).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept") === 1,
              struct(col("block_idx"), col("btext"))))),
            x => x.getField("btext")),
          " ").as("kept_text"))
      .localCheckpoint(true) // survive the store write below

    // clean slate for this batch's dirs, then dynamic overwrite + marker
    // AFTER data (the gate discipline shared with LshIndexStore)
    fs.delete(new Path(path, s"batch=$batchId"), true)
    newOwners
      .select(col("bhash"), col("doc_id"), col("block_idx"),
        lit(batchId).as("batch"), partOf(col("bhash")).as("part"))
      .repartition(math.max(touched.size, 1), col("part"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "part")
      .parquet(path)
    val m = fs.create(markerPath(batchId), true)
    m.close()
    out
  }

  /** Offline maintenance: fold all batch dirs into `batch=0` so read
    * planning stops growing with trigger count. Same committed-staging
    * + roll-forward swap as [[LshIndexStore.compact]]. Run with no
    * concurrent addBatch. */
  def compact(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    val staging = new Path(root.getParent, root.getName + "._blk_compact")
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
      .select(col("bhash"), col("doc_id"), col("block_idx"),
        lit(0L).as("batch"), partOf(col("bhash")).as("part"))
      .repartition(numParts, col("part"))
      .write.mode(SaveMode.Overwrite).partitionBy("batch", "part")
      .parquet(staging.toString)
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
