package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** SCD2 history table of a replicated table — every change event becomes
  * an immutable VERSION row with an LSN validity interval, giving the
  * warehouse full audit history ("what did this row look like, and
  * when") and as-of-LSN time travel over a table whose live replica
  * ([[ParquetReplicaSink]]) only ever keeps the latest image. The
  * reference applies changes destructively (coalescing.rs renders plain
  * UPDATE/DELETE — history is gone once applied); this is the Spark-
  * native capability on top of the same stream.
  *
  * Version semantics (per key, LSN order):
  *   - insert/update at L opens a version `[L, next change's LSN)`;
  *     the key's latest version has `valid_to` NULL (open);
  *   - delete at L closes the predecessor and records an `op='d'`
  *     tombstone version (auditable "who deleted when"); tombstones are
  *     excluded from [[asOf]] states;
  *   - TRUNCATE at L caps every interval that spans L (the whole table
  *     died at L) without rewriting any data file — see below.
  *
  * Layout — append-only per-batch dirs, the [[AggViewSink]] pattern:
  *
  *   root/b<batchId>/part=P/     (key…, payload…, op, valid_from, valid_to)
  *   root/_trunc/b<batchId>/     (lsn)          truncate markers
  *
  * `valid_from` = the event's LSN. `valid_to` is materialized WHERE IT
  * IS ALREADY DECIDED: within a batch, a version followed by another
  * change of the same key gets its successor's LSN at write time (one
  * per-key window over the batch, no state read — the trigger is a
  * blind O(batch) append, never O(history)). A version still open at
  * its batch's end stores NULL; whether something closed it later is
  * decided at READ time by merging newer dirs — merge-on-read:
  *
  *   - base = the OLDEST b-dir (after [[compact]]: the folded store),
  *     fresh = every newer dir. Keys absent from fresh serve their base
  *     rows VERBATIM — closed intervals are immutable, and an open
  *     interval of an untouched key is still open. Only keys present in
  *     fresh (the since-last-compact working set, broadcast as a
  *     semi/anti join filter) pay a per-key window re-derive.
  *
  * LSNs are monotone across batches (O1 ordered delivery), so a
  * version's successor is simply the key's next `valid_from` — closed
  * rows re-derive to their stored value, making the stored/derived
  * split purely an optimization, never a correctness split.
  *
  * Exactly-once: a replayed micro-batch Overwrites its own `b<id>` dir
  * (the store-wide idiom); [[compact]] folds all-but-newest dirs
  * through the shared [[graft.llmops.BatchDirFold]] crash-safe staging
  * protocol, materializing `valid_to` across batch boundaries as it
  * folds. TRUNCATE appends one marker row instead of touching data:
  * reads cap every interval at the first marker LSN past its
  * `valid_from` (markers are few — a scalar CASE chain, no join).
  *
  * Batch contract (built by the warehouse chain): `op`, `lsn`, and the
  * table's columns flattened as strings — after-image values, before-
  * image fallback (so a delete's tombstone carries the dying row: the
  * reference's REPLICA IDENTITY FULL discipline). Key updates are out
  * of scope (same as the replica: a PK change must arrive as d+c).
  *
  * At 100 TB: writes are O(batch) appends partitioned by key-hash
  * `part`; probes ([[probe]]) prune to one part dir per b-dir; full
  * history/asOf scans read base verbatim (no shuffle) plus a window
  * over the touched-key slice only. Compaction keeps the dir count —
  * and therefore the fresh set — small.
  */
class HistorySink(path: String, keyCols: Seq[String], numParts: Int = 64)
    extends Serializable {

  private def root = new Path(path)
  private def truncDir = new Path(root, "_trunc")
  private def metaPath = new Path(root, "_graft_history.json")
  private def fsOf(spark: SparkSession) =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  /** The store's recorded layout: (numParts, keyCols). Written on the
    * first apply; every later reader/writer resolves against it, so a
    * handle constructed with different knobs (or with NO keys — the
    * truncate wave and the offline verb have no batch to learn them
    * from) cannot scatter versions across two hash layouts or window
    * on the wrong key ([[ParquetReplicaSink]]'s numBuckets
    * discipline). */
  private def readMeta(spark: SparkSession): Option[(Int, Seq[String])] = {
    val fs = fsOf(spark)
    if (!fs.exists(metaPath)) None
    else {
      val in = fs.open(metaPath)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(txt)
      import scala.jdk.CollectionConverters._
      Some((node.get("numParts").asInt(),
        node.get("keyCols").elements().asScala.map(_.asText()).toSeq))
    }
  }

  private def writeMeta(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    fs.mkdirs(root)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("numParts", numParts)
    val arr = node.putArray("keyCols")
    keyCols.foreach(arr.add)
    val tmp = new Path(root, "_graft_history.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(mapper.writeValueAsBytes(node)) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(metaPath.toUri, spark.sessionState.newHadoopConf())
      .rename(tmp, metaPath, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Resolved (numParts, keyCols): the store meta once it exists — a
    * KEYED handle must agree with it (fail fast); a keyless ops handle
    * adopts the stored layout. Before any meta: the constructor args
    * (keys required). */
  private def resolved(spark: SparkSession): (Int, Seq[String]) =
    readMeta(spark) match {
      case Some((n, ks)) =>
        require(keyCols.isEmpty || keyCols == ks,
          s"history at $path was written with keys ${ks.mkString(",")}, " +
            s"handle configured with ${keyCols.mkString(",")}")
        require(keyCols.isEmpty || n == numParts,
          s"history at $path was written with numParts=$n, handle " +
            s"configured with $numParts")
        (n, ks)
      case None =>
        require(keyCols.nonEmpty, "history needs the table's key columns")
        (numParts, keyCols)
    }

  private def keyStr(keys: Seq[String]): Column =
    concat_ws("\u0001", keys.map(c => coalesce(col(c), lit("\u0000"))): _*)
  private def partOf(n: Int, keys: Seq[String]): Column =
    pmod(graft.expressions.GraftFunctions.md5_prefix60(keyStr(keys)),
      lit(n.toLong))
  private def keyWindow(keys: Seq[String]) =
    Window.partitionBy(keys.map(col): _*).orderBy("valid_from")

  private def bDirs(spark: SparkSession): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
      .sortBy(_.getPath.getName.stripPrefix("b").toLong)
      .map(_.getPath)
  }

  /** Append one micro-batch as version rows — O(batch), no state read.
    * `flat`: op, lsn, table columns (strings, after-image first). */
  def applyBatch(spark: SparkSession, flat: DataFrame, batchId: Long): Unit = {
    val (n, keys) = resolved(spark)
    keys.foreach(k => require(flat.columns.contains(k),
      s"batch lacks key column $k"))
    if (readMeta(spark).isEmpty) writeMeta(spark) // BEFORE data: see doc
    val dml = flat.filter(col("op").isin("c", "u", "d"))
    if (dml.isEmpty) return // no dir for an empty batch: reads stay O(dirs)
    dml
      .withColumn("valid_from", col("lsn").cast("long")).drop("lsn")
      .withColumn("valid_to", lead("valid_from", 1).over(keyWindow(keys)))
      .withColumn("part", partOf(n, keys).cast("int"))
      .write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(new Path(root, s"b$batchId").toString)
  }

  /** Declare history over an ALREADY-replicated table: seed one open
    * `op='c'` version per snapshot row at `asOfLsn` (the replication
    * position the snapshot was taken at) as the `b-1` dir — "-1" can
    * never collide with a streamed batch id, so the first trigger's
    * Overwrite-own-dir replay discipline is unaffected (the
    * [[AggViewSink.bootstrap]] idiom). History BEFORE the bootstrap
    * point does not exist (it was never captured); every state from
    * `asOfLsn` on is reconstructable. OFFLINE discipline: snapshot
    * with the streaming pipeline stopped. */
  def bootstrap(spark: SparkSession, snapshot: DataFrame,
                asOfLsn: Long): Unit = {
    require(keyCols.nonEmpty, "bootstrap needs the table's key columns")
    keyCols.foreach(k => require(snapshot.columns.contains(k),
      s"snapshot lacks key column $k"))
    val fs = fsOf(spark)
    if (fs.exists(root)) fs.delete(root, true)
    writeMeta(spark)
    snapshot
      .select(snapshot.columns.map(c => col(c).cast("string").as(c)): _*)
      .withColumn("op", lit("c"))
      .withColumn("valid_from", lit(asOfLsn))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("part", partOf(numParts, keyCols).cast("int"))
      .write.mode(SaveMode.Overwrite).partitionBy("part")
      .parquet(new Path(root, "b-1").toString)
  }

  /** Incremental re-fetch for downstream consumers: every version
    * OPENED after `sinceLsn` (the shard-manifest-diff pattern — a
    * consumer that processed history up to L asks only for what L
    * did not cover). Intervals and `is_current` are final with
    * respect to the whole store, not the slice. */
  def changes(spark: SparkSession, sinceLsn: Long): DataFrame =
    history(spark).filter(col("valid_from") > sinceLsn)

  /** Record a TRUNCATE at `lsn`: one marker row, zero data rewritten.
    * Reads cap every interval spanning `lsn`; versions opened after it
    * (same or later batches) are unaffected. */
  def truncate(spark: SparkSession, lsn: Long, batchId: Long): Unit = {
    import spark.implicits._
    Seq(lsn).toDF("lsn").coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(new Path(truncDir, s"b$batchId").toString)
  }

  private def truncLsns(spark: SparkSession): Seq[Long] = {
    val fs = fsOf(spark)
    if (!fs.exists(truncDir)) Seq.empty
    else {
      val dirs = fs.listStatus(truncDir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
        .map(_.getPath.toString)
      if (dirs.isEmpty) Seq.empty
      else spark.read.schema(StructType(Seq(StructField("lsn", LongType))))
        .parquet(dirs: _*).distinct()
        .collect().map(_.getLong(0)).sorted.toSeq
    }
  }

  /** First truncate LSN strictly after `valid_from` (ascending
    * fold: outermost WHEN wins = smallest marker), NULL when none. */
  private def truncCap(truncs: Seq[Long]): Column =
    truncs.foldRight(lit(null).cast("long")) { (t, acc) =>
      when(lit(t) > col("valid_from"), lit(t)).otherwise(acc)
    }

  private def readDir(spark: SparkSession, dir: Path,
                      parts: Option[Seq[Int]]): DataFrame = {
    val df = spark.read.parquet(dir.toString)
    parts.fold(df)(ps => df.filter(col("part").isin(ps: _*)))
  }

  private def emptyHistory(spark: SparkSession, keys: Seq[String]): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(keys.map(StructField(_, StringType)) ++ Seq(
        StructField("op", StringType), StructField("valid_from", LongType),
        StructField("valid_to", LongType))))
      .withColumn("is_current", lit(false))

  /** Interval fix-up + truncate caps + `is_current` over a raw rows
    * frame whose UNTOUCHED subset is already final. */
  private def finalize(spark: SparkSession, rows: DataFrame): DataFrame =
    rows
      // Spark's least() ignores NULLs: min when both bound, the other
      // when one is, NULL (still open) only when neither closes it
      .withColumn("valid_to", least(col("valid_to"), truncCap(truncLsns(spark))))
      .withColumn("is_current", col("valid_to").isNull && col("op") =!= "d")
      .drop("part")

  /** The full version history: every key's chain of
    * `[valid_from, valid_to)` intervals (NULL = still open), op, the
    * row image, and `is_current`. Base rows of keys untouched since the
    * base dir serve verbatim — no shuffle; only the touched-key slice
    * re-derives its intervals. `parts` prunes to probed hash parts. */
  def history(spark: SparkSession,
              parts: Option[Seq[Int]] = None): DataFrame = {
    val (_, keys) = resolved(spark)
    val dirs = bDirs(spark)
    if (dirs.isEmpty) return emptyHistory(spark, keys)
    val base = readDir(spark, dirs.head, parts)
    if (dirs.size == 1) return finalize(spark, base)
    val fresh = dirs.tail.map(readDir(spark, _, parts))
      .reduce(_.unionByName(_, allowMissingColumns = true))
    // the working-set key filter broadcasts only when it is actually
    // small (the steady, post-compact case — counting it costs one job
    // over the fresh dirs alone); a bulk-load-sized fresh set instead
    // leaves the join strategy to AQE, which would otherwise OOM the
    // executors materializing a forced broadcast
    val freshKeys0 = fresh.select(keys.map(col): _*).distinct()
      .localCheckpoint(true)
    val freshKeys =
      if (freshKeys0.count() <= 1000000) broadcast(freshKeys0) else freshKeys0
    val keyEq = (l: DataFrame, r: DataFrame) =>
      keys.map(k => l(k) <=> r(k)).reduce(_ && _)
    val untouched = base.join(freshKeys,
      keyEq(base, freshKeys), "left_anti")
    val touched = base.join(freshKeys,
        keyEq(base, freshKeys), "left_semi")
      .unionByName(fresh, allowMissingColumns = true)
      .withColumn("valid_to", lead("valid_from", 1).over(keyWindow(keys)))
    finalize(spark,
      untouched.unionByName(touched, allowMissingColumns = true))
  }

  /** Time travel: the table's state as of `lsn` (inclusive) — exactly
    * the rows whose interval covers it, tombstones excluded. Equals the
    * replica built from events with LSN ≤ `lsn` (spec-asserted). */
  def asOf(spark: SparkSession, lsn: Long): DataFrame =
    history(spark)
      .filter(col("valid_from") <= lsn &&
        (col("valid_to").isNull || col("valid_to") > lsn) &&
        col("op") =!= "d")
      .drop("is_current")

  /** One key's version chain, pruned to its hash part in every b-dir —
    * O(dirs × one part) read, never a table scan. */
  def probe(spark: SparkSession, key: Seq[String]): DataFrame = {
    val (n, keys) = resolved(spark)
    require(key.size == keys.size,
      s"probe needs ${keys.size} values (keyCols order)")
    import scala.jdk.CollectionConverters._
    val p = spark.createDataFrame(
        Seq(org.apache.spark.sql.Row.fromSeq(key)).asJava,
        StructType(keys.map(StructField(_, StringType))))
      .select(partOf(n, keys).cast("int")).head().getInt(0)
    history(spark, Some(Seq(p)))
      .filter(keys.zip(key).map { case (c, v) => col(c) <=> lit(v) }
        .reduce(_ && _))
      .orderBy("valid_from")
  }

  /** Fold all-but-newest b-dirs into one, materializing `valid_to`
    * across the folded batch boundaries (the shared crash-safe staging
    * protocol — [[graft.llmops.BatchDirFold]]); truncate markers fold
    * to their distinct union. Returns dirs folded.
    *
    * `retainBelow`: age out audit history — drop versions whose
    * validity ENDED at or before the horizon LSN (truncate caps
    * count as endings). Per key that is a contiguous chain PREFIX
    * (valid_to is monotone along a chain), so the remaining suffix's
    * intervals — and every `asOf(l)` with `l >= horizon` — are
    * untouched; states before the horizon become unreconstructable,
    * which is the point. Open versions and un-closed tombstones are
    * never dropped. */
  def compact(spark: SparkSession, retainBelow: Option[Long] = None): Int = {
    val (n, keys) = resolved(spark)
    val truncs = truncLsns(spark)
    val folded = graft.llmops.BatchDirFold.fold(spark, root,
      (dirs, staged) =>
        dirs.map(readDir(spark, _, None))
          .reduce(_.unionByName(_, allowMissingColumns = true))
          .withColumn("valid_to", lead("valid_from", 1).over(keyWindow(keys)))
          .filter(retainBelow.map(h =>
              // judged on the EFFECTIVE end (truncate caps included):
              // a version the truncate killed before the horizon is
              // as dead as one a successor closed
              least(col("valid_to"), truncCap(truncs)).isNull ||
                least(col("valid_to"), truncCap(truncs)) > h)
            .getOrElse(lit(true)))
          .withColumn("part", partOf(n, keys).cast("int"))
          .write.mode(SaveMode.Overwrite).partitionBy("part")
          .parquet(staged))
    val foldedTrunc = graft.llmops.BatchDirFold.fold(spark, truncDir,
      (dirs, staged) =>
        spark.read.parquet(dirs.map(_.toString): _*).distinct()
          .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged))
    graft.llmops.BatchDirFold.heal(spark, root)
    folded + foldedTrunc
  }

  /** Finish any interrupted fold (call on restart before serving). */
  def heal(spark: SparkSession): Unit = {
    graft.llmops.BatchDirFold.heal(spark, root)
    graft.llmops.BatchDirFold.heal(spark, truncDir)
  }
}
