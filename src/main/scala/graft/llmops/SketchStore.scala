package graft.llmops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DURABLE sketch store: the whole sketch family — KMV (per-group
  * distinct-count), count-min (token-frequency), HLL (fixed-register
  * distinct-count) and the log-linear histogram (per-group quantiles)
  * — persisted as first-class artifacts, not just operator state. The
  * `Sketch.*Stream` folds keep their buffers in the streaming
  * checkpoint — correct, but the sketch then lives and dies with one
  * query; a months-long intake wants the sketch ON DISK: union-able
  * with other stores, bootstrappable after a restart, servable without
  * the stream running. Every sketch here merges EXACTLY (KMV:
  * distinct-union re-take-k; CMS/hist: cell addition; HLL: register
  * max), so the stored form equals the batch sketch over everything
  * ever ingested — spec-asserted, including across a kill → resume.
  *
  * Layout (the per-batch-dir replay discipline of [[StreamingCurate]]):
  *   root/kmv/b<batchId>/part=P   (group, mins array<bigint>)
  *                                 P = pmod(hash(group), numParts)
  *   root/hll/b<batchId>/part=P   (group, bucket, r) — ≤ m rows/group
  *   root/hist/b<batchId>/part=P  (group, idx, c) — ≤ buckets rows/group
  *   root/cms/b<batchId>/         (r, bucket, c) — ≤ d·w rows per batch
  * Every trigger overwrites ONLY its own b<id> dir, so a crash-replayed
  * epoch rewrites the same rows instead of double-counting (the CMS
  * would otherwise over-add on replay; KMV union is idempotent anyway).
  *
  * Scale shape: a trigger writes O(batch groups · k) KMV rows and ≤ d·w
  * CMS cells — map-side-combined aggregates, never raw values. Reads
  * merge the b-dirs; [[compact]] folds them to one so read fan-in stays
  * flat over months of triggers. Per-group serving reads prune to the
  * group's hash part (literal part predicates, the house lookup trick).
  */
final class SketchStore(root: String, k: Int = 256, d: Int = 4,
                        w: Int = 1024, numParts: Int = 64) extends Serializable {

  private def kmvDir = new Path(root, "kmv")
  private def cmsDir = new Path(root, "cms")
  private def hllDir = new Path(root, "hll")
  private def histDir = new Path(root, "hist")
  private def fsOf(spark: SparkSession) =
    kmvDir.getFileSystem(spark.sessionState.newHadoopConf())

  private def partOf(c: Column): Column = pmod(hash(c), lit(numParts))

  /** The probed groups' hash parts via ONE 1-row job over the same hash
    * expression the write layout used — shared by every pruned-serving
    * path so the read side can never drift from the write scheme. */
  private def partsOf(spark: SparkSession, groups: Seq[String]): Set[Int] = {
    require(groups.nonEmpty, "empty group set")
    val partRow = spark.range(1)
      .select(groups.map(g => partOf(lit(g)).cast("int")): _*).head()
    groups.indices.map(partRow.getInt).toSet
  }

  /** One KMV intake trigger: per-group batch sketches land under
    * `kmv/b<batchId>` (Overwrite — replay-safe). */
  def addKmvBatch(batch: DataFrame, groupCol: String, value: Column,
                  batchId: Long): Unit =
    batch.groupBy(col(groupCol).cast("string").as("group"))
      .agg(Sketch.kmvSketch(value, k).as("mins"))
      .withColumn("part", partOf(col("group")))
      .write.mode("overwrite").partitionBy("part")
      .parquet(new Path(kmvDir, s"b$batchId").toString)

  /** One CMS intake trigger: the batch's d·w-bounded cell table lands
    * under `cms/b<batchId>`. */
  def addCmsBatch(batch: DataFrame, value: Column, batchId: Long): Unit =
    Sketch.cmsTable(batch, value, d, w).coalesce(1)
      .write.mode("overwrite")
      .parquet(new Path(cmsDir, s"b$batchId").toString)

  private def bDirsOf(spark: SparkSession, dir: Path): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
      .map(_.getPath)
  }

  /** Leaf dirs of the part-partitioned kmv layout under the given
    * b-dirs — LEAF `part=P` dirs (several partitioned roots would make
    * partition discovery conflict — the StreamingCurate lesson);
    * `parts` restricts to the probed hash parts. */
  private def kmvLeaves(spark: SparkSession, bdirs: Seq[Path],
                        parts: Option[Set[Int]]): Seq[String] = {
    val fs = fsOf(spark)
    for {
      b <- bdirs
      leaf <- parts match {
        case None => fs.listStatus(b).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
          .map(_.getPath.toString)
        case Some(ps) => ps.toSeq.sorted
          .map(p => new Path(b, s"part=$p"))
          .filter(fs.exists(_)).map(_.toString)
      }
    } yield leaf
  }

  /** KMV merge over explicit leaf dirs: distinct-union of the buffers,
    * re-cut to the k smallest — the exact batch-sketch merge. */
  private def kmvMergeOf(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.schema("group STRING, mins ARRAY<BIGINT>").parquet(dirs: _*)
      .groupBy("group")
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))),
        1, k).as("mins"))

  /** The merged per-group KMV rows (group, mins) over everything
    * ingested. Heals an interrupted fold first — a crash between the
    * fold's delete and rename leaves the only copy in staging, which a
    * non-healing read would miss. */
  private def kmvMerged(spark: SparkSession,
                        parts: Option[Set[Int]] = None): DataFrame = {
    BatchDirFold.heal(spark, kmvDir)
    val dirs = kmvLeaves(spark, bDirsOf(spark, kmvDir), parts)
    require(dirs.nonEmpty, s"$root/kmv is empty")
    kmvMergeOf(spark, dirs)
  }

  /** Distinct-count estimates for every stored group — equals
    * `Sketch.kmvDistinct` over the full ingested input. */
  def kmvEstimates(spark: SparkSession): DataFrame =
    kmvMerged(spark)
      .select(col("group"), Sketch.kmvEstimate(col("mins"), k).as("n_est"))

  /** Pruned per-group serving: only the probed groups' hash-part dirs
    * are read (literal part list), not the whole store. */
  def kmvEstimateFor(spark: SparkSession, groups: Seq[String]): DataFrame = {
    kmvMerged(spark, Some(partsOf(spark, groups)))
      .filter(col("group").isin(groups: _*))
      .select(col("group"), Sketch.kmvEstimate(col("mins"), k).as("n_est"))
  }

  /** One HLL intake trigger: the batch's per-group register cells
    * (≤ m rows per group) land under `hll/b<batchId>` — same
    * Overwrite-own-dir replay discipline as KMV. */
  def addHllBatch(batch: DataFrame, groupCol: String, value: Column,
                  batchId: Long): Unit =
    Sketch.hllCells(
        batch.select(col(groupCol).cast("string").as("group"), value.as("__v")),
        "group", col("__v"))
      .withColumn("part", partOf(col("group")))
      .write.mode("overwrite").partitionBy("part")
      .parquet(new Path(hllDir, s"b$batchId").toString)

  /** HLL register merge over explicit leaf dirs: per-register MAX — the
    * exact sketch union. (Leaf listing reuses [[kmvLeaves]] — same
    * part-partitioned layout.) */
  private def hllMergeOf(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.schema("group STRING, bucket BIGINT, r BIGINT").parquet(dirs: _*)
      .groupBy("group", "bucket").agg(max("r").as("r"))

  private def hllMerged(spark: SparkSession,
                        parts: Option[Set[Int]] = None): DataFrame = {
    BatchDirFold.heal(spark, hllDir)
    val dirs = kmvLeaves(spark, bDirsOf(spark, hllDir), parts)
    require(dirs.nonEmpty, s"$root/hll is empty")
    hllMergeOf(spark, dirs)
  }

  /** Distinct-count estimates for every stored group — equals
    * `Sketch.hllDistinct` over the full ingested input. */
  def hllEstimates(spark: SparkSession): DataFrame =
    Sketch.hllEstimates(hllMerged(spark), "group")

  /** Pruned per-group HLL serving (literal part list, like
    * [[kmvEstimateFor]]). */
  def hllEstimateFor(spark: SparkSession, groups: Seq[String]): DataFrame =
    Sketch.hllEstimates(
      hllMerged(spark, Some(partsOf(spark, groups)))
        .filter(col("group").isin(groups: _*)),
      "group")

  /** Streaming HLL intake — same discipline as [[startKmv]]. */
  def startHll(docs: DataFrame, groupCol: String, value: Column,
               checkpointDir: String,
               trigger: org.apache.spark.sql.streaming.Trigger =
                 org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-hll-sketch")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        addHllBatch(b, groupCol, value, id) }
      .start()

  /** One histogram intake trigger: the batch's (group, idx, c) bucket
    * table lands under `hist/b<batchId>` — cells ADD like CMS, stored
    * group-part-partitioned like KMV for pruned serving. */
  def addHistBatch(batch: DataFrame, groupCol: String, value: Column,
                   batchId: Long): Unit =
    Sketch.histTable(
        batch.select(col(groupCol).cast("string").as("group"), value.as("__v")),
        "group", col("__v"))
      .withColumn("part", partOf(col("group")))
      .write.mode("overwrite").partitionBy("part")
      .parquet(new Path(histDir, s"b$batchId").toString)

  private def histSumOf(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.schema("group STRING, idx BIGINT, c BIGINT").parquet(dirs: _*)
      .groupBy("group", "idx").agg(sum("c").as("c"))

  private def histMerged(spark: SparkSession,
                         parts: Option[Set[Int]] = None): DataFrame = {
    BatchDirFold.heal(spark, histDir)
    val dirs = kmvLeaves(spark, bDirsOf(spark, histDir), parts)
    require(dirs.nonEmpty, s"$root/hist is empty")
    histSumOf(spark, dirs)
  }

  /** The merged histogram (group, idx, c) over everything ingested —
    * equals `Sketch.histTable` over the full input. */
  def histCells(spark: SparkSession): DataFrame = histMerged(spark)

  /** Per-group quantile read-out from the stored histogram. */
  def histQuantiles(spark: SparkSession, qPermille: Seq[Long]): DataFrame =
    Sketch.histQuantiles(histMerged(spark), "group", qPermille)

  /** Pruned per-group quantile serving (literal part list). */
  def histQuantilesFor(spark: SparkSession, groups: Seq[String],
                       qPermille: Seq[Long]): DataFrame =
    Sketch.histQuantiles(
      histMerged(spark, Some(partsOf(spark, groups)))
        .filter(col("group").isin(groups: _*)),
      "group", qPermille)

  /** Streaming histogram intake — same discipline as [[startKmv]]. */
  def startHist(docs: DataFrame, groupCol: String, value: Column,
                checkpointDir: String,
                trigger: org.apache.spark.sql.streaming.Trigger =
                  org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-hist-sketch")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        addHistBatch(b, groupCol, value, id) }
      .start()

  private def cmsSumOf(spark: SparkSession, dirs: Seq[String]): DataFrame =
    spark.read.schema("r INT, bucket BIGINT, c BIGINT").parquet(dirs: _*)
      .groupBy("r", "bucket").agg(sum("c").as("c"))

  /** The merged CMS cell table (r, bucket, c): per-batch cells ADD —
    * equals `Sketch.cmsTable` over the full ingested input. Heals an
    * interrupted fold first (see [[kmvMerged]]). */
  def cmsCells(spark: SparkSession): DataFrame = {
    BatchDirFold.heal(spark, cmsDir)
    val dirs = bDirsOf(spark, cmsDir).map(_.toString)
    require(dirs.nonEmpty, s"$root/cms is empty")
    cmsSumOf(spark, dirs)
  }

  /** Point frequency estimates for a probe vocabulary, served from the
    * stored sketch. */
  def cmsEstimate(spark: SparkSession, probes: DataFrame,
                  probeCol: String): DataFrame =
    Sketch.cmsEstimate(cmsCells(spark), probes, probeCol, d, w)

  /** Streaming KMV intake: the store IS the state. Resume from the
    * checkpoint re-runs at most the last epoch, which rewrites its own
    * b<id> dir — estimates after resume equal the batch sketch over the
    * full input (spec-asserted). */
  def startKmv(docs: DataFrame, groupCol: String, value: Column,
               checkpointDir: String,
               trigger: org.apache.spark.sql.streaming.Trigger =
                 org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-kmv-sketch")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        addKmvBatch(b, groupCol, value, id) }
      .start()

  /** Streaming CMS intake — same discipline as [[startKmv]]. */
  def startCms(docs: DataFrame, value: Column, checkpointDir: String,
               trigger: org.apache.spark.sql.streaming.Trigger =
                 org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-cms-sketch")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        addCmsBatch(b, value, id) }
      .start()

  /** Maintenance: fold the accumulated b-dirs of each sketch kind via
    * the shared [[BatchDirFold]] protocol — every b-dir EXCEPT the
    * newest folds into one dir named after the highest folded id. The
    * newest is excluded because it may belong to a checkpoint-
    * uncommitted trigger whose replay Overwrites its own b<id> dir: had
    * the fold merged everything under that name, the replay would
    * replace the whole merged store with one batch. Offline discipline;
    * crash-healed staging swap. Returns folded dir counts per kind. */
  def compact(spark: SparkSession): Map[String, Int] =
    Seq(("kmv", kmvDir), ("cms", cmsDir), ("hll", hllDir), ("hist", histDir))
      .map { case (kind, dir) =>
      def partitioned(df: DataFrame, staged: String): Unit =
        df.withColumn("part", partOf(col("group")))
          .repartition(col("part"))
          .write.partitionBy("part").mode("overwrite").parquet(staged)
      kind -> BatchDirFold.fold(spark, dir, (folded, staged) =>
        kind match {
          case "kmv" =>
            partitioned(kmvMergeOf(spark, kmvLeaves(spark, folded, None)), staged)
          case "hll" =>
            partitioned(hllMergeOf(spark, kmvLeaves(spark, folded, None)), staged)
          case "hist" =>
            partitioned(histSumOf(spark, kmvLeaves(spark, folded, None)), staged)
          case _ =>
            cmsSumOf(spark, folded.map(_.toString)).coalesce(1)
              .write.mode("overwrite").parquet(staged)
        })
    }.toMap
}
