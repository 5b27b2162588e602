package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Secondary access path for a warehouse replica: the same rows
  * REORGANIZED into a hash-bucketed layout on a DIFFERENT column (the
  * "index key"), so a point query on that column reads ONE bucket out of
  * `numBuckets` instead of scanning the primary layout. The primary
  * replica ([[ParquetReplicaSink]]) stays the source of truth; this is
  * the warehouse analog of a covering secondary index.
  *
  * Maintenance from the CDC batch: the NEW image's index value places
  * the upsert; the BEFORE image's index value locates the stored row it
  * replaces — an index-key change MOVES the row across buckets, and only
  * the before image knows the source bucket. Correct maintenance
  * therefore requires updates/deletes to carry the index column in their
  * before image (PostgreSQL `REPLICA IDENTITY FULL`, or an index key
  * that is part of the replica identity); the apply fails fast when the
  * old value is absent instead of leaving a phantom row behind.
  *
  * Batch contract (pre-flattened, same shape as the warehouse apply):
  * `op, lsn, <primaryKey...>, <payload incl. indexKey>, __old_idx`
  * where `__old_idx` is the before-image index value.
  *
  * `__old_idx` on INSERTS: a 'c' with a NULL `__old_idx` asserts its
  * primary key is ABSENT from the projection — locating a stored row
  * would need its (unknown) old index value, and probing all buckets
  * per batch would defeat the pruning this sink exists for. An
  * insert that may REPLACE a stored row (snapshot re-load, a
  * delete+reinsert collapsed across batches) must carry the stored
  * row's index value in `__old_idx`, exactly like an update — it is
  * then treated as a move and the old-bucket copy is removed (tested).
  * Violating the contract (null-`__old_idx` 'c' over a live key whose
  * stored index value hashes elsewhere) strands the old row; rebuild
  * via [[truncate]] + re-load, the usual secondary-index discipline.
  *
  * Per batch:
  *   1. squash to one winner per primary key (latest lsn);
  *   2. touched buckets = hash(old index values) ∪ hash(new ones) —
  *      a bounded driver collect (≤ numBuckets ints);
  *   3. read ONLY touched dirs, anti-join the batch's primary keys
  *      (removing every stored version, wherever it lives among the
  *      touched buckets), union the winners, dynamic-overwrite.
  * Replay-idempotent by construction (same winners, same removals);
  * the pipeline-level stale-batch gate guards ordering, same as the
  * primary replica. Projection schema is fixed at definition — evolve
  * by rebuild, the usual secondary-index discipline.
  */
class ProjectionSink(path: String, primaryKey: Seq[String], indexKey: String,
                     numBuckets: Int = 64) extends Serializable {

  private def root = new Path(path)
  private def fsOf(spark: SparkSession) =
    root.getFileSystem(spark.sessionState.newHadoopConf())

  private def bucketOf(c: org.apache.spark.sql.Column) =
    pmod(hash(c), lit(numBuckets))

  /** apply one batch; see class doc for the expected columns. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    require(batch.columns.contains("__old_idx"),
      "projection batch must carry __old_idx (the before-image index value)")
    // fail fast on u/d without a before-image index value — applying
    // them would strand the old row in an unknown bucket
    val blind = batch.filter(col("op").isin("u", "d") && col("__old_idx").isNull)
    require(blind.isEmpty,
      s"update/delete without a before-image $indexKey: the projection " +
        "requires REPLICA IDENTITY FULL (or the index key in the identity)")

    val w = Window.partitionBy(primaryKey.map(col): _*).orderBy(desc("lsn"))
    val winners = batch
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
    val payload = winners.filter(col("op") =!= "d")
      .drop("op", "lsn", "__old_idx")
      .withColumn("bucket", bucketOf(col(indexKey)))

    // ≤ 2·numBuckets ints: where stored versions may live (old values of
    // EVERY event — a mid-batch move leaves nothing behind) + where the
    // winners land
    val touched = batch.filter(col("__old_idx").isNotNull)
      .select(bucketOf(col("__old_idx")).as("b"))
      .union(payload.select(col("bucket").as("b")))
      .distinct().collect().map(_.getInt(0)).toSet

    val fs = fsOf(spark)
    val schema = StructType(payload.drop("bucket").schema)
    val touchedDirs = touched.toSeq.sorted
      .map(b => new Path(path, s"bucket=$b")).filter(fs.exists).map(_.toString)
    val next =
      if (touchedDirs.isEmpty) payload
      else {
        val cur = spark.read
          .schema(StructType(schema.fields :+ StructField("bucket", IntegerType)))
          .option("basePath", path).parquet(touchedDirs: _*)
        cur.join(winners.select(primaryKey.map(col): _*), primaryKey, "left_anti")
          .unionByName(payload)
      }
    val materialized = next
      .repartition(math.max(touched.size, 1), col("bucket"))
      .sortWithinPartitions(indexKey)
      .localCheckpoint(true)
    materialized.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket").parquet(path)
    // drained buckets keep a schema-carrying marker (same as the replica)
    val remaining = materialized.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    touched.filterNot(remaining).foreach { b =>
      materialized.drop("bucket").limit(0).repartition(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/bucket=$b")
    }
  }

  /** Bootstrap / rebuild: write the ENTIRE projection layout from a
    * snapshot of the base table (every row, no op/lsn bookkeeping) —
    * how a projection is first built over an existing replica, and the
    * documented recovery from a violated insert contract. One
    * bucket-partitioned write of the snapshot; subsequent CDC batches
    * maintain it incrementally via [[applyBatch]]. */
  def bootstrap(spark: SparkSession, snapshot: DataFrame): Unit = {
    require(snapshot.columns.contains(indexKey),
      s"snapshot lacks the index column $indexKey")
    val fs = fsOf(spark)
    if (fs.exists(root)) fs.delete(root, true)
    snapshot
      .withColumn("bucket", bucketOf(col(indexKey)))
      .repartition(numBuckets, col("bucket"))
      .sortWithinPartitions(indexKey)
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket").parquet(path)
    // an EMPTY snapshot writes no bucket dirs (partitionBy on an empty
    // frame emits only _SUCCESS) and a later lookup would fail schema
    // inference — leave the same schema-carrying marker truncate uses
    if (bucketDirs(spark).isEmpty)
      snapshot.drop("bucket").limit(0).repartition(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/bucket=0")
  }

  /** Point query on the index key: the bucket is constant-folded from
    * the literal, so exactly one dir of `numBuckets` is read; inside it
    * the index-sorted layout prunes row groups. */
  def lookup(spark: SparkSession, value: Any): DataFrame =
    spark.read.option("basePath", path).parquet(path)
      .filter(col("bucket") === pmod(hash(lit(value)), lit(numBuckets)))
      .filter(col(indexKey) === lit(value))
      .drop("bucket")

  private def bucketDirs(spark: SparkSession): Seq[Path] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map(_.getPath)
  }

  /** P6 parity for the secondary path: drop every projected row while
    * keeping the layout readable — a truncated base table must not keep
    * serving deleted rows through its projection (the reference
    * truncates every destination, sql_renderer.rs:300-320). Idempotent;
    * an empty schema-carrying marker keeps `lookup` planning. */
  def truncate(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    if (bucketDirs(spark).isEmpty) return
    val schema = StructType(spark.read.option("mergeSchema", "true")
      .option("basePath", path).parquet(path).drop("bucket").schema)
    bucketDirs(spark).foreach(d => fs.delete(d, true))
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/bucket=0")
  }

  /** Maintenance compaction: rewrite buckets fragmented past
    * `maxFilesPerBucket` into one index-sorted file each, via the same
    * committed-staging swap as the primary replica ([[recover]] heals a
    * crash mid-swap). Run OFFLINE. Returns the compacted bucket ids. */
  def compact(spark: SparkSession, maxFilesPerBucket: Int = 4): Seq[Int] = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) return Seq.empty
    recover(spark)
    val fragmented = bucketDirs(spark)
      .map { d =>
        val b = d.getName.stripPrefix("bucket=").toInt
        (b, fs.listStatus(d).count(_.getPath.getName.endsWith(".parquet")))
      }
      .filter(_._2 > maxFilesPerBucket).map(_._1).sorted
    fragmented.foreach { b =>
      val dir = new Path(path, s"bucket=$b")
      val tmp = new Path(path, s"_compact_bucket=$b")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      spark.read.option("mergeSchema", "true").parquet(dir.toString)
        .repartition(1).sortWithinPartitions(indexKey)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.delete(dir, true)
      fs.rename(tmp, dir)
    }
    fragmented
  }

  /** Finish (or undo) a compaction swap a crash interrupted: a committed
    * staging dir (`_SUCCESS` present) always rolls FORWARD over any
    * partially-deleted original; a partial staging dir rolls back. Safe
    * whenever the projection is offline; [[compact]] calls it first. */
  def recover(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_compact_bucket="))
      .foreach { t =>
        val dst = new Path(path, t.getPath.getName.stripPrefix("_compact_"))
        if (fs.exists(new Path(t.getPath, "_SUCCESS"))) {
          if (fs.exists(dst)) fs.delete(dst, true)
          fs.rename(t.getPath, dst)
        } else fs.delete(t.getPath, true)
      }
  }
}

/** A declared secondary projection of a warehouse table, so pipeline-
  * level operations (the op="t" truncate wave, maintenance modes) can
  * reach every derived layout of a base table without the caller
  * wiring sinks by hand. `table` is the qualified warehouse name
  * ("schema.table" — the same key the truncate message carries). */
final case class ProjectionDef(table: String, primaryKey: Seq[String],
                               indexKey: String, numBuckets: Int = 64) {
  /** Layout convention: projections live under the warehouse root in an
    * underscore dir (invisible to table discovery), one per index key. */
  def path(rootPath: String): String = s"$rootPath/_proj/$table/$indexKey"
  def sink(rootPath: String): ProjectionSink =
    new ProjectionSink(path(rootPath), primaryKey, indexKey, numBuckets)
}
