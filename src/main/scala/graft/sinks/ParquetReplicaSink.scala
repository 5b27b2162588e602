package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The 100 TB-scale apply path: maintain a replica table as hash-bucketed
  * parquet via MERGE semantics with partition pruning (the A2/A3
  * "VALUES-JOIN UPDATE" becomes a real join, SURVEY §4; MERGE intent of
  * the reference's coalescing.rs:644-871).
  *
  * Layout: `path/bucket=N/…` where `bucket = pmod(hash(key…), numBuckets)`.
  * Each micro-batch:
  *   1. squash the batch to one winner per key (latest lsn wins);
  *   2. compute the batch's TOUCHED buckets (≤ numBuckets driver-side ints);
  *   3. read ONLY those partitions (partition pruning — untouched buckets'
  *      files are never opened), anti-join + union the winners;
  *   4. dynamic-partition-overwrite: only touched partitions are rewritten,
  *      untouched buckets' files stay byte-identical on disk.
  *
  * Per-batch cost is therefore O(touched-bucket data + batch), NOT
  * O(snapshot): at 100 TB with numBuckets sized so a bucket is a few GB,
  * a small batch rewrites a few partitions instead of the whole table.
  * The `localCheckpoint` materializes only the touched buckets' next
  * state (it must, since their input files are about to be overwritten).
  * A bucket whose rows are all deleted is overwritten with an explicit
  * empty-but-schema'd file so reads of a drained table keep the schema.
  *
  * With Delta/Iceberg this maps 1:1 onto MERGE INTO with file-level
  * pruning; plain parquet + explicit buckets reproduces the same pruning
  * with no table-format dependency.
  */
class ParquetReplicaSink(path: String, keyCols: Seq[String], numBuckets: Int = 64)
    extends Serializable {

  private def withBucket(df: DataFrame): DataFrame =
    df.withColumn("bucket", pmod(hash(keyCols.map(col): _*), lit(numBuckets)))

  /** Current replica content without the bucket bookkeeping column.
    * mergeSchema: after schema evolution, bucket files differ — schema
    * must be the union, or columns only present in newer files would be
    * silently dropped when an older file seeds the inferred schema. */
  def snapshot(spark: SparkSession): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path).drop("bucket")

  /** batch: envelope rows flattened to (key..., payload columns, op, lsn). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc("lsn"))
    val winners = withBucket(batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn"))

    val current: Option[DataFrame] =
      try Some(spark.read.option("mergeSchema", "true").parquet(path))
      catch { case _: Throwable => None }

    current match {
      case None =>
        winners.filter(col("op") =!= "d").drop("op", "lsn")
          .write.mode(SaveMode.Overwrite).partitionBy("bucket").parquet(path)
      case Some(cur) =>
        // ≤ numBuckets ints — bounded driver collect, not data-sized
        val touched = winners.select("bucket").distinct()
          .collect().map(_.getInt(0)).sorted
        if (touched.isEmpty) return
        // partition pruning: only touched buckets' files are read
        val curTouched = cur.filter(col("bucket").isin(touched.map(Int.box): _*))
        val survivors = curTouched.join(
          winners.select(keyCols.map(col): _*), keyCols, "left_anti")
        // allowMissingColumns: schema evolution — a column added (or no
        // longer emitted) mid-stream fills null on the side lacking it
        // instead of failing the whole apply
        val next = survivors.unionByName(
          winners.filter(col("op") =!= "d").drop("op", "lsn"),
          allowMissingColumns = true)
        // repartition by bucket BEFORE materializing: without it each
        // shuffle partition writes a sliver into every touched bucket
        // dir (touched × partitions files per batch) and the replica
        // degenerates into a small-files swamp; with it a rewrite
        // leaves ~one well-sized file per bucket. Buckets are sized a
        // few GB (numBuckets chosen per table volume), so one task per
        // bucket is the right write granularity.
        // materialize the touched buckets' next state before overwriting
        // their input files — O(touched), not O(snapshot)
        val materialized = next
          .repartition(math.max(touched.length, 1), col("bucket"))
          .localCheckpoint(eager = true)
        materialized.write
          .mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(path)
        // dynamic overwrite writes nothing for a bucket that drained to
        // zero rows — overwrite those partition dirs with an explicit
        // empty (schema-carrying) file so stale rows don't survive
        val remaining = materialized.select("bucket").distinct()
          .collect().map(_.getInt(0)).toSet
        val payload = materialized.drop("bucket")
        touched.filterNot(remaining).foreach { b =>
          payload.limit(0).repartition(1)
            .write.mode(SaveMode.Overwrite).parquet(s"$path/bucket=$b")
        }
    }
  }

  /** Maintenance compaction: rewrite buckets whose file count exceeds
    * `maxFilesPerBucket` into one file each (schema unified to the
    * merged view). Normal MERGE rewrites already leave ~one file per
    * touched bucket; fragmentation accumulates from drained-bucket
    * markers and schema-evolution eras. Run this OFFLINE (no concurrent
    * applyBatch on the same table): it is a per-bucket overwrite, so a
    * crash mid-compact loses no rows — each bucket rewrite is all-or-
    * nothing and re-runnable. Returns the compacted bucket ids. */
  def compact(spark: SparkSession, maxFilesPerBucket: Int = 4): Seq[Int] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val fragmented = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket="))
      .map { s =>
        val b = s.getPath.getName.stripPrefix("bucket=").toInt
        val nFiles = fs.listStatus(s.getPath)
          .count(_.getPath.getName.endsWith(".parquet"))
        (b, nFiles)
      }
      .filter(_._2 > maxFilesPerBucket)
      .map(_._1).sorted
    fragmented.foreach { b =>
      val dir = s"$path/bucket=$b"
      val rows = spark.read.option("mergeSchema", "true").parquet(dir)
        .localCheckpoint(true) // materialize before overwriting its input
      rows.repartition(1).write.mode(SaveMode.Overwrite).parquet(dir)
    }
    fragmented
  }
}
