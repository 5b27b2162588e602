package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The 100 TB-scale apply path: maintain a replica table as partitioned
  * parquet via MERGE semantics (the A2/A3 "VALUES-JOIN UPDATE" becomes a
  * real join, SURVEY §4).
  *
  * Each micro-batch: reduce the batch to one winner per key
  * (latest (lsn) wins — run-length squashing of the whole batch), then
  * join against the current snapshot: new keys appended, updated keys
  * replaced, deleted keys dropped. All shuffles are keyed on the replica
  * key, so at scale this is one hash-shuffle of the (small) batch plus a
  * co-partitioned join against the snapshot; with Delta/Iceberg this maps
  * 1:1 onto MERGE INTO (file-level pruning replacing the full rewrite).
  */
class ParquetReplicaSink(path: String, keyCols: Seq[String]) extends Serializable {

  /** batch: envelope rows flattened to (key..., payload columns, op, lsn). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(desc("lsn"))
    val winners = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    val current: Option[DataFrame] =
      try Some(spark.read.parquet(path)) catch { case _: Throwable => None }

    val next = current match {
      case None => winners.filter(col("op") =!= "d").drop("op", "lsn")
      case Some(cur) =>
        val survivors = cur.join(winners.select(keyCols.map(col): _*),
          keyCols, "left_anti")
        survivors.unionByName(
          winners.filter(col("op") =!= "d").drop("op", "lsn"))
    }
    // the new snapshot's lineage reads the path being overwritten —
    // localCheckpoint severs it (cache() could evict under pressure and
    // recompute mid-overwrite); Delta/Iceberg MERGE replaces this whole
    // read-modify-write at scale
    val materialized = next.localCheckpoint(eager = true)
    materialized.write.mode(SaveMode.Overwrite).parquet(path)
  }
}
