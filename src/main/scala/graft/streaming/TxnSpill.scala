package graft.streaming

import graft.model.{CdcEvent, CdcSchema}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Disk-spilled transaction resolution for ARBITRARILY LARGE streamed
  * transactions — the distributed analog of the reference's per-tx disk
  * segments (transaction_manager.rs writes 8 MB-buffered segment files;
  * SURVEY §6's capacity target is a 3M-row single transaction).
  *
  * `TxnAssembler` holds a transaction's events in keyed executor state:
  * right for OLTP-sized transactions, wrong for bulk loads, where one
  * txid's buffer = the whole load. Here NO events are held in state at
  * all: unresolved DML parks in a parquet spill area, and sealing is a
  * txid semi-join —
  *   - DML of transactions whose Commit/StreamCommit/CommitPrepared is
  *     visible (this batch or earlier spill) flows out for apply;
  *   - DML of aborted transactions is dropped;
  *   - everything else is REWRITTEN to the spill, whose size is bounded
  *     by in-flight transaction volume (exactly the reference's disk
  *     bound), not by executor memory.
  *
  * Crash-safety contract: callers must `apply` the sealed output BEFORE
  * calling `commit()` (which atomically swaps the spill). A crash
  * between the two replays the batch against the OLD spill — the same
  * sealed set recomputes, and the idempotent MERGE apply absorbs the
  * re-apply. Envelope-marked events (isFinalBatch) are their own seal
  * and never touch the spill.
  */
object TxnSpill {

  private val Commits = Seq(TxnAssembler.Ctl.Commit, TxnAssembler.Ctl.StreamCommit,
    TxnAssembler.Ctl.CommitPrepared)
  private val Aborts = Seq(TxnAssembler.Ctl.StreamAbort,
    TxnAssembler.Ctl.RollbackPrepared)
  private val Dml = Seq("c", "u", "d", "t")

  final case class Resolved(ready: DataFrame, commit: () => Unit)

  private def pendingPath(dir: String) = new org.apache.hadoop.fs.Path(dir, "pending")
  private def nextPath(dir: String) = new org.apache.hadoop.fs.Path(dir, "pending.next")

  private def readPending(spark: SparkSession, dir: String): DataFrame = {
    val p = pendingPath(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.schema(CdcSchema.envelope).parquet(p.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], CdcSchema.envelope)
  }

  /** Resolve one micro-batch against the spill at `spillDir`. Returns the
    * sealed DML (ready for an idempotent apply, WAL lsn preserved) and a
    * `commit` thunk that atomically replaces the spill with the still-
    * unresolved remainder — call it ONLY after the apply succeeded. */
  def resolve(batch: Dataset[CdcEvent], spillDir: String): Resolved = {
    val spark = batch.sparkSession
    val all = batch.toDF().unionByName(readPending(spark, spillDir),
      allowMissingColumns = true)
    // control projections are tiny (one row per transaction)
    val sealedTx = all.filter(col("op").isin(Commits: _*))
      .select("txid").distinct()
    val abortedTx = all.filter(col("op").isin(Aborts: _*))
      .select("txid").distinct()
    val dml = all.filter(col("op").isin(Dml: _*))
    val selfSealed = dml.filter(col("isFinalBatch"))
    val framed = dml.filter(!col("isFinalBatch"))
    val out = selfSealed.unionByName(
      framed.join(sealedTx, Seq("txid"), "left_semi"))
    // unresolved = framed DML with neither seal nor abort yet; aborts
    // themselves must survive in the spill ONLY until their DML is gone
    // (here: abort resolves in the same pass, so control rows never park)
    val remaining = framed
      .join(sealedTx, Seq("txid"), "left_anti")
      .join(abortedTx, Seq("txid"), "left_anti")
    // write the remainder NOW (to a side path) so `commit` is a pure
    // metadata swap — the data job runs before the caller's apply, the
    // rename after it
    val next = nextPath(spillDir)
    remaining.write.mode("overwrite").parquet(next.toString)
    val commit = () => {
      val conf = spark.sessionState.newHadoopConf()
      val fs = next.getFileSystem(conf)
      val dst = pendingPath(spillDir)
      if (fs.exists(dst)) fs.delete(dst, true)
      fs.rename(next, dst)
      ()
    }
    Resolved(out, commit)
  }

  /** The warehouse chain for large transactions: envelope → spill-based
    * sealing → per-table bucket-pruned MERGE. Same exactly-once contract
    * as `startWarehouse` (stale-batch gate + idempotent apply), with
    * executor memory bounded regardless of transaction size. */
  def startWarehouseSpill(envelope: DataFrame, rootPath: String,
                          checkpointDir: String, numBuckets: Int = 64,
                          trigger: org.apache.spark.sql.streaming.Trigger =
                            org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                          originFilter: OriginFilter = OriginFilter.Any)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    CdcPipeline.toAllEvents(envelope, originFilter)
      .writeStream
      .queryName("graft-warehouse-spill")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
        val r = resolve(batch, s"$rootPath/_txspill")
        CdcPipeline.applyWarehouseBatch(
          r.ready.as[CdcEvent](CdcPipeline.eventEnc), rootPath, numBuckets, batchId)
        r.commit()
      }
      .start()
  }
}
