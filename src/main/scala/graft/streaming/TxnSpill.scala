package graft.streaming

import graft.model.{CdcEvent, CdcSchema}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Disk-spilled transaction resolution for ARBITRARILY LARGE streamed
  * transactions — the distributed analog of the reference's per-tx disk
  * segments (transaction_manager.rs writes 8 MB-buffered per-transaction
  * segment files; SURVEY §6's capacity target is a 3M-row single
  * transaction).
  *
  * `TxnAssembler` holds a transaction's events in keyed executor state:
  * right for OLTP-sized transactions, wrong for bulk loads, where one
  * txid's buffer = the whole load. Here NO events are held in state at
  * all: unresolved DML parks under `spill/pending/txid=X/` — the same
  * per-transaction file layout as the reference's `{txid}_{seq:06}.sql`
  * segments — and each micro-batch is APPEND-ONLY:
  *   - new unresolved DML appends new files into its txid dir (existing
  *     files are never rewritten — write volume per trigger is O(new
  *     events), not O(all pending), no matter how long a huge
  *     transaction stays in flight);
  *   - a Commit/StreamCommit/CommitPrepared seals its txid: ONLY that
  *     txid's dir is read (plus the batch's own DML) and flows out for
  *     apply — seal cost is O(sealed tx), not O(all pending);
  *   - StreamAbort/RollbackPrepared marks its dir for deletion;
  *   - `commit()` (call AFTER the apply succeeded) deletes the resolved
  *     txid dirs — a handful of directory removes, no data rewrite.
  *
  * Crash-safety contract: callers must `apply` the sealed output BEFORE
  * calling `commit()`. A crash between the two replays the batch: the
  * same control events re-seal the same pending dirs, and the idempotent
  * MERGE apply absorbs the re-apply. A crash before the apply replays
  * the batch too, which re-APPENDS its parked rows — the seal therefore
  * de-duplicates on (txid, lsn), the WAL's own identity, so a row parked
  * twice seals once. Envelope-marked events (isFinalBatch) are their own
  * seal and never touch the spill.
  */
object TxnSpill {

  private val Commits = Seq(TxnAssembler.Ctl.Commit, TxnAssembler.Ctl.StreamCommit,
    TxnAssembler.Ctl.CommitPrepared)
  private val Aborts = Seq(TxnAssembler.Ctl.StreamAbort,
    TxnAssembler.Ctl.RollbackPrepared)
  private val Dml = Seq("c", "u", "d", "t")

  final case class Resolved(ready: DataFrame, commit: () => Unit)

  private def pendingPath(dir: String) = new Path(dir, "pending")

  /** Envelope schema with txid as the (partition) column it becomes on
    * disk — files under `txid=X/` don't store the column itself. */
  private val pendingSchema: StructType = CdcSchema.envelope

  /** Resolve one micro-batch against the spill at `spillDir`. Returns the
    * sealed DML (ready for an idempotent apply, WAL lsn preserved) and a
    * `commit` thunk that deletes the resolved transactions' pending dirs
    * — call it ONLY after the apply succeeded. */
  def resolve(batch: Dataset[CdcEvent], spillDir: String): Resolved = {
    val spark = batch.sparkSession
    val fs = pendingPath(spillDir).getFileSystem(spark.sessionState.newHadoopConf())
    val df = batch.toDF()
    // control projections are tiny: one row per transaction RESOLVED in
    // this batch (not per pending transaction) — bounded driver collects
    val sealedTx = df.filter(col("op").isin(Commits: _*)).select("txid").distinct()
    val abortedTx = df.filter(col("op").isin(Aborts: _*)).select("txid").distinct()
    val sealedIds = sealedTx.collect().map(_.getLong(0)).toSeq.sorted
    val abortedIds = abortedTx.collect().map(_.getLong(0)).toSeq.sorted

    val dml = df.filter(col("op").isin(Dml: _*))
    val selfSealed = dml.filter(col("isFinalBatch"))
    val framed = dml.filter(!col("isFinalBatch"))

    // APPEND-ONLY park: this batch's still-unresolved framed DML goes
    // into new files under its txid dir; nothing existing is rewritten
    val newPark = framed
      .join(sealedTx, Seq("txid"), "left_anti")
      .join(abortedTx, Seq("txid"), "left_anti")
    // repartition by txid first: ONE file per in-flight txid per trigger
    // (not one per txid × shuffle partition) — a long-lived streamed tx
    // accumulates k files over k triggers, read once at seal. The
    // shuffle is O(new events), the small-files win is what keeps the
    // seal-time read cheap.
    newPark.repartition(col("txid"))
      .write.mode("append").partitionBy("txid")
      .parquet(pendingPath(spillDir).toString)

    // seal: batch DML of sealed txs + ONLY the sealed txids' pending dirs
    val sealedDirs = sealedIds
      .map(x => new Path(pendingPath(spillDir), s"txid=$x"))
      .filter(fs.exists).map(_.toString)
    val fromPending =
      if (sealedDirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], pendingSchema)
      else spark.read.schema(pendingSchema)
        .option("basePath", pendingPath(spillDir).toString)
        .parquet(sealedDirs: _*)
    val out = selfSealed
      .unionByName(framed.join(sealedTx, Seq("txid"), "left_semi"))
      .unionByName(fromPending.select(df.columns.map(col): _*))
      // (txid, lsn) is the WAL identity: a crash-replayed batch appends
      // its parked rows twice; the seal must still emit each event once
      .dropDuplicates("txid", "lsn")

    val commit = () => {
      (sealedIds ++ abortedIds).foreach { x =>
        val d = new Path(pendingPath(spillDir), s"txid=$x")
        if (fs.exists(d)) fs.delete(d, true)
      }
    }
    Resolved(out, commit)
  }

  /** Maintenance: fold a long-lived in-flight transaction's per-trigger
    * appended files into one per txid dir. Appends stay O(new events)
    * per trigger, but a transaction streaming across k triggers leaves k
    * files — harmless at seal time until k grows to thousands (listing +
    * open overhead). Offline discipline (no concurrent resolve on the
    * same spill): committed-staging swap, same as the replica's
    * compact — a crash leaves either the old files or the folded copy,
    * and re-running compactPending first (before resuming the stream)
    * heals an interrupted swap: a committed staging dir rolls forward,
    * a partial one rolls back. Returns the txids folded. */
  def compactPending(spark: SparkSession, spillDir: String,
                     maxFilesPerTxid: Int = 16): Seq[Long] = {
    val pending = pendingPath(spillDir)
    val fs = pending.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(pending)) return Seq.empty
    // heal any swap a crash interrupted (underscore dirs are invisible
    // to the seal — roll a committed fold forward so its rows reappear)
    fs.listStatus(pending).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("_fold_txid="))
      .foreach { t =>
        val dst = new Path(pending, t.getPath.getName.stripPrefix("_fold_"))
        if (fs.exists(new Path(t.getPath, "_SUCCESS"))) {
          // a committed fold always rolls FORWARD: the staging dir is the
          // one copy guaranteed complete, while a still-existing dst may
          // be a partially-deleted original (the recursive delete below
          // is not atomic) — same rule as ParquetReplicaSink.recover
          if (fs.exists(dst)) fs.delete(dst, true)
          fs.rename(t.getPath, dst)
        } else fs.delete(t.getPath, true)
      }
    val txDirs = fs.listStatus(pending).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("txid="))
    val folded = txDirs.flatMap { d =>
      val files = fs.listStatus(d.getPath)
        .filter(_.getPath.getName.endsWith(".parquet"))
      if (files.length <= maxFilesPerTxid) None
      else {
        val txid = d.getPath.getName.stripPrefix("txid=").toLong
        val tmp = new Path(pending, s"_fold_txid=$txid")
        if (fs.exists(tmp)) fs.delete(tmp, true)
        spark.read.schema(pendingSchema)
          .option("basePath", pending.toString)
          .parquet(d.getPath.toString)
          // the seal dedups on (txid, lsn) anyway; folding dedups early
          // so replay-appended duplicates stop occupying disk
          .dropDuplicates("txid", "lsn")
          .drop("txid") // partition column — not stored in files
          .repartition(1)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(d.getPath, true)
        fs.rename(tmp, d.getPath)
        Some(txid)
      }
    }
    folded.sorted
  }

  /** Maintenance: drop pending dirs of ABANDONED transactions — txids
    * whose producer died mid-transaction and whose seal can therefore
    * never arrive. The safe watermark is the slot's restart boundary
    * (`SlotReconcile`/flush-LSN): WAL below it is acknowledged, so a
    * commit for a transaction whose every parked event is older can no
    * longer be delivered. Without reaping, a 100 TB stream with
    * occasional dead txids grows the spill without bound (the
    * reference's file queue leaks the same way; its assembler timeout
    * is the in-memory analog of this). Returns the reaped txids. */
  def reapAbandoned(spark: SparkSession, spillDir: String,
                    watermarkLsn: Long): Seq[Long] = {
    val pending = pendingPath(spillDir)
    val fs = pending.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(pending)) return Seq.empty
    val txDirs = fs.listStatus(pending).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("txid="))
    val reaped = txDirs.flatMap { d =>
      val txid = d.getPath.getName.stripPrefix("txid=").toLong
      // one tiny read per candidate dir: the max lsn parked for the txid
      val maxLsn = spark.read.schema(pendingSchema)
        .option("basePath", pending.toString)
        .parquet(d.getPath.toString)
        .agg(max("lsn")).head().getLong(0)
      if (maxLsn < watermarkLsn) { fs.delete(d.getPath, true); Some(txid) }
      else None
    }
    reaped.sorted
  }

  /** The warehouse chain for large transactions: envelope → spill-based
    * sealing → per-table bucket-pruned MERGE. Same exactly-once contract
    * as `startWarehouse` (stale-batch gate + idempotent apply), with
    * executor memory bounded regardless of transaction size. */
  def startWarehouseSpill(envelope: DataFrame, rootPath: String,
                          checkpointDir: String, numBuckets: Int = 64,
                          trigger: org.apache.spark.sql.streaming.Trigger =
                            org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                          originFilter: OriginFilter = OriginFilter.Any,
                          projections: Seq[graft.sinks.ProjectionDef] = Nil)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    CdcPipeline.toAllEvents(envelope, originFilter)
      .writeStream
      .queryName("graft-warehouse-spill")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[CdcEvent], batchId: Long) =>
        val r = resolve(batch, s"$rootPath/_txspill")
        CdcPipeline.applyWarehouseBatch(
          r.ready.as[CdcEvent](CdcPipeline.eventEnc), rootPath, numBuckets,
          batchId, projections)
        r.commit()
      }
      .start()
  }
}
