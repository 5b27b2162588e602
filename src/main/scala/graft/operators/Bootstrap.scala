package graft.operators

import graft.model.{CdcColumn, CdcEvent}
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/** Initial-snapshot bootstrap: the "switch a table over" workflow.
  *
  * A consistent snapshot (any DataFrame — a parquet export, a JDBC read,
  * `pg_export_snapshot` output) loads into the destination through the
  * SAME exactly-once applier and coalescer the CDC stream uses — so the
  * bulk-insert fast paths (multi-VALUES chunking, LOAD DATA TSV shape)
  * apply — and CDC catch-up then starts STRICTLY AFTER the snapshot LSN
  * via the source's `startLsn` option (its range reads are exclusive on
  * the lower bound, so nothing already contained in the snapshot is
  * re-applied; reference analog: the slot's confirmed_flush position at
  * snapshot export, slot.rs + lsn_tracker.rs).
  *
  * Values are type-erased to text exactly as logical decoding delivers
  * them (SURVEY §1.2) — the snapshot rows enter the identical render
  * path as streamed events, one code path to trust.
  */
object Bootstrap {

  implicit private val eventEnc: Encoder[CdcEvent] = Encoders.product[CdcEvent]

  /** Snapshot rows → INSERT events at `snapshotLsn` (all rows share the
    * snapshot's single consistent position). */
  def toInsertEvents(snapshot: DataFrame, schema: String, table: String,
                     keyCols: Seq[String], snapshotLsn: Long): Dataset[CdcEvent] = {
    val cols = snapshot.columns.toSeq
    val asText = snapshot.select(cols.map(c => col(c).cast("string").as(c)): _*)
    asText.map { row =>
      CdcEvent("c", snapshotLsn, 0L, null, schema, table, Nil,
        cols.indices.map(i => CdcColumn(cols(i),
          if (row.isNullAt(i)) null else row.getString(i))),
        keyColumns = keyCols)
    }
  }

  /** Load a snapshot through the exactly-once applier. Uses its OWN
    * batchId-gate namespace (`appId` should differ from the streaming
    * app's — e.g. "myapp-bootstrap"), so the CDC stream's epoch numbering
    * starting at 0 is not mistaken for a replay of the bootstrap batch.
    * Idempotent: re-running after a crash is gated exactly like a
    * replayed micro-batch. Returns the `startLsn` to hand the source. */
  def initialLoad(snapshot: DataFrame, schema: String, table: String,
                  keyCols: Seq[String], snapshotLsn: Long,
                  applier: graft.sinks.JdbcApplier): Long = {
    applier.init()
    applier.applyBatch(
      toInsertEvents(snapshot, schema, table, keyCols, snapshotLsn),
      batchId = 0L)
    snapshotLsn
  }

  /** Warehouse-side bootstrap: seed one table's hash-bucketed parquet
    * replica directly from the snapshot (a distributed write — THE bulk
    * path at 100 TB; no driver funnel). Catch-up then streams through
    * `startWarehouse` with the source's `startLsn = snapshotLsn`. */
  def initialLoadWarehouse(snapshot: DataFrame, path: String,
                           keyCols: Seq[String], snapshotLsn: Long,
                           numBuckets: Int = 64): Long = {
    import org.apache.spark.sql.functions.lit
    val asBatch = snapshot
      .withColumn("op", lit("c"))
      .withColumn("lsn", lit(snapshotLsn))
    new graft.sinks.ParquetReplicaSink(path, keyCols, numBuckets)
      .applyBatch(snapshot.sparkSession, asBatch, batchId = 0L)
    snapshotLsn
  }
}
