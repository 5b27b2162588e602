package graft.sources

import graft.model.Lsn

/** Startup resume reconciliation (reference operator S2).
  *
  * Pure port of the reconcile decision table in
  * pg2any-lib/src/slot.rs:62-97: given the locally-checkpointed LSN and the
  * server-side replication-slot state, decide where to start streaming and
  * below which commit LSN to dedup-skip. In the Spark rebuild this backs the
  * streaming source's `initialOffset()`.
  */
object SlotReconcile {

  /** What `pg_replication_slots` said (None = query failed / slot gone). */
  final case class SlotState(confirmedFlushLsn: Option[Lsn], restartLsn: Option[Lsn],
                             active: Boolean)

  sealed trait ResumeSource
  case object FromSlot extends ResumeSource
  case object SlotDeletedFallback extends ResumeSource
  case object QueryFailedFallback extends ResumeSource
  case object Fresh extends ResumeSource

  /** start = where the server should begin sending; dedupBoundary = txs
    * with commitLsn <= this are already applied (F2 gate). */
  final case class Resume(startLsn: Option[Lsn], dedupBoundary: Option[Lsn],
                          source: ResumeSource)

  /** Decision table (slot.rs:62-97):
    *  - slot exists with confirmed LSN → start at confirmed;
    *    dedup boundary = max(disk checkpoint, confirmed)
    *  - slot exists, no confirmed LSN yet → start unset (server decides);
    *    dedup from disk
    *  - slot queried but missing → fall back to disk checkpoint
    *  - query failed → fall back to disk checkpoint
    *  - nothing anywhere → fresh start
    */
  def reconcile(disk: Option[Lsn], slot: Option[Option[SlotState]]): Resume =
    slot match {
      case Some(Some(s)) =>
        val boundary = (disk, s.confirmedFlushLsn) match {
          case (Some(d), Some(c)) => Some(if (d >= c) d else c)
          case (d, c) => c.orElse(d)
        }
        Resume(s.confirmedFlushLsn.orElse(disk), boundary, FromSlot)
      case Some(None) =>
        Resume(disk, disk, if (disk.isDefined) SlotDeletedFallback else Fresh)
      case None =>
        Resume(disk, disk, if (disk.isDefined) QueryFailedFallback else Fresh)
    }
}
