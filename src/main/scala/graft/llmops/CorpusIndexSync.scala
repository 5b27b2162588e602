package graft.llmops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keeps a durable [[TextIndexStore]] in exact sync with a
  * manifest-versioned frozen corpus (VersionedDir + SegPool) at
  * O(changed segments) cost — the serving-side sibling of the release
  * freeze's "reference, don't rewrite" discipline.
  *
  * The reference ships its replica to SEARCHABLE destinations and keeps
  * them current per change batch, never by re-export (consumer apply
  * loop, `pg2any-lib/src/consumer.rs`); this maps that obligation onto
  * the released corpus: after each release, search must reflect exactly
  * the docs of the CURRENT version without rebuilding the index.
  *
  * Mechanics. A release's manifest maps segment key → immutable pool
  * dir (pool parents are attempt-unique and never rewritten in place),
  * so two manifests diff EXACTLY by (key, rel):
  *   - same rel            → untouched: not read, not written;
  *   - rel changed         → rebuilt (a retraction filtered it):
  *                           removed = old∖new, added = new∖old;
  *   - key gone / key new  → whole segment removed / added;
  *   - id on BOTH sides    → REPLACED (retracted, later resubmitted
  *                           edited under its stable id): live, but its
  *                           old postings are tombstoned and compacted
  *                           away BEFORE the re-add — tombstones are
  *                           global by doc_id and would shadow the
  *                           fresh postings too. The same compact
  *                           clears an EARLIER sync's tombstone a
  *                           resurrected id would stay dead under.
  *                           Rare path, priced only when it happens.
  * Additions land as one `addBatch(batchId = targetVersion)` (Overwrite
  * — a crashed sync's retry rewrites its own dir, and batches ABOVE the
  * synced version are reclaimed up front: they can only be a crashed
  * attempt, and a retry targeting a later version would otherwise
  * double-index their docs); removals land as a tombstone dir
  * (duplicate-tolerant set) with corpus stats adjusted exactly through
  * the store's `_lens` table, so a synced index ranks bit-identically
  * to a fresh build over the current corpus (spec-pinned). The
  * `_corpus_version` marker commits LAST: any crash before it
  * re-enters the whole diff idempotently; a release that ran WITHOUT
  * the index flag is caught up by the next sync in one diff spanning
  * the gap (manifests for both ends must still be retained —
  * GRAFT_RELEASE_RETAIN — else the sync falls back to a STAGED full
  * rebuild, the documented cold path). */
object CorpusIndexSync {

  /** What a sync did: `mode` ∈ noop | diff | rebuild; `segsSkipped`
    * counts untouched segments (never read — the O(changed) claim,
    * spec-pinned); added/removed are doc counts. */
  case class SyncReport(from: Option[Long], to: Long, mode: String,
                        segsRead: Int, segsSkipped: Int,
                        added: Long, removed: Long)

  private def markerPath(idxPath: String) =
    new Path(idxPath, "_corpus_version")

  def syncedVersion(spark: SparkSession, idxPath: String): Option[Long] = {
    val p = markerPath(idxPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), UTF_8).trim.toLong)
      finally in.close()
    }
  }

  /** Rebuilds are STAGED: the new index builds beside the live one
    * (`<idx>._rebuild`), gets its version marker last, and only then
    * swaps in — the live index keeps serving through a multi-hour
    * rebuild, and a crash at any point leaves either the old index
    * (incomplete staging, discarded) or a promotable complete staging
    * (healed here on the next sync). */
  private def rebuildStagePath(idxPath: String) = new Path(idxPath + "._rebuild")

  private def healRebuild(spark: SparkSession, idxPath: String): Unit = {
    val stage = rebuildStagePath(idxPath)
    val fs = stage.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(stage)) return
    val stageMarker = new Path(stage, "_corpus_version")
    if (!fs.exists(stageMarker)) { fs.delete(stage, true); return }
    val in = fs.open(stageMarker)
    val stageV = try new String(in.readAllBytes(), UTF_8).trim.toLong
      finally in.close()
    // promote only a staging NEWER than the live index (a crash
    // between delete and rename left no live index at all — promote)
    if (syncedVersion(spark, idxPath).forall(_ < stageV)) {
      val live = new Path(idxPath)
      if (fs.exists(live)) fs.delete(live, true)
      fs.rename(stage, live)
    } else fs.delete(stage, true)
  }

  /** Bring the index at `idxPath` up to the corpus' CURRENT version.
    * No-op when already there or when no version is published yet. */
  def sync(spark: SparkSession, docsRoot: String, idxPath: String,
           numParts: Int = 64): SyncReport = {
    val fs = new Path(docsRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    healRebuild(spark, idxPath) // a crashed swap's complete staging wins
    val cur = VersionedDir.current(spark, docsRoot).getOrElse(
      return SyncReport(None, -1L, "noop", 0, 0, 0L, 0L))
    val curDir = VersionedDir.versionPath(docsRoot, cur)
    val synced = syncedVersion(spark, idxPath)
    if (synced.contains(cur))
      return SyncReport(synced, cur, "noop", 0, 0, 0L, 0L)
    val idx = new TextIndexStore(idxPath, numParts)
    def manifestOf(v: Long): Option[Map[String, String]] = {
      val d = VersionedDir.versionPath(docsRoot, v)
      if (!fs.exists(new Path(d, SegPool.ManifestName))) None
      else Some(SegPool.readManifest(fs, d).toMap)
    }
    def readRels(rels: Seq[String]): DataFrame = {
      // docs are read per-rel and pruned to (doc_id, text) before the
      // union — pool dirs may differ in multimodal extras
      val live = rels.map(r => s"$docsRoot/$r")
        .filter(SegPool.hasParquet(fs, _))
      if (live.isEmpty)
        spark.range(0).select(col("id").as("doc_id"), lit("").as("text"))
      else live.map(d => spark.read.parquet(d).select("doc_id", "text"))
        .reduce(_ unionByName _)
    }
    val report = (for {
      from <- synced
      oldM <- manifestOf(from) // None once the version left retention
      newM <- manifestOf(cur)
    } yield {
      val keys = (oldM.keySet ++ newM.keySet).toSeq.sorted
      val addRels = Seq.newBuilder[String]
      val delRels = Seq.newBuilder[String]
      var changedOld = Seq.empty[String]
      var changedNew = Seq.empty[String]
      var skipped = 0
      keys.foreach { k =>
        (oldM.get(k), newM.get(k)) match {
          case (Some(a), Some(b)) if a == b => skipped += 1
          case (Some(a), Some(b)) =>
            changedOld :+= a; changedNew :+= b
          case (Some(a), None) => delRels += a
          case (None, Some(b)) => addRels += b
        }
      }
      // a CRASHED sync attempt (marker never advanced) may have left
      // committed index batches above the synced version; they must go
      // before this diff applies, or its adds double-index those docs
      // under a second batch id
      idx.reclaimBatchesAbove(spark, from)
      // changed segments: a rebuild only ever filters, so added∖old is
      // empty in practice — computed anyway, bounded by the changed
      // segments' own rows (never the corpus)
      val changedOldDf = readRels(changedOld)
      val changedNewDf = readRels(changedNew)
      val added = readRels(addRels.result())
        .unionByName(changedNewDf
          .join(changedOldDf.select("doc_id"), Seq("doc_id"), "left_anti"))
        .localCheckpoint(true)
      // a doc RETRACTED and later RESUBMITTED EDITED under its stable
      // id (byte-identical resubmission never reaches the corpus — the
      // funnel's append-biased seen store suppresses it) appears on
      // BOTH sides of a gap-spanning diff: old seg rebuilt without it,
      // fresh seg carrying the new content. It is LIVE, but its OLD
      // postings must be physically purged before the re-add —
      // tombstones are global by doc_id and would shadow the fresh
      // postings too.
      val removedRaw = readRels(delRels.result()).select("doc_id")
        .unionByName(changedOldDf.select("doc_id")
          .join(changedNewDf.select("doc_id"), Seq("doc_id"), "left_anti"))
        .localCheckpoint(true)
      val replaced = removedRaw
        .join(added.select("doc_id"), Seq("doc_id")).localCheckpoint(true)
      val removed = removedRaw
        .join(added.select("doc_id"), Seq("doc_id"), "left_anti")
        .localCheckpoint(true)
      val (nAdd, nDel, nRep) =
        (added.count(), removed.count(), replaced.count())
      if (nAdd > 0) {
        // replacement and resurrection both need the shadowing state
        // gone BEFORE the add: tombstone the replaced ids' old
        // postings, then one compact purges them physically and clears
        // the whole dead set (including an EARLIER sync's tombstone a
        // resurrected id would otherwise stay shadowed by). Rare path
        // (edited resubmission), priced at one index fold only when it
        // actually happens.
        val dead = idx.deadSet(spark)
        val resurrecting = dead.nonEmpty && {
          import spark.implicits._
          added.select("doc_id")
            .join(broadcast(dead.toSeq.toDF("doc_id")), "doc_id")
            .limit(1).count() > 0
        }
        if (nRep > 0) idx.delete(spark, replaced)
        if (nRep > 0 || resurrecting) idx.compact(spark)
        idx.addBatch(spark, added, batchId = cur)
      }
      if (nDel > 0) idx.delete(spark, removed)
      SyncReport(synced, cur, "diff",
        segsRead = changedOld.size + changedNew.size + addRels.result().size
          + delRels.result().size,
        segsSkipped = skipped, added = nAdd, removed = nDel)
    }).getOrElse {
      // cold build, or the synced version's manifest left retention:
      // rebuild from the current corpus — O(corpus), the documented
      // fallback. STAGED: the live index serves untouched until the
      // complete staging (marker last) swaps in; the delete→rename
      // window is healed by the next sync's healRebuild
      val stage = rebuildStagePath(idxPath)
      val ifs = stage.getFileSystem(spark.sessionState.newHadoopConf())
      if (ifs.exists(stage)) ifs.delete(stage, true)
      val sIdx = new TextIndexStore(stage.toString, numParts)
      val docs = SegPool.readDocs(spark, curDir).select("doc_id", "text")
      sIdx.addBatch(spark, docs, batchId = cur)
      val n = sIdx.stats(spark)._1
      val out = ifs.create(new Path(stage, "_corpus_version"), true)
      try out.write(cur.toString.getBytes(UTF_8)) finally out.close()
      val live = new Path(idxPath)
      if (ifs.exists(live)) ifs.delete(live, true)
      ifs.rename(stage, live)
      SyncReport(synced, cur, "rebuild", segsRead = -1, segsSkipped = 0,
        added = n, removed = 0L)
    }
    // commit marker LAST: a crash anywhere above re-enters the whole
    // diff idempotently (addBatch Overwrites its own batch dir; the
    // tombstone set tolerates duplicates)
    val mp = markerPath(idxPath)
    val mfs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = mfs.create(mp, true)
    try out.write(cur.toString.getBytes(UTF_8)) finally out.close()
    report
  }
}
