package graft.llmops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keeps the durable SERVING indexes — the BM25 [[TextIndexStore]] and
  * the vector [[AnnIndexStore]] — in exact sync with a
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
  *
  * Text index ([[sync]]): additions land as one
  * `addBatch(batchId = targetVersion)` (Overwrite — a crashed sync's
  * retry rewrites its own dir, and batches ABOVE the synced version are
  * reclaimed up front: they can only be a crashed attempt, and a retry
  * targeting a later version would otherwise double-index their docs);
  * removals land as a tombstone dir (duplicate-tolerant set) with
  * corpus stats adjusted exactly through the store's `_lens` table, so
  * a synced index ranks bit-identically to a fresh build over the
  * current corpus (spec-pinned).
  *
  * ANN index ([[syncAnn]]): the vector store has no per-batch dirs (its
  * appends interleave into hash/bucket layouts), so idempotency comes
  * from an ATTEMPT LEDGER instead: the ids about to be appended are
  * recorded under `_sync_attempt/v<target>` BEFORE the append, and a
  * retry that finds a ledger ABOVE the synced version tombstones
  * exactly those ids and compacts them out before re-applying — a
  * crashed append can never double-serve a vector. A ledger at or below
  * the synced version is a committed sync's leftover (crash between the
  * marker write and the ledger cleanup) and is simply dropped — its ids
  * are live by design and must NOT be purged. Removals ride the
  * DataFrame tombstone write (distributed — a wide retraction never
  * collects to the driver); a synced LSH index serves bit-identically
  * to a fresh build with the same hyperplane family (quantization and
  * bucketing are deterministic — spec-pinned); an IVF-family index
  * assigns appends to its FROZEN centroids, so sync keeps it exact on
  * membership while rank parity is governed by the store's own drift
  * telemetry (rebuild when exceeded — `ann-index` verb discipline).
  *
  * The `_corpus_version` marker commits LAST: any crash before it
  * re-enters the whole diff idempotently; a release that ran WITHOUT
  * the index flag is caught up by the next sync in one diff spanning
  * the gap (manifests for both ends must still be retained —
  * GRAFT_RELEASE_RETAIN — else the sync falls back to a STAGED full
  * rebuild, the documented cold path). */
object CorpusIndexSync {

  /** What a sync did: `mode` ∈ noop | diff | rebuild; `segsSkipped`
    * counts untouched segments (never read — the O(changed) claim,
    * spec-pinned); added/removed are doc counts. `skippedNullEmbed`
    * (ANN sync only) counts docs the delta carried with a NULL
    * embedding — they cannot be indexed (no quantizable vector) and
    * would otherwise be silently unsearchable while reported live, so
    * the sync skips them VISIBLY instead. */
  case class SyncReport(from: Option[Long], to: Long, mode: String,
                        segsRead: Int, segsSkipped: Int,
                        added: Long, removed: Long,
                        skippedNullEmbed: Long = 0L)

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

  private def writeMarker(spark: SparkSession, idxPath: String,
                          v: Long): Unit = {
    val mp = markerPath(idxPath)
    val mfs = mp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = mfs.create(mp, true)
    try out.write(v.toString.getBytes(UTF_8)) finally out.close()
  }

  /** Rebuilds are STAGED: the new index builds beside the live one
    * (`<idx>._rebuild`), gets its version marker last, and only then
    * swaps in — the live index keeps serving through a multi-hour
    * rebuild, and a crash at any point leaves either the old index
    * (incomplete staging, discarded) or a promotable complete staging
    * (healed here on the next sync). */
  private def rebuildStagePath(idxPath: String) = new Path(idxPath + "._rebuild")
  private def oldAsidePath(idxPath: String) = new Path(idxPath + "._old")

  private def healRebuild(spark: SparkSession, idxPath: String): Unit = {
    val stage = rebuildStagePath(idxPath)
    val fs = stage.getFileSystem(spark.sessionState.newHadoopConf())
    // rename-aside leftovers first: beside a live index the aside is a
    // completed swap's sweep debt (drop it); with no live index and no
    // COMPLETE staging it is the old index caught mid-swap — restore
    // it (a complete staging instead promotes below, and the staging
    // is always newer than the aside by the promote precondition)
    val aside = oldAsidePath(idxPath)
    if (fs.exists(aside)) {
      if (fs.exists(new Path(idxPath)) ||
          fs.exists(new Path(stage, "_corpus_version")))
        fs.delete(aside, true)
      else fs.rename(aside, new Path(idxPath))
    }
    if (!fs.exists(stage)) return
    val stageMarker = new Path(stage, "_corpus_version")
    if (!fs.exists(stageMarker)) { fs.delete(stage, true); return }
    val in = fs.open(stageMarker)
    val stageV = try new String(in.readAllBytes(), UTF_8).trim.toLong
      finally in.close()
    // promote only a staging NEWER than the live index (a crash
    // mid-swap left no live index at all — promote)
    if (syncedVersion(spark, idxPath).forall(_ < stageV))
      promoteRebuild(fs, idxPath)
    else fs.delete(stage, true)
  }

  /** Swap a COMPLETE staged rebuild (marker already inside) into place
    * — READER-SAFE: rename-aside (live → `._old`, staging → live,
    * sweep `._old`), never delete-then-rename. A concurrent serve's
    * unreadable window is two back-to-back atomic renames (O(1) on
    * the namenode), not a recursive delete of the whole old index
    * (O(files) — minutes at corpus scale, during which every reader
    * found no index). Crash anywhere: [[healRebuild]] restores the
    * aside when no live/staging supersedes it, or sweeps it. */
  private def promoteRebuild(fs: FileSystem, idxPath: String): Unit = {
    val live = new Path(idxPath)
    val aside = oldAsidePath(idxPath)
    if (fs.exists(aside)) fs.delete(aside, true) // prior swap's debt
    if (fs.exists(live)) fs.rename(live, aside)
    fs.rename(rebuildStagePath(idxPath), live)
    if (fs.exists(aside)) fs.delete(aside, true)
  }

  /** The doc-level delta between two manifests, with segment-level
    * pruning: `added` carries `cols`, `removed`/`replaced` are id-only;
    * all three are materialized (localCheckpoint) so callers apply them
    * without re-reading the corpus. */
  private case class Delta(added: DataFrame, removed: DataFrame,
                           replaced: DataFrame,
                           segsRead: Int, segsSkipped: Int,
                           nAdd: Long, nDel: Long, nRep: Long)

  private def manifestOf(spark: SparkSession, docsRoot: String,
                         v: Long): Option[Map[String, String]] = {
    val fs = new Path(docsRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val d = VersionedDir.versionPath(docsRoot, v)
    if (!fs.exists(new Path(d, SegPool.ManifestName))) None
    else Some(SegPool.readManifest(fs, d).toMap)
  }

  /** Read pool dirs pruned to `cols` ("doc_id" first) — pool dirs may
    * differ in multimodal extras, so each is pruned BEFORE the union;
    * `empty` supplies the zero-segment frame (schema-typed by caller). */
  private def readRels(spark: SparkSession, docsRoot: String,
                       rels: Seq[String], cols: Seq[String],
                       empty: => DataFrame): DataFrame = {
    val fs = new Path(docsRoot)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val live = rels.map(r => s"$docsRoot/$r")
      .filter(SegPool.hasParquet(fs, _))
    if (live.isEmpty) empty
    else live.map(d => spark.read.parquet(d).select(cols.map(col): _*))
      .reduce(_ unionByName _)
  }

  private def manifestDelta(spark: SparkSession, docsRoot: String,
                            oldM: Map[String, String],
                            newM: Map[String, String],
                            cols: Seq[String],
                            empty: => DataFrame): Delta = {
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
        case (None, None) => () // unreachable: keys = old ∪ new
      }
    }
    // changed segments: a rebuild only ever filters, so added∖old is
    // empty in practice — computed anyway, bounded by the changed
    // segments' own rows (never the corpus)
    val changedOldDf = readRels(spark, docsRoot, changedOld, cols, empty)
    val changedNewDf = readRels(spark, docsRoot, changedNew, cols, empty)
    val added = readRels(spark, docsRoot, addRels.result(), cols, empty)
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
    val removedRaw = readRels(spark, docsRoot, delRels.result(), cols, empty)
      .select("doc_id")
      .unionByName(changedOldDf.select("doc_id")
        .join(changedNewDf.select("doc_id"), Seq("doc_id"), "left_anti"))
      .localCheckpoint(true)
    val replaced = removedRaw
      .join(added.select("doc_id"), Seq("doc_id")).localCheckpoint(true)
    val removed = removedRaw
      .join(added.select("doc_id"), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    Delta(added, removed, replaced,
      segsRead = changedOld.size + changedNew.size + addRels.result().size
        + delRels.result().size,
      segsSkipped = skipped,
      nAdd = added.count(), nDel = removed.count(), nRep = replaced.count())
  }

  /** Bring the BM25 index at `idxPath` up to the corpus' CURRENT
    * version. No-op when already there or when no version is published
    * yet. `storePositions = false` builds/maintains a position-free
    * index (BM25-only serving at roughly half the bytes; phrase search
    * off) — the flag only seeds a FRESH index, the store's own
    * `_posmode` marker is the truth thereafter. */
  def sync(spark: SparkSession, docsRoot: String, idxPath: String,
           numParts: Int = 64, storePositions: Boolean = true): SyncReport = {
    healRebuild(spark, idxPath) // a crashed swap's complete staging wins
    val cur = VersionedDir.current(spark, docsRoot).getOrElse(
      return SyncReport(None, -1L, "noop", 0, 0, 0L, 0L))
    val curDir = VersionedDir.versionPath(docsRoot, cur)
    val synced = syncedVersion(spark, idxPath)
    if (synced.contains(cur))
      return SyncReport(synced, cur, "noop", 0, 0, 0L, 0L)
    val idx = new TextIndexStore(idxPath, numParts,
      storePositions = storePositions)
    def emptyText =
      spark.range(0).select(col("id").as("doc_id"), lit("").as("text"))
    val report = (for {
      from <- synced
      oldM <- manifestOf(spark, docsRoot, from) // None once out of retention
      newM <- manifestOf(spark, docsRoot, cur)
    } yield {
      // a CRASHED sync attempt (marker never advanced) may have left
      // committed index batches above the synced version; they must go
      // before this diff applies, or its adds double-index those docs
      // under a second batch id
      idx.reclaimBatchesAbove(spark, from)
      val d = manifestDelta(spark, docsRoot, oldM, newM,
        Seq("doc_id", "text"), emptyText)
      if (d.nAdd > 0) {
        // replacement and resurrection both need the shadowing state
        // gone BEFORE the add: tombstone the replaced ids' old
        // postings, then one SELECTIVE purge removes them physically
        // and clears the whole dead set (including an EARLIER sync's
        // tombstone a resurrected id would otherwise stay shadowed by)
        // — only the batches holding those docs rewrite, not the whole
        // index (a handful of edited resubmissions must not fold a
        // corpus-sized index). Probe is distributed (one ids-only
        // join) — a wide pending retraction never collects to the
        // driver here.
        val resurrecting = idx.anyTombstoned(spark, d.added.select("doc_id"))
        if (d.nRep > 0) idx.delete(spark, d.replaced)
        if (d.nRep > 0 || resurrecting) idx.purge(spark)
        idx.addBatch(spark, d.added, batchId = cur)
      }
      if (d.nDel > 0) idx.delete(spark, d.removed)
      SyncReport(synced, cur, "diff", segsRead = d.segsRead,
        segsSkipped = d.segsSkipped, added = d.nAdd, removed = d.nDel)
    }).getOrElse {
      // cold build, or the synced version's manifest left retention:
      // rebuild from the current corpus — O(corpus), the documented
      // fallback. STAGED: the live index serves untouched until the
      // complete staging (marker last) swaps in; the delete→rename
      // window is healed by the next sync's healRebuild
      val stage = rebuildStagePath(idxPath)
      val ifs = stage.getFileSystem(spark.sessionState.newHadoopConf())
      if (ifs.exists(stage)) ifs.delete(stage, true)
      val sIdx = new TextIndexStore(stage.toString, numParts,
        storePositions = storePositions)
      val docs = SegPool.readDocs(spark, curDir).select("doc_id", "text")
      sIdx.addBatch(spark, docs, batchId = cur)
      val n = sIdx.stats(spark)._1
      writeMarker(spark, stage.toString, cur)
      promoteRebuild(ifs, idxPath)
      SyncReport(synced, cur, "rebuild", segsRead = -1, segsSkipped = 0,
        added = n, removed = 0L)
    }
    // commit marker LAST: a crash anywhere above re-enters the whole
    // diff idempotently (addBatch Overwrites its own batch dir; the
    // tombstone set tolerates duplicates)
    writeMarker(spark, idxPath, cur)
    report
  }

  // ------------------------------------------------------------------
  // ANN index sync
  // ------------------------------------------------------------------

  private def attemptRoot(idxPath: String) = new Path(idxPath, "_sync_attempt")

  /** The attempt ledgers under the index (version → ids dir). */
  private def attemptLedgers(fs: FileSystem,
                             idxPath: String): Seq[(Long, Path)] = {
    val root = attemptRoot(idxPath)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .flatMap(s => scala.util.Try(
        s.getPath.getName.stripPrefix("v").toLong).toOption
        .map(_ -> s.getPath))
  }

  /** Bring the vector index at `idxPath` up to the corpus' CURRENT
    * version. The corpus must carry `embedCol` (array&lt;float&gt; —
    * the multimodal carry: embeddings ride the release funnel as a
    * non-core column and land in the frozen segments byte-intact);
    * a corpus without it fails fast. `kind` selects the cold-build
    * layout: "lsh" (default — deterministic bucketing, bit-exact parity
    * with a fresh build), "ivf" or "ivfpq" (`nClusters`; appends assign
    * — and for ivfpq, code — against the frozen build artifacts: run
    * rebuild-on-drift via the `ann-index` verb / the sync's drift knob). */
  def syncAnn(spark: SparkSession, docsRoot: String, idxPath: String,
              embedCol: String = "embedding", kind: String = "lsh",
              nClusters: Int = Similarity.DefaultIvfClusters): SyncReport = {
    require(kind == "lsh" || kind == "ivf" || kind == "ivfpq",
      s"unknown ann sync kind $kind")
    val fs = new Path(idxPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    healRebuild(spark, idxPath)
    val cur = VersionedDir.current(spark, docsRoot).getOrElse(
      return SyncReport(None, -1L, "noop", 0, 0, 0L, 0L))
    val curDir = VersionedDir.versionPath(docsRoot, cur)
    val synced = syncedVersion(spark, idxPath)
    val idx = new AnnIndexStore(idxPath)
    // settle attempt ledgers FIRST (even on the noop path): a ledger at
    // or below the synced version is a COMMITTED sync's leftover (crash
    // between the marker write and the ledger cleanup) — its ids are
    // live by design, drop the ledger and nothing else. A ledger ABOVE
    // the synced version is a crashed attempt whose append may have
    // landed: tombstone exactly its recorded ids and compact them out
    // (physical purge — appends interleave into the hash/bucket
    // layouts, so unlike the text index there is no batch dir to drop),
    // then re-enter the diff cleanly. Tombstone-of-absent-id is
    // harmless; the compact also clears it.
    val metaExists = fs.exists(new Path(idxPath, "_meta"))
    val ledgers = attemptLedgers(fs, idxPath)
    val (committedL, crashedL) =
      ledgers.partition(_._1 <= synced.getOrElse(-1L))
    committedL.foreach { case (_, p) => fs.delete(p, true) }
    crashedL.foreach { case (_, p) =>
      // metaExists guard: append requires _meta, so a ledger beside a
      // meta-less root records an append that can never have landed
      if (metaExists && SegPool.hasParquet(fs, p.toString)) {
        idx.delete(spark, spark.read.parquet(p.toString))
        // SELECTIVE: a crashed attempt's ids live in a handful of
        // hash/bucket dirs — purge rewrites only those, never the
        // whole store
        idx.purge(spark)
      }
      fs.delete(p, true)
    }
    if (synced.contains(cur))
      return SyncReport(synced, cur, "noop", 0, 0, 0L, 0L)
    def emptyVec = spark.range(0).select(col("id").as("doc_id"),
      lit(null).cast("array<float>").as(embedCol))
    def coldDocs(): DataFrame = {
      val docs = SegPool.readDocs(spark, curDir)
      require(docs.columns.contains(embedCol),
        s"corpus $curDir carries no '$embedCol' column — the ANN sync " +
          "indexes the embedding column the release funnel carries " +
          "(set GRAFT_ANN_EMBED_COL to its name)")
      docs.select(col("doc_id"), col(embedCol))
    }
    val report = (for {
      from <- synced
      if metaExists // marker without a built store: rebuild
      oldM <- manifestOf(spark, docsRoot, from) // None once out of retention
      newM <- manifestOf(spark, docsRoot, cur)
    } yield {
      val d = manifestDelta(spark, docsRoot, oldM, newM,
        Seq("doc_id", embedCol), emptyVec)
      // a doc riding the funnel WITHOUT an embedding (null column)
      // has no quantizable vector: appended it would count as live
      // (hasDocs/doc-fate) yet never be retrievable — skip it VISIBLY
      // (reported below) instead of indexing it silently-unsearchable
      val addable =
        if (d.nAdd == 0) d.added
        else d.added.filter(col(embedCol).isNotNull).localCheckpoint(true)
      val nAddable = if (d.nAdd == 0) 0L else addable.count()
      if (d.nAdd > 0) {
        // purge shadowing state before the add (replacement +
        // resurrection, as in the text sync) — both checks distributed
        val resurrecting = idx.anyTombstoned(spark, addable.select("doc_id"))
        if (d.nRep > 0) idx.delete(spark, d.replaced)
        if (d.nRep > 0 || resurrecting) idx.purge(spark)
        if (nAddable > 0) {
          // ATTEMPT LEDGER before the append: a crash mid-append leaves
          // the ids on record, and the retry purges exactly them
          val ledger = new Path(attemptRoot(idxPath), s"v$cur")
          addable.select("doc_id").write.mode("overwrite")
            .parquet(ledger.toString)
          idx.append(addable, idCol = "doc_id", vecCol = embedCol)
        }
      }
      if (d.nDel > 0) idx.delete(spark, d.removed)
      SyncReport(synced, cur, "diff", segsRead = d.segsRead,
        segsSkipped = d.segsSkipped, added = nAddable, removed = d.nDel,
        skippedNullEmbed = d.nAdd - nAddable)
    }).getOrElse {
      // cold build / out-of-retention / missing store: staged rebuild
      val stage = rebuildStagePath(idxPath)
      if (fs.exists(stage)) fs.delete(stage, true)
      val raw = coldDocs()
      // count(col) skips nulls: total + indexable in ONE pass, then the
      // null-embedding docs are excluded (and reported) as on the diff
      // path
      val cnt = raw.agg(count(lit(1)).as("all"),
        count(col(embedCol)).as("nonnull")).first()
      val (nAll, n) = (cnt.getLong(0), cnt.getLong(1))
      val docs = raw.filter(col(embedCol).isNotNull).localCheckpoint(true)
      val sIdx = new AnnIndexStore(stage.toString)
      if (kind == "lsh")
        sIdx.writeLsh(docs, idCol = "doc_id", vecCol = embedCol)
      else {
        // an empty (or all-null-embedding) corpus has no row to derive
        // dim from — fail with the actual condition, not an opaque
        // NoSuchElementException from head()
        val first = docs.select(size(col(embedCol))).limit(1).collect()
        require(first.nonEmpty,
          s"ann sync ($kind): corpus $curDir has no doc with a non-null " +
            s"'$embedCol' embedding — cannot derive the vector dim for " +
            "an IVF-family cold build")
        val dim = first(0).getInt(0)
        if (kind == "ivf")
          sIdx.writeIvf(docs, nClusters = nClusters, dim = dim,
            idCol = "doc_id", vecCol = embedCol)
        else
          sIdx.writeIvfPq(docs, nClusters = nClusters, dim = dim,
            idCol = "doc_id", vecCol = embedCol)
      }
      writeMarker(spark, stage.toString, cur)
      promoteRebuild(fs, idxPath)
      SyncReport(synced, cur, "rebuild", segsRead = -1, segsSkipped = 0,
        added = n, removed = 0L, skippedNullEmbed = nAll - n)
    }
    // commit marker LAST, then drop this sync's ledger — a crash
    // between the two leaves a committed-leftover ledger the next
    // entry drops without purging
    writeMarker(spark, idxPath, cur)
    val ledger = new Path(attemptRoot(idxPath), s"v$cur")
    if (fs.exists(ledger)) fs.delete(ledger, true)
    report
  }
}
