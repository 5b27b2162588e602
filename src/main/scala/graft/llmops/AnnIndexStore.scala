package graft.llmops

import java.nio.charset.StandardCharsets.UTF_8
import graft.expressions.GraftFunctions
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED ANN serving indexes — the on-disk form of the `*Indexed`
  * paths in [[Similarity]], laid out so every per-probe read is real
  * parquet partition pruning, never a corpus scan:
  *
  *   root/vectors/part=P        (vec_id, [metaCols...,] qe, nq)
  *                                                 P = pmod(hash(id), NumParts)
  *   root/lsh_buckets/band=B/part=P (bucket, vec_id)  P = pmod(bucket, NumParts)
  *   root/ivf/cluster=C         (vec_id, qe, nq [, metaCols...])   posting
  *                                                 lists WITH their vectors
  *                                                 (classic IVF)
  *   root/ivf_centroids         (cluster, ce, nc)  K rows of index metadata
  *   root/_meta                 build parameters (seed/bands/bits/...)
  *
  * Serving cost per probe, in planned FILES (asserted in tests):
  *   - probe-vector fetch: ONE `vectors/part=P` dir — the bucket is
  *     constant-folded from the literal probe id (the replica-lookup
  *     trick, ParquetReplicaSink.lookup);
  *   - LSH candidates: `bands × |Hamming ball|` (band, part) dirs of the
  *     bucket index — the probe's bucket IN-lists are literals, so
  *     Catalyst partition-prunes the layout;
  *   - IVF members: the `nprobe` best `cluster=C` dirs only; centroids
  *     are a K-row read.
  * The candidate-vector gather (LSH) joins the id-keyed vectors store —
  * rows move, not the corpus; IVF needs no gather at all because the
  * posting lists carry their vectors.
  *
  * Build once offline, serve many: the same discipline as
  * [[LshIndexStore]] (dedup) and the warehouse replica.
  */
final class AnnIndexStore(root: String,
                          serveDeadBound: Long = AnnIndexStore.ServeDeadBound)
    extends Serializable {

  import AnnIndexStore.NumParts

  private def metaPath = new Path(root, "_meta")
  private def tombPath = new Path(root, "_tombstones")
  private def fsOf(spark: SparkSession) =
    metaPath.getFileSystem(spark.sessionState.newHadoopConf())

  /** Retraction: tombstone `ids` so serving never surfaces them again;
    * the rows are physically removed at the next [[compact]] (which
    * also clears the tombstones). Between delete and compact the
    * tombstone set is a driver-bounded id list (the same maintenance
    * cadence that bounds append file counts) — serving filters against
    * it, so correctness never waits on compaction. A tombstoned id
    * stays dead until compacted out; re-adding it is not supported
    * (fresh ids only, as with [[append]]).
    *
    * Each call appends one file; when the dir exceeds
    * [[AnnIndexStore.MaxTombstoneFiles]] files it is folded back to one
    * (committed-staging swap — a crash leaves either the old files or
    * the folded copy, and the next load heals an interrupted swap), so
    * a retraction-heavy period never accumulates unbounded small files
    * between compacts. */
  def delete(spark: SparkSession, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "delete: empty id set")
    import spark.implicits._
    healTombFold(spark)
    val fs = fsOf(spark)
    ids.toDF("vec_id").coalesce(1)
      .write.mode(if (fs.exists(tombPath)) "append" else "overwrite")
      .parquet(tombPath.toString)
    foldTombs(spark)
    tombCache = null // invalidate the memoized serve-path set
  }

  /** Distributed retraction: the id set never collects to the driver on
    * the WRITE path — a wide retraction (a whole source, a gap-spanning
    * corpus-sync removal) lands as a parquet tombstone dir straight
    * from the cluster, and the physical purge ([[compact]]) removes it
    * by anti-join, also driver-free. Only the SERVE-time filter
    * memoizes a driver set (retractions between compacts are bounded by
    * the same maintenance cadence that bounds append file counts) —
    * follow a wide retraction with [[compact]] to purge it physically,
    * as with [[TextIndexStore.delete]]. */
  def delete(spark: SparkSession, ids: DataFrame): Unit = {
    healTombFold(spark)
    val fs = fsOf(spark)
    ids.select(col(ids.columns.head).cast("long").as("vec_id"))
      .write.mode(if (fs.exists(tombPath)) "append" else "overwrite")
      .parquet(tombPath.toString)
    foldTombs(spark)
    tombCache = null
  }

  /** Fold the one-file-per-delete appends into a deduped set. The
    * write is AQE-sized, NOT `coalesce(1)`: a wide retraction's id set
    * must never funnel through a single task (the same no-driver-width
    * rule as the purge paths — here it was a single-WRITER width). The
    * trigger therefore measures APPENDS SINCE THE LAST FOLD (file
    * count minus the `_nfolded` marker's recorded output size), not
    * the absolute file count — a folded wide set legitimately spans
    * many files and must not re-fold O(n) on every subsequent delete. */
  private def foldTombs(spark: SparkSession): Unit = {
    val files = tombFiles(spark)
    if (files.size > AnnIndexStore.MaxTombstoneFiles + foldedFiles(spark)) {
      val fs = fsOf(spark)
      val staged = new Path(root, "_tombstones_fold")
      spark.read.parquet(files: _*).distinct()
        .write.mode("overwrite").parquet(staged.toString)
      val nOut = fs.listStatus(staged).count(s => s.isFile &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      val out = fs.create(new Path(staged, "_nfolded"), true)
      try out.write(nOut.toString.getBytes(UTF_8)) finally out.close()
      fs.delete(tombPath, true)
      fs.rename(staged, tombPath)
    }
  }

  /** The last fold's recorded output file count (0 before any fold). */
  private def foldedFiles(spark: SparkSession): Int = {
    val p = new Path(tombPath, "_nfolded")
    val fs = fsOf(spark)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), UTF_8).trim.toInt
      finally in.close()
    }
  }

  /** The tombstone dir's data files. Reads go through this explicit
    * file list because the dir itself is underscore-prefixed (hidden
    * from accidental partition discovery of the store root) — reading
    * the DIRECTORY path makes Spark's hidden-path filter warn "All
    * paths were ignored" on every load. */
  private def tombFiles(spark: SparkSession): Seq[String] =
    fsOf(spark).listStatus(tombPath).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)

  /** Roll an interrupted tombstone fold forward (committed staging wins)
    * or back (partial staging is discarded; the original is intact). */
  private def healTombFold(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    val staged = new Path(root, "_tombstones_fold")
    if (fs.exists(staged)) {
      if (fs.exists(new Path(staged, "_SUCCESS"))) {
        if (fs.exists(tombPath)) fs.delete(tombPath, true)
        fs.rename(staged, tombPath)
      } else fs.delete(staged, true)
    }
  }

  /** Memoized serve-time dead state: (distinct dead count, the id set
    * iff it fits under [[AnnIndexStore.ServeDeadBound]]) — loaded from
    * disk at most once per store instance between mutations
    * (delete/compact through THIS instance invalidate it; external
    * writers need a fresh instance, the same single-writer discipline
    * every maintenance verb here assumes). Serving a batch of probes
    * re-reads nothing. A WIDE pending retraction (count over the
    * bound) never collects: the serve paths switch to distributed
    * anti-joins until [[compact]] clears it. */
  @transient @volatile private var tombCache: (Long, Option[Set[Long]]) = _
  /** Observability for the spec: physical tombstone loads performed. */
  @transient private[graft] var tombLoads: Int = 0

  private def deadInfo(spark: SparkSession): (Long, Option[Set[Long]]) = {
    val cached = tombCache
    if (cached != null) cached
    else {
      healPurge(spark) // a fresh instance's first load heals a crashed purge
      healTombFold(spark)
      val files =
        if (!fsOf(spark).exists(tombPath)) Seq.empty else tombFiles(spark)
      val info =
        if (files.isEmpty) (0L, Some(Set.empty[Long]))
        else {
          val d = spark.read.parquet(files: _*).distinct()
          val n = d.count()
          if (n <= serveDeadBound)
            (n, Some(d.collect().map(_.getLong(0)).toSet))
          else (n, None)
        }
      tombLoads += 1
      tombCache = info
      info
    }
  }

  /** Distinct pending-tombstone count — the auto-compact trigger and
    * the `graft_index_tombstones` gauge read this; one memoized
    * metadata-sized job, never an id collect. */
  def tombstoneCount(spark: SparkSession): Long = deadInfo(spark)._1

  /** Serve-path tombstone filter: a broadcast anti-join on the memoized
    * bounded dead list (a no-op when nothing is tombstoned), or a
    * distributed anti-join when the pending dead set exceeds the bound
    * (wide retraction awaiting its compact). The bounded arm is a
    * one-column broadcast DataFrame, NOT an `isin` literal list: at the
    * ServeDeadBound ceiling an In over ~1M Literal children is built and
    * serialized on the driver for every serve plan, while the broadcast
    * ships the same ids once as data ([[TextIndexStore]]'s form). */
  private def dropDead(spark: SparkSession, df: DataFrame): DataFrame =
    deadInfo(spark) match {
      case (0L, _) => df
      case (_, Some(s)) =>
        import spark.implicits._
        df.join(broadcast(s.toSeq.toDF("vec_id")), Seq("vec_id"), "left_anti")
          .select(df.columns.map(col).toSeq: _*)
      case (_, None) => dropDeadDf(df, deadDf(spark))
    }

  /** Eager probe-liveness gate for the driver-bounded serve forms:
    * set membership under the bound, a distributed ids-only join above
    * it — the probe list itself is driver-bounded by contract. */
  private def requireLiveProbes(spark: SparkSession, ids: Seq[Long]): Unit =
    deadInfo(spark)._2 match {
      case Some(s) => require(!ids.exists(s),
        s"probe set contains tombstoned ids: ${ids.filter(s).take(5)}")
      case None =>
        import spark.implicits._
        require(!anyTombstoned(spark, ids.toDF("vec_id")),
          "probe set contains tombstoned ids")
    }

  /** The tombstones as a DataFrame (None when none exist). The PURGE
    * paths ([[compact]], [[rebuildIvf]]) anti-join against this instead
    * of collecting a driver set, so a wide retraction — written
    * distributed by the DataFrame [[delete]] — purges without ever
    * touching driver memory; only the serve-time filter keeps the
    * memoized bounded set. */
  private def deadDf(spark: SparkSession): Option[DataFrame] = {
    healTombFold(spark)
    if (!fsOf(spark).exists(tombPath)) None
    else {
      val files = tombFiles(spark)
      if (files.isEmpty) None
      else Some(spark.read.parquet(files: _*).select("vec_id"))
    }
  }

  private def dropDeadDf(df: DataFrame, dead: Option[DataFrame]): DataFrame =
    // re-select in the caller's column order: a USING-column join moves
    // the join key FIRST in its output, which silently corrupts
    // positional consumers (lshTopKBatch reads pairs by index)
    dead.fold(df)(d => df.join(d.select("vec_id").distinct(),
        Seq("vec_id"), "left_anti")
      .select(df.columns.map(col).toSeq: _*))

  /** Any of `ids` currently tombstoned — the corpus-sync's RESURRECTION
    * probe (a doc about to be re-added whose old tombstone would shadow
    * the fresh rows until a [[compact]] purges it). One ids-only join
    * against the tombstone files, never a driver set. */
  private[llmops] def anyTombstoned(spark: SparkSession,
                                    ids: DataFrame): Boolean =
    deadDf(spark).exists(_
      .join(ids.select(col(ids.columns.head).cast("long").as("vec_id")),
        Seq("vec_id"))
      .limit(1).count() > 0)

  /** Rebuild barrier: a (re)build over an existing root first DROPS the
    * old _meta, so a crash mid-build leaves a meta-less root that every
    * serve/append fails fast on ("missing meta") instead of the stale
    * meta silently describing half-overwritten layouts. Writing _meta
    * last (writeLsh/writeIvf) is then the commit point of the build. */
  private def clearMeta(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    if (fs.exists(metaPath)) fs.delete(metaPath, false)
    // a full (re)build starts a fresh intake history: stale applied
    // markers must not no-op a future addBatch that reuses a batch id
    Seq("_applied", "_intake").foreach { d =>
      val p = new Path(root, d)
      if (fs.exists(p)) fs.delete(p, true)
    }
  }

  private def writeMeta(spark: SparkSession, kv: Map[String, String]): Unit = {
    val out = fsOf(spark).create(metaPath, true)
    try out.write(kv.toSeq.sorted.map { case (k, v) => s"$k=$v" }
      .mkString("\n").getBytes(UTF_8))
    finally out.close()
  }

  private def readMeta(spark: SparkSession): Map[String, String] = {
    val in = fsOf(spark).open(metaPath)
    val txt = try new String(in.readAllBytes(), UTF_8) finally in.close()
    txt.linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
  }

  /** Quantize the corpus and write the id-part-pruned vectors store
    * (shared by both index kinds; probe fetches read ONE part dir).
    * `metaCols` ride along as plain columns — the store then supports
    * metadata-FILTERED serving (see the `where` params). */
  private def writeVectors(embeddings: DataFrame, idCol: String,
                           vecCol: String,
                           metaCols: Seq[String]): DataFrame = {
    val q = embeddings.select(
        col(idCol).as("vec_id") +: (metaCols.map(col) :+
          Similarity.quantize(col(vecCol)).as("qe")): _*)
      .withColumn("nq", Similarity.normQ(col("qe")))
    q.withColumn("part", pmod(hash(col("vec_id")), lit(NumParts)).cast("int"))
      .repartition(NumParts, col("part"))
      .write.mode("overwrite").partitionBy("part")
      .parquet(s"$root/vectors")
    q
  }

  /** The metadata columns this store was built with (empty for a plain
    * index). */
  private def metaColsOf(meta: Map[String, String]): Seq[String] =
    meta.getOrElse("metaCols", "").split(",").filter(_.nonEmpty).toSeq

  /** Build + persist the banded-LSH serving index. `metaCols` are
    * stored next to each vector, enabling filtered serving. */
  def writeLsh(embeddings: DataFrame,
               bands: Int = Similarity.DefaultBands,
               bitsPerBand: Int = Similarity.DefaultBitsPerBand,
               seed: Long = Similarity.DefaultSeed,
               idCol: String = "vec_id", vecCol: String = "embedding",
               metaCols: Seq[String] = Nil): Unit = {
    clearMeta(embeddings.sparkSession)
    val q = writeVectors(embeddings, idCol, vecCol, metaCols)
    Similarity.bandBuckets(q, bands, bitsPerBand, seed, "vec_id")
      .withColumn("part", pmod(col("bucket"), lit(NumParts)).cast("int"))
      .repartition(col("band"), col("part"))
      .write.mode("overwrite").partitionBy("band", "part")
      .parquet(s"$root/lsh_buckets")
    writeMeta(embeddings.sparkSession, Map(
      "kind" -> "lsh", "bands" -> bands.toString,
      "bitsPerBand" -> bitsPerBand.toString, "seed" -> seed.toString,
      "numParts" -> NumParts.toString,
      "metaCols" -> metaCols.mkString(",")))
  }

  /** Serve one probe from the persisted LSH index: the probe's buckets
    * (expanded to their Hamming-`radius` balls) become literal
    * (band, part, bucket-IN-list) predicates — partition pruning reads
    * O(bands · ball) index dirs. The surviving candidate set is bounded
    * (bands × ball × bucket occupancy), so its ids come back to the
    * driver and the rescore gather is a SECOND pruned read of the
    * vectors store — literal `part`/`vec_id` IN-lists, never a corpus
    * scan (the id→part bucket is recomputed in the same pruned job the
    * candidates come from, so it matches the write layout by
    * construction). */
  def lshTopK(spark: SparkSession, probeId: Long, k: Int,
              radius: Int = 1, where: Option[Column] = None): DataFrame = {
    requireLiveProbes(spark, Seq(probeId))
    val probe = probeVector(spark, probeId)
    // dead candidates drop BEFORE the collect, so the driver only ever
    // sees the live bounded candidate set
    val cand = dropDead(spark, lshCandidates(spark, probeId, radius))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    // metadata filter: the vectors store carries the declared metaCols,
    // so the predicate lands on the (already bounded) candidate gather
    // BEFORE scoring — filtered ANN may return < k when the filter is
    // selective; widen `radius` to deepen the candidate pool
    val cands = where.foldLeft(gatherVectors(spark, cand))(_.filter(_))
    score(cands, probe, probeId, k)
  }

  /** The pruned candidate read behind [[lshTopK]] — exposed
    * (package-private) so plan tests can assert the bucket-index scan's
    * partition pruning; the serving path collects it eagerly. Output:
    * (vec_id, part) — `part` is the candidate's id-hash part bucket,
    * recomputed here so the gather's IN-lists match the write layout by
    * construction. */
  private[graft] def lshCandidates(spark: SparkSession, probeId: Long,
                                   radius: Int): DataFrame = {
    val meta = readMeta(spark)
    require(meta.get("kind").contains("lsh"), s"$root is not an LSH index")
    val bands = meta("bands").toInt
    val bits = meta("bitsPerBand").toInt
    val seed = meta("seed").toLong
    // the probe's banded buckets: a 1-row job over the pruned fetch —
    // never an index scan by id (the bucket index has no id layout)
    val pB = probeVector(spark, probeId).select(
        posexplode(GraftFunctions.hyperplane_buckets(col("qe"), seed, bands, bits)))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val pred = pB.map { case (band, b) =>
      val ball = Similarity.hammingBall(b, bits, radius)
      col("band") === band &&
        col("part").isin(ball.map(x => (x % NumParts).toInt).distinct: _*) &&
        col("bucket").isin(ball: _*)
    }.reduce(_ || _)
    spark.read.parquet(s"$root/lsh_buckets")
      .filter(pred)
      .filter(col("vec_id") =!= probeId)
      .select(col("vec_id"),
        pmod(hash(col("vec_id")), lit(NumParts)).cast("int").as("part"))
      .distinct()
  }

  /** The pruned rescore gather: candidate ids (with their id-hash part
    * buckets) become literal IN-lists on the vectors store — planned
    * files are O(distinct candidate parts), asserted in
    * AnnIndexStoreSpec, instead of the whole `vectors/` layout. */
  private def gatherVectors(spark: SparkSession,
                            idParts: Seq[(Long, Int)]): DataFrame = {
    val base = spark.read.parquet(s"$root/vectors")
    if (idParts.isEmpty) base.limit(0).drop("part")
    else base
      .filter(col("part").isin(idParts.map(_._2).distinct: _*))
      .filter(col("vec_id").isin(idParts.map(_._1).distinct: _*))
      .drop("part")
  }

  /** Batch retrieval against the persisted LSH index: top-k for EVERY
    * probe id in ONE serving plan — the bulk companion of [[lshTopK]]
    * (eval-set retrieval, RAG corpus scoring), where a per-probe driver
    * loop would re-plan and re-scan per query.
    *
    * Same pruning discipline, amortized across the batch:
    *   - ONE pruned probe-vector fetch (id-part IN-lists);
    *   - ONE pruned bucket-index read covering the UNION of all probes'
    *     (band, part, bucket-ball) predicates, joined to the local
    *     probe→ball table to attribute candidates per probe;
    *   - ONE pruned gather of the union candidate set, then a per-probe
    *     window top-k (partitioned by probe — never a global sort).
    * Planned files = union of probed partitions (asserted in the spec).
    * Probe batches are driver-bounded (ids, buckets and candidate pairs
    * come to the driver) — thousands of probes, not a dataset-sized
    * join; for probe sets that are themselves a corpus, use
    * [[lshTopKBatchDistributed]] (no driver candidate materialization).
    *
    * Output: (pid, vec_id, dp, cosine, rank) — per probe, `rank` 1..k,
    * row-for-row equal to [[lshTopK]] of that probe (spec-asserted). */
  def lshTopKBatch(spark: SparkSession, probeIds: Seq[Long], k: Int,
                   radius: Int = 1, where: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val meta = readMeta(spark)
    require(meta.get("kind").contains("lsh"), s"$root is not an LSH index")
    require(probeIds.nonEmpty, "empty probe set")
    val bands = meta("bands").toInt
    val bits = meta("bitsPerBand").toInt
    val seed = meta("seed").toLong
    val probes = probeVectors(spark, probeIds)
    // every probe's banded buckets in one job over the pruned fetch,
    // then the Hamming balls expand on the driver: bounded by
    // |probes| · bands · C(bits, ≤radius)
    val pB = probes.select(col("vec_id").as("pid"),
        posexplode(GraftFunctions.hyperplane_buckets(col("qe"), seed, bands, bits)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val ball = pB.flatMap { case (pid, band, b) =>
      Similarity.hammingBall(b, bits, radius).map(bb => (pid, band, bb))
    }.distinct
    // one bucket-index read for the whole batch: per band, the union of
    // all probes' parts and buckets (the local ball table re-attributes
    // collisions to their probes — a cross-probe bucket hit is real: the
    // bucket genuinely contains candidates for both probes)
    val pred = ball.groupBy(_._2).map { case (band, rows) =>
      val buckets = rows.map(_._3).distinct
      col("band") === band &&
        col("part").isin(buckets.map(x => (x % NumParts).toInt).distinct: _*) &&
        col("bucket").isin(buckets: _*)
    }.reduce(_ || _)
    val ballDf = ball.toSeq.toDF("pid", "band", "bucket")
    requireLiveProbes(spark, probeIds)
    val pairs = dropDead(spark, spark.read.parquet(s"$root/lsh_buckets")
        .filter(pred)
        .join(broadcast(ballDf), Seq("band", "bucket"))
        .filter(col("vec_id") =!= col("pid"))
        .select(col("pid"), col("vec_id"),
          pmod(hash(col("vec_id")), lit(NumParts)).cast("int").as("part")))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val pairsDf = pairs.toSeq.toDF("pid", "vec_id", "part")
    // metadata filter on the gathered candidates (they carry metaCols),
    // before scoring/ranking — same contract as lshTopK's `where`
    val vecs = where.foldLeft(
      gatherVectors(spark, pairs.map(p => (p._2, p._3)).distinct))(_.filter(_))
    val pv = broadcast(probes.select(col("vec_id").as("pid"),
      col("qe").as("pe"), col("nq").as("np")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("cosine"), col("vec_id"))
    vecs.join(broadcast(pairsDf.drop("part")), "vec_id")
      .join(pv, "pid")
      .withColumn("dp", Similarity.dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("pid", "vec_id", "dp", "cosine", "rank")
  }

  /** CORPUS-SIZED batch retrieval against the persisted LSH index: the
    * probe set is itself a Dataset (eval-set contamination sweep,
    * full-corpus RAG scoring) and NOTHING probe- or candidate-sized
    * ever reaches the driver — the all-distributed companion of
    * [[lshTopKBatch]] (which collects probe buckets and candidate
    * pairs, bounded and faster for driver-sized probe sets).
    *
    * Shape: probe ids join the vectors store by id (one keyed shuffle);
    * each probe's band buckets expand to their Hamming-`radius` balls
    * as a LITERAL XOR-mask array (hammingBall(b) = hammingBall(0) ⊕ b,
    * so the C(bits,≤radius) masks are plan constants — the expansion is
    * a projection, not a driver enumeration); candidates come from ONE
    * (band, bucket)-keyed shuffle join against the full bucket index —
    * a corpus-sized probe sweep touches every bucket by definition, so
    * partition pruning is not the lever here, shuffle keying is; the
    * gather joins the vectors store by id; the per-probe top-k is a
    * pid-partitioned window. Every leaf of the plan is a file scan or
    * the caller's probe Dataset (spec-asserted — no LocalRelation, no
    * collect). Only the bounded tombstone id set rides the driver.
    *
    * Tombstoned PROBE ids yield no output rows (the driver-bounded form
    * rejects them eagerly; a distributed probe set is filtered instead).
    * Row-for-row equal to [[lshTopKBatch]] on the same live probe ids
    * (spec-asserted). Output: (pid, vec_id, dp, cosine, rank).
    *
    * `pairWhere` is a PER-PROBE pair predicate evaluated after the
    * candidate↔probe join but BEFORE scoring/ranking: candidate
    * metadata columns appear under their declared names, the probe's
    * under `p_<name>` — e.g. `col("label") =!= col("p_label")` turns
    * the sweep into distributed hard-negative mining (for every anchor,
    * nearest vectors with a DIFFERENT label), the contrastive-training
    * companion of the plain `where` filter. */
  def lshTopKBatchDistributed(probes: DataFrame, k: Int, radius: Int = 1,
                              where: Option[Column] = None,
                              pairWhere: Option[Column] = None,
                              idCol: String = "vec_id"): DataFrame = {
    val spark = probes.sparkSession
    val meta = readMeta(spark)
    require(meta.get("kind").contains("lsh"), s"$root is not an LSH index")
    val bands = meta("bands").toInt
    val bits = meta("bitsPerBand").toInt
    val seed = meta("seed").toLong
    val metaCols = metaColsOf(meta)
    val vecs = spark.read.parquet(s"$root/vectors").drop("part")
    // distinct: a caller-supplied probe Dataset may carry duplicate ids,
    // which would duplicate every candidate row and corrupt the
    // per-probe rank numbering
    val probeIds = probes.select(col(idCol).cast("long").as("vec_id")).distinct()
    val probeVecs = dropDead(spark,
        vecs.select((Seq("vec_id", "qe", "nq") ++ metaCols).map(col): _*)
          .join(probeIds, "vec_id"))
      .select(col("vec_id").as("pid") +: col("qe").as("pe") +:
        col("nq").as("np") +: metaCols.map(c => col(c).as(s"p_$c")): _*)
    // slim (pid, band, bucket) before the ball explosion so the wide
    // quantized arrays never multiply by bands × |ball|
    val masks = Similarity.hammingBall(0L, bits, radius)
    val ball = probeVecs
      .select(col("pid"),
        posexplode(GraftFunctions.hyperplane_buckets(col("pe"), seed, bands, bits)))
      .toDF("pid", "band", "bucket0")
      .select(col("pid"), col("band"),
        explode(array(masks.map(m => col("bucket0").bitwiseXOR(lit(m))): _*))
          .as("bucket"))
    val cand = spark.read.parquet(s"$root/lsh_buckets")
      .select("band", "bucket", "vec_id")
      .join(ball, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("pid"))
      .select("pid", "vec_id").distinct()
    val candVecs = where.foldLeft(dropDead(spark, vecs))(_.filter(_))
      .select((Seq("vec_id", "qe", "nq") ++ metaCols).map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("cosine"), col("vec_id"))
    pairWhere.foldLeft(
        cand.join(candVecs, "vec_id").join(probeVecs, "pid"))(_.filter(_))
      .withColumn("dp", Similarity.dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("pid", "vec_id", "dp", "cosine", "rank")
  }

  /** CORPUS-SIZED batch retrieval against the persisted IVF index — the
    * all-distributed companion of [[ivfTopKBatch]]. Centroids stay
    * driver-side (K rows of index METADATA, not candidates); each
    * probe's nprobe-best clusters are computed as a pure projection
    * over the literal centroid set (array_sort of (−cos, cluster)
    * structs — the same (cos desc, cluster asc) ranking, bitwise-equal
    * arithmetic, as the driver-side form), then ONE cluster-keyed
    * shuffle join against the posting lists (which carry their vectors
    * — still no gather) and a pid-partitioned window top-k. No probe or
    * candidate data touches the driver; every plan leaf is a file scan
    * or the probe Dataset (spec-asserted). Tombstoned probe ids yield
    * no rows. Output as [[ivfTopKBatch]], row-parity spec-asserted.
    * `pairWhere` as on [[lshTopKBatchDistributed]] — a per-probe pair
    * predicate over candidate metadata (declared names) vs probe
    * metadata (`p_<name>`), applied before scoring. */
  def ivfTopKBatchDistributed(probes: DataFrame, k: Int,
                              nprobe: Int = Similarity.DefaultIvfProbes,
                              where: Option[Column] = None,
                              pairWhere: Option[Column] = None,
                              idCol: String = "vec_id"): DataFrame = {
    val spark = probes.sparkSession
    val meta = readMeta(spark)
    require(meta.get("kind").contains("ivf"), s"$root is not an IVF index")
    val metaCols = metaColsOf(meta)
    val cents = loadCents(spark)
    val vecs = spark.read.parquet(s"$root/vectors").drop("part")
    // distinct: duplicate probe ids would corrupt per-probe ranks
    val probeIds = probes.select(col(idCol).cast("long").as("vec_id")).distinct()
    val probeVecs = dropDead(spark,
        vecs.select((Seq("vec_id", "qe", "nq") ++ metaCols).map(col): _*)
          .join(probeIds, "vec_id"))
      .select(col("vec_id").as("pid") +: col("qe").as("pe") +:
        col("nq").as("np") +: metaCols.map(c => col(c).as(s"p_$c")): _*)
    // (−cos, cluster) structs over the literal centroids: ascending
    // array_sort IS the (cos desc, cluster asc) driver ranking; the
    // arithmetic mirrors centroidCos term for term (exact integer dot,
    // sqrt(nc)·sqrt(np) product) so the cluster choice cannot diverge
    val scored = cents.map { c =>
      struct(
        (-(Similarity.dotQ(col("pe"), typedLit(c.ce)) * lit(1.0) /
          (lit(math.sqrt(c.nc.toDouble)) * sqrt(col("np").cast("double")))))
          .as("negCos"),
        lit(c.cluster).as("cl"))
    }
    val pc = probeVecs
      .select(col("pid"),
        explode(slice(array_sort(array(scored: _*)), 1, nprobe)).as("pc"))
      .select(col("pid"), col("pc.cl").as("cluster"))
    val members = where.foldLeft(
      dropDead(spark, spark.read.parquet(s"$root/ivf")))(_.filter(_))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("cosine"), col("vec_id"))
    pairWhere.foldLeft(
        members.join(pc, "cluster")
          .filter(col("vec_id") =!= col("pid"))
          .join(probeVecs, "pid"))(_.filter(_))
      .withColumn("dp", Similarity.dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("pid", "vec_id", "dp", "cosine", "rank")
  }

  /** CORPUS-SIZED batch retrieval against the persisted IVF-PQ index —
    * the all-distributed companion of [[pqTopK]], completing the
    * compressed serving tier for probe sets that are themselves a corpus
    * (full-corpus near-dup audits, distributed hard-negative mining at
    * 16–64× less candidate I/O than the plain-IVF sweep).
    *
    * The pqTopK pipeline, with every driver-bounded piece re-expressed
    * distributed:
    *   - cluster choice: the same literal-centroid (−cos, cluster)
    *     struct-sort projection as [[ivfTopKBatchDistributed]] —
    *     bitwise-equal to the driver ranking;
    *   - the probe LUT: instead of a driver `Map`, each probe row
    *     carries mSub `map<code,double>` columns computed ONCE per
    *     probe from the literal codebooks (ksub exact subspace dots per
    *     probe — the [[Similarity.pqLut]] arithmetic, term for term:
    *     integer dot then one IEEE division by sqrt(nc)); candidates
    *     never pay a per-pair full-width dot in the first pass;
    *   - ADC pass: ONE cluster-keyed shuffle join of the codes-only
    *     posting lists against the probes' cluster table, scored by
    *     fixed ascending-m LUT lookups (the [[Similarity.pqAdcScore]]
    *     sum order), cut to `shortlist` per probe by a pid-partitioned
    *     window — never a global sort;
    *   - rerank: the shortlist (|probes|·shortlist rows) joins the
    *     full-width vectors store on vec_id and reports TRUE cosines,
    *     top-k per probe. At corpus-sized probe sets the union of
    *     shortlists approaches the corpus, so one id-keyed shuffle join
    *     is the proportionate gather; for bounded probe sets the pruned
    *     driver-side [[pqTopK]] reads only O(shortlist parts).
    * No probe or candidate data touches the driver (no-LocalRelation
    * plan contract, spec-asserted); tombstoned probes/candidates yield
    * no rows. Output as [[ivfTopKBatchDistributed]]; per-pid row parity
    * with [[pqTopK]] is spec-asserted. `where`/`pairWhere` apply before
    * the shortlist cut, exactly where [[pqShortlist]] applies its
    * filter. */
  def pqTopKBatchDistributed(probes: DataFrame, k: Int,
                             nprobe: Int = Similarity.DefaultIvfProbes,
                             shortlist: Int = 50,
                             where: Option[Column] = None,
                             pairWhere: Option[Column] = None,
                             idCol: String = "vec_id"): DataFrame = {
    val spark = probes.sparkSession
    val meta = readMeta(spark)
    require(meta.get("kind").contains("ivfpq"), s"$root is not an IVF-PQ index")
    val mSub = meta("mSub").toInt
    val dim = meta("dim").toInt
    val dsub = dim / mSub
    val metaCols = metaColsOf(meta)
    val books = loadBooks(spark)
    val cents = loadCents(spark)
    val vecs = spark.read.parquet(s"$root/vectors").drop("part")
    // distinct: duplicate probe ids would corrupt per-probe ranks
    val probeIds = probes.select(col(idCol).cast("long").as("vec_id")).distinct()
    // per-probe LUT columns: subspace m's map is code id → exact integer
    // dot(probe_m, ce) / sqrt(nc) — the pqLut values, computed from qe
    // in the same select that renames it away
    val lutCols = (0 until mSub).map { m =>
      val bs = books.filter(_.m == m)
      val pm = slice(col("qe"), m * dsub + 1, dsub)
      map_from_arrays(
        array(bs.map(b => lit(b.cl)): _*),
        array(bs.map(b =>
          Similarity.dotQ(pm, typedLit(b.ce)) / lit(math.sqrt(b.nc.toDouble))): _*))
        .as(s"lut$m")
    }
    val probeVecs = dropDead(spark,
        vecs.select((Seq("vec_id", "qe", "nq") ++ metaCols).map(col): _*)
          .join(probeIds, "vec_id"))
      .select(col("vec_id").as("pid") +: col("qe").as("pe") +:
        col("nq").as("np") +: (lutCols ++
          metaCols.map(c => col(c).as(s"p_$c"))): _*)
    // nprobe-best clusters per probe — the ivfTopKBatchDistributed
    // literal-centroid projection, verbatim arithmetic
    val scored = cents.map { c =>
      struct(
        (-(Similarity.dotQ(col("pe"), typedLit(c.ce)) * lit(1.0) /
          (lit(math.sqrt(c.nc.toDouble)) * sqrt(col("np").cast("double")))))
          .as("negCos"),
        lit(c.cluster).as("cl"))
    }
    val pc = probeVecs
      .select(col("pid"),
        explode(slice(array_sort(array(scored: _*)), 1, nprobe)).as("pc"))
      .select(col("pid"), col("pc.cl").as("cluster"))
    // ADC pass over codes-only posting lists; fixed ascending-m sum
    // order mirrors pqAdcScore exactly
    val members = where.foldLeft(
      dropDead(spark, spark.read.parquet(s"$root/ivf")))(_.filter(_))
    val adc = (0 until mSub).map(m =>
        element_at(col(s"lut$m"), element_at(col("codes"), m + 1)))
      .reduceLeft(_ + _)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("adc"), col("vec_id"))
    val short = pairWhere.foldLeft(
        members.join(pc, "cluster")
          .filter(col("vec_id") =!= col("pid"))
          .join(probeVecs, "pid"))(_.filter(_))
      .withColumn("adc", adc)
      .withColumn("srank", row_number().over(ws))
      .filter(col("srank") <= shortlist)
      .select("pid", "vec_id", "pe", "np")
    // full-width rerank of the shortlist: true cosines, top-k per probe
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("cosine"), col("vec_id"))
    short.join(vecs.select("vec_id", "qe", "nq"), "vec_id")
      .withColumn("dp", Similarity.dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .withColumn("rank", row_number().over(wk).cast("bigint"))
      .filter(col("rank") <= k)
      .select("pid", "vec_id", "dp", "cosine", "rank")
  }

  /** Kind-dispatching distributed sweep — the operational entry behind
    * the `ann-sweep` maintenance verb: serve a probe DATASET against
    * whichever layout this store holds (LSH → `radius`, IVF →
    * `nprobe`, IVF-PQ → `nprobe` + `shortlist`).
    * Output: (pid, vec_id, dp, cosine, rank). */
  def sweepDistributed(probes: DataFrame, k: Int, radius: Int = 1,
                       nprobe: Int = Similarity.DefaultIvfProbes,
                       shortlist: Int = 50,
                       where: Option[Column] = None,
                       pairWhere: Option[Column] = None): DataFrame =
    readMeta(probes.sparkSession)("kind") match {
      case "lsh" => lshTopKBatchDistributed(probes, k, radius, where, pairWhere)
      case "ivf" => ivfTopKBatchDistributed(probes, k, nprobe, where, pairWhere)
      case "ivfpq" =>
        pqTopKBatchDistributed(probes, k, nprobe, shortlist, where, pairWhere)
      case kind => throw new IllegalArgumentException(s"unknown index kind $kind")
    }

  /** Which of `ids` are LIVE in the store — the doc-fate membership
    * probe: a `part IN (…) AND vec_id IN (…)` predicate (partition
    * pruning still reads only the ids' own `vectors/part=` dirs, the id
    * IN-list prunes rows inside them) instead of a reduced OR chain — a
    * long id list as a deep OR expression risks Catalyst planner stack
    * depth and defeats pruning. Tombstones excluded by anti-join BEFORE
    * the collect. */
  def hasDocs(spark: SparkSession, ids: Seq[Long]): Set[Long] = {
    if (ids.isEmpty || !fsOf(spark).exists(new Path(root, "vectors")))
      return Set.empty
    import spark.implicits._
    // the ids' part buckets via the same engine hash the writer used —
    // one local job over the driver-bounded id list, never a corpus read
    val parts = ids.toDF("id")
      .select(pmod(hash(col("id")), lit(NumParts)).cast("int").as("p"))
      .distinct().collect().map(_.getInt(0)).toSeq
    dropDeadDf(
      spark.read.parquet(s"$root/vectors")
        .filter(col("part").isin(parts: _*) && col("vec_id").isin(ids: _*))
        .select("vec_id").distinct(),
      deadDf(spark))
      .collect().map(_.getLong(0)).toSet
  }

  /** Every live (non-tombstoned) id in the store — the "self" probe set
    * of a full-corpus sweep (self-join contamination / near-dup audit). */
  def liveIds(spark: SparkSession): DataFrame =
    dropDead(spark, spark.read.parquet(s"$root/vectors").select("vec_id"))

  /** Stored vector rows (tombstoned INCLUDED) — the auto-compact
    * trigger's denominator. A zero-column count over parquet resolves
    * from footer row counts, never a data read. */
  def vectorCount(spark: SparkSession): Long =
    if (!fsOf(spark).exists(new Path(root, "vectors"))) 0L
    else spark.read.parquet(s"$root/vectors").count()

  /** Batch retrieval against the persisted IVF index: top-k for every
    * probe in ONE serving plan. Centroid ranking stays driver-side (the
    * centroid table IS index metadata); the member scan is ONE read
    * pruned to the UNION of all probes' nprobe clusters, re-attributed
    * per probe by the local (pid, cluster) table — posting lists carry
    * their vectors, so there is no gather join at all.
    * Output as [[lshTopKBatch]]; row-for-row equal to [[ivfTopK]].
    * For probe sets that are themselves a corpus, use
    * [[ivfTopKBatchDistributed]]. */
  def ivfTopKBatch(spark: SparkSession, probeIds: Seq[Long], k: Int,
                   nprobe: Int = Similarity.DefaultIvfProbes,
                   where: Option[Column] = None): DataFrame = {
    import spark.implicits._
    val meta = readMeta(spark)
    require(meta.get("kind").contains("ivf"), s"$root is not an IVF index")
    require(probeIds.nonEmpty, "empty probe set")
    requireLiveProbes(spark, probeIds)
    val cents = loadCents(spark)
    val probes = probeVectors(spark, probeIds).select("vec_id", "qe", "nq")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
    val probeClusters = probes.flatMap { case (pid, pe, np) =>
      cents.map(c => (Similarity.centroidCos(c.ce, c.nc, pe, np), c.cluster))
        .sortBy { case (cos, cl) => (-cos, cl) }
        .take(nprobe).map { case (_, cl) => (pid, cl) }
    }
    val pcDf = probeClusters.toSeq.toDF("pid", "cluster")
    val pvDf = probes.toSeq.toDF("pid", "pe", "np")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(desc("cosine"), col("vec_id"))
    where.foldLeft(dropDead(spark, spark.read.parquet(s"$root/ivf")
        .filter(col("cluster").isin(probeClusters.map(_._2).distinct: _*))))(
        _.filter(_))
      .join(broadcast(pcDf), Seq("cluster"))
      .filter(col("vec_id") =!= col("pid"))
      .join(broadcast(pvDf), "pid")
      .withColumn("dp", Similarity.dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("pid", "vec_id", "dp", "cosine", "rank")
  }

  /** Pruned multi-probe fetch: each probe id contributes a
    * constant-folded (part, vec_id) equality pair, so the batch fetch
    * plans only the probes' part dirs (the multi-id form of
    * [[probeVector]]). */
  private def probeVectors(spark: SparkSession, probeIds: Seq[Long]): DataFrame =
    spark.read.parquet(s"$root/vectors")
      .filter(probeIds.map(id =>
        col("part") === pmod(hash(lit(id)), lit(NumParts)) &&
          col("vec_id") === id).reduce(_ || _))
      .drop("part")

  /** Build + persist the IVF serving index: posting lists carry their
    * vectors (partitioned by cluster), centroids are K metadata rows. */
  def writeIvf(embeddings: DataFrame,
               nClusters: Int = Similarity.DefaultIvfClusters,
               dim: Int = 64, rounds: Int = 1,
               idCol: String = "vec_id", vecCol: String = "embedding",
               metaCols: Seq[String] = Nil): Unit = {
    val spark = embeddings.sparkSession
    clearMeta(spark)
    val q = writeVectors(embeddings, idCol, vecCol, metaCols)
    val (cents, assign) = Similarity.ivfIndex(q, nClusters, dim, "vec_id", rounds)
    assign.join(q, "vec_id")
      .select(Seq("vec_id", "qe", "nq", "cluster").map(col) ++
        metaCols.map(col): _*)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$root/ivf")
    import spark.implicits._
    // INVARIANT (loadCents memo): every overwrite of ivf_centroids /
    // pq_codebooks must emit FRESH part file names — Spark's parquet
    // writer stamps a new UUID per write, which is what keys the
    // centroid/codebook memo's invalidation (dirKey). A writer that
    // produced deterministic part names with unchanged lengths inside
    // mtime granularity would silently serve a stale memo.
    cents.toDF("cluster", "ce", "nc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/ivf_centroids")
    // build-time assignment quality: the baseline the per-append drift
    // numbers are judged against (rebuild-due telemetry)
    val (bm, bp) = driftStats(assign)
    writeMeta(spark, Map(
      "kind" -> "ivf", "nClusters" -> nClusters.toString,
      "dim" -> dim.toString, "numParts" -> NumParts.toString,
      "metaCols" -> metaCols.mkString(","),
      "drift_build_mean" -> f"$bm%.6f", "drift_build_p95" -> f"$bp%.6f"))
  }

  /** Build + persist the IVF-PQ serving index — the compressed tier for
    * corpora whose full vectors don't fit the serving layer (PQ codes
    * are mSub small ints per vector vs dim floats: 16–64×). Layout:
    *
    *   root/ivf/cluster=C      (vec_id, codes [, metaCols...]) — posting
    *                            lists carry CODES, not vectors
    *   root/pq_codebooks       (m, cl, ce, nc) — mSub·ksub metadata rows
    *   root/ivf_centroids      as writeIvf
    *   root/vectors/part=P     full-width vectors for the RERANK gather
    *                            (cheap-and-wide storage tier; only
    *                            shortlist rows are ever read from it)
    *
    * Codebooks train with the ivfIndex discipline (seed = lowest ids,
    * one integer-exact sum-centroid Lloyd round, cosine assignment) so
    * the whole build replays in oracle SQL. */
  def writeIvfPq(embeddings: DataFrame,
                 nClusters: Int = Similarity.DefaultIvfClusters,
                 mSub: Int = Similarity.DefaultPqSub,
                 ksub: Int = Similarity.DefaultPqK,
                 dim: Int = 64, rounds: Int = 1,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 metaCols: Seq[String] = Nil): Unit = {
    val spark = embeddings.sparkSession
    clearMeta(spark)
    val q = writeVectors(embeddings, idCol, vecCol, metaCols)
    val (cents, assign) = Similarity.ivfIndex(q, nClusters, dim, "vec_id", rounds)
    val books = Similarity.pqCodebooks(q, mSub, ksub, dim)
    val codes = Similarity.pqCodes(q, books, mSub, dim)
    assign.join(codes, "vec_id").join(q, "vec_id")
      .select(Seq("vec_id", "codes", "cluster").map(col) ++ metaCols.map(col): _*)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$root/ivf")
    import spark.implicits._
    // fresh-part-names invariant: see the note in writeIvf — these
    // overwrites key the loadCents/loadBooks memo invalidation
    cents.toDF("cluster", "ce", "nc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/ivf_centroids")
    books.map(b => (b.m, b.cl, b.ce, b.nc)).toDF("m", "cl", "ce", "nc")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/pq_codebooks")
    val (bm, bp) = driftStats(assign)
    writeMeta(spark, Map(
      "kind" -> "ivfpq", "nClusters" -> nClusters.toString,
      "mSub" -> mSub.toString, "ksub" -> ksub.toString,
      "dim" -> dim.toString, "numParts" -> NumParts.toString,
      "metaCols" -> metaCols.mkString(","),
      "drift_build_mean" -> f"$bm%.6f", "drift_build_p95" -> f"$bp%.6f"))
  }

  /** Index-ARTIFACT memo (centroids / codebooks): K-row driver tables
    * re-collected on every serve call before this — a parquet read +
    * collect JOB per query. Keyed on the artifact directory's file
    * listing (name, length, mtime): every rewrite
    * (writeIvf/writeIvfPq/rebuildIvf) emits fresh part file names, so
    * a rewrite can never serve a stale memo — the same
    * memoize-with-invalidation discipline as tombCache. These are
    * index metadata, not query results: the driver-run rule (every
    * invocation computes from the parquet inputs) is untouched, the
    * serve plan just stops re-reading a constant artifact. */
  @transient @volatile private var centsCache
      : (String, Array[Similarity.IvfCentroid]) = _
  @transient @volatile private var booksCache
      : (String, Seq[Similarity.PqCodeword]) = _

  private def dirKey(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    fsOf(spark).listStatus(p).map(st =>
      s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("|")
  }

  private[llmops] def loadCents(spark: SparkSession): Array[Similarity.IvfCentroid] = {
    val key = dirKey(spark, s"$root/ivf_centroids")
    val c = centsCache
    if (c != null && c._1 == key) c._2
    else {
      val arr = spark.read.parquet(s"$root/ivf_centroids").collect()
        .map(r => Similarity.IvfCentroid(r.getLong(0), r.getSeq[Long](1),
          r.getLong(2)))
      centsCache = (key, arr)
      arr
    }
  }

  private def loadBooks(spark: SparkSession): Seq[Similarity.PqCodeword] = {
    val key = dirKey(spark, s"$root/pq_codebooks")
    val c = booksCache
    if (c != null && c._1 == key) c._2
    else {
      val books = spark.read.parquet(s"$root/pq_codebooks").collect()
        .map(r => Similarity.PqCodeword(r.getInt(0), r.getLong(1),
          r.getSeq[Long](2), r.getLong(3))).toSeq.sortBy(b => (b.m, b.cl))
      booksCache = (key, books)
      books
    }
  }

  /** Serve one probe from the persisted IVF-PQ index: centroid ranking
    * prunes to `nprobe` posting dirs; the FIRST pass reads only
    * (vec_id, codes) of those dirs and ADC-scores against the probe's
    * LUT (mSub·ksub driver-metadata doubles); the `shortlist` best ids
    * gather their FULL vectors through the pruned id-part read (the
    * lshTopK gather idiom) and rerank exactly — reported scores are
    * true cosines. Per-probe reads, in planned files: nprobe cluster
    * dirs + O(shortlist parts) of the vectors store (spec-asserted). */
  def pqTopK(spark: SparkSession, probeId: Long, k: Int,
             nprobe: Int = Similarity.DefaultIvfProbes,
             shortlist: Int = 50, where: Option[Column] = None): DataFrame = {
    // shortlist ids (bounded) come to the driver with their id-hash
    // parts; the rerank gather is a literal-IN pruned read
    val ids = pqShortlist(spark, probeId, nprobe, shortlist, where)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    score(gatherVectors(spark, ids), probeVector(spark, probeId), probeId, k)
  }

  /** The ADC first pass behind [[pqTopK]] — exposed (package-private) so
    * plan tests can assert its cluster pruning and codes-only read;
    * output (vec_id, part), the shortlist in ADC order. */
  private[graft] def pqShortlist(spark: SparkSession, probeId: Long,
                                 nprobe: Int, shortlist: Int,
                                 where: Option[Column]): DataFrame = {
    val meta = readMeta(spark)
    require(meta.get("kind").contains("ivfpq"), s"$root is not an IVF-PQ index")
    val mSub = meta("mSub").toInt
    val dim = meta("dim").toInt
    requireLiveProbes(spark, Seq(probeId))
    val cents = loadCents(spark)
    val pRow = probeVector(spark, probeId).select("qe", "nq").head()
    val (pe, np) = (pRow.getSeq[Long](0), pRow.getLong(1))
    val probeClusters = cents
      .map(c => (Similarity.centroidCos(c.ce, c.nc, pe, np), c.cluster))
      .sortBy { case (cos, cl) => (-cos, cl) }
      .take(nprobe).map(_._2)
    val lut = Similarity.pqLut(pe, loadBooks(spark), mSub, dim)
    // ADC pass: cluster-pruned, codes-only (column pruning keeps the
    // wide metadata/vector bytes out of the scan) — the `where` filter
    // applies here, before the shortlist cut, like every filtered path
    where.foldLeft(
        dropDead(spark, spark.read.parquet(s"$root/ivf")
          .filter(col("cluster").isin(probeClusters: _*))
          .filter(col("vec_id") =!= probeId)))(_.filter(_))
      .withColumn("adc", Similarity.pqAdcScore(lut))
      .orderBy(desc("adc"), col("vec_id")).limit(shortlist)
      .select(col("vec_id"),
        pmod(hash(col("vec_id")), lit(NumParts)).cast("int").as("part"))
  }

  /** Serve one probe from the persisted IVF index: K centroid scores on
    * the driver pick `nprobe` clusters; the member scan is a literal
    * cluster IN-list — partition pruning reads only those posting dirs,
    * which already carry the vectors (no gather join at all). */
  def ivfTopK(spark: SparkSession, probeId: Long, k: Int,
              nprobe: Int = Similarity.DefaultIvfProbes,
              where: Option[Column] = None): DataFrame = {
    val meta = readMeta(spark)
    require(meta.get("kind").contains("ivf"), s"$root is not an IVF index")
    requireLiveProbes(spark, Seq(probeId))
    val cents = loadCents(spark)
    val probe = probeVector(spark, probeId)
    val pRow = probe.select("qe", "nq").head()
    val (pe, np) = (pRow.getSeq[Long](0), pRow.getLong(1))
    val probeClusters = cents
      .map(c => (Similarity.centroidCos(c.ce, c.nc, pe, np), c.cluster))
      .sortBy { case (cos, cl) => (-cos, cl) }
      .take(nprobe).map(_._2)
    // posting lists carry the declared metaCols, so a metadata filter
    // applies inside the cluster-pruned member scan — before scoring,
    // never post-top-k; widen `nprobe` when the filter is selective
    val members = where.foldLeft(
        spark.read.parquet(s"$root/ivf")
          .filter(col("cluster").isin(probeClusters: _*))
          .filter(col("vec_id") =!= probeId)
          .drop("cluster"))(_.filter(_))
    score(dropDead(spark, members), probe, probeId, k)
  }

  /** Incremental intake: add a batch of new vectors to the persisted
    * index WITHOUT a rebuild — append-only into the same pruned
    * layouts, so serving reads stay O(probed partitions) and the write
    * is O(batch).
    *
    * LSH: the new vectors' band buckets append under their
    * (band, part) dirs. IVF: new members are assigned to the EXISTING
    * centroids (a literal-centroid projection — the standard serving
    * practice; rebuild with [[writeIvf]] when drift warrants) and
    * append under their cluster dirs. Ids must be fresh — the store
    * has no replace semantics (a dedup gate belongs upstream). */
  def append(embeddings: DataFrame, idCol: String = "vec_id",
             vecCol: String = "embedding"): Unit = {
    val spark = embeddings.sparkSession
    val meta = readMeta(spark)
    val metaCols = metaColsOf(meta)
    require(metaCols.forall(embeddings.columns.contains),
      s"append batch must carry the store's metaCols $metaCols")
    val q = embeddings.select(
        col(idCol).as("vec_id") +: (metaCols.map(col) :+
          Similarity.quantize(col(vecCol)).as("qe")): _*)
      .withColumn("nq", Similarity.normQ(col("qe")))
    q.withColumn("part", pmod(hash(col("vec_id")), lit(NumParts)).cast("int"))
      .repartition(col("part"))
      .write.mode("append").partitionBy("part")
      .parquet(s"$root/vectors")
    meta("kind") match {
      case "lsh" =>
        Similarity.bandBuckets(q, meta("bands").toInt,
            meta("bitsPerBand").toInt, meta("seed").toLong, "vec_id")
          .withColumn("part", pmod(col("bucket"), lit(NumParts)).cast("int"))
          .repartition(col("band"), col("part"))
          .write.mode("append").partitionBy("band", "part")
          .parquet(s"$root/lsh_buckets")
      case kind @ ("ivf" | "ivfpq") =>
        val cents = loadCents(spark).toSeq
        val assign = Similarity.assignToCentroids(q, cents, "vec_id")
        val posting =
          if (kind == "ivf")
            assign.join(q, "vec_id")
              .select(Seq("vec_id", "qe", "nq", "cluster").map(col) ++
                metaCols.map(col): _*)
          else {
            // frozen codebooks code the new vectors, same as the frozen
            // centroids assign them — rebuild when drift warrants
            val codes = Similarity.pqCodes(q, loadBooks(spark),
              meta("mSub").toInt, meta("dim").toInt)
            assign.join(codes, "vec_id").join(q, "vec_id")
              .select(Seq("vec_id", "codes", "cluster").map(col) ++
                metaCols.map(col): _*)
          }
        posting
          .repartition(col("cluster"))
          .write.mode("append").partitionBy("cluster")
          .parquet(s"$root/ivf")
        // centroids are frozen at build time, so appended batches drift:
        // record this batch's assignment quality into _meta so the
        // ann-index maintenance verb can report when a rebuild is due
        val (m, p) = driftStats(assign)
        writeMeta(spark, meta ++ Map(
          "drift_appends" ->
            (meta.get("drift_appends").map(_.toInt).getOrElse(0) + 1).toString,
          "drift_last_mean" -> f"$m%.6f", "drift_last_p95" -> f"$p%.6f"))
      case k => throw new IllegalArgumentException(s"unknown index kind $k")
    }
  }

  /** Replay-IDEMPOTENT append — the streaming-intake form, the
    * [[TextIndexStore.addBatch]] contract mapped onto a store with no
    * per-batch dirs (appends interleave into the hash/bucket layouts,
    * so "Overwrite your own dir" is not available). Protocol, the
    * corpus-sync's attempt ledger generalized to batch ids:
    *
    *   `_applied/b<id>`  empty marker, written LAST — the commit point;
    *                     a batch id that already applied is a NO-OP
    *   `_intake/b<id>`   the batch's ids, written BEFORE the append —
    *                     a batch that CRASHED mid-append tombstones
    *                     exactly these ids and compacts them out before
    *                     re-appending (physical purge; rare, crash-only)
    *
    * Run it under `foreachBatch` and a replayed trigger after any crash
    * lands each vector exactly once (spec-pinned: streamed ≡ one-shot
    * build, double-apply no-op, crashed-append heal). The store must be
    * built first ([[writeLsh]]/[[writeIvf]]/[[writeIvfPq]] — usually
    * over the first batch); single-writer discipline as for every
    * mutation here. */
  def addBatch(embeddings: DataFrame, batchId: Long,
               idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    val spark = embeddings.sparkSession
    val fs = fsOf(spark)
    require(fs.exists(metaPath),
      s"$root has no _meta — build the store (writeLsh/writeIvf) before " +
        "streaming addBatch intake")
    val applied = new Path(root, s"_applied/b$batchId")
    val ledger = new Path(root, s"_intake/b$batchId")
    if (fs.exists(applied)) { // committed: replay is a no-op
      if (fs.exists(ledger)) fs.delete(ledger, true) // post-commit crash
      return
    }
    if (fs.exists(ledger) && SegPool.hasParquet(fs, ledger.toString)) {
      delete(spark, spark.read.parquet(ledger.toString))
      compact(spark)
    }
    // pin the batch so the recorded ids are EXACTLY the appended ids
    // (a recomputed non-deterministic input must not diverge between
    // the ledger write and the append)
    val e = embeddings.localCheckpoint(true)
    e.select(col(idCol).cast("long").as("vec_id"))
      .write.mode("overwrite").parquet(ledger.toString)
    append(e, idCol, vecCol)
    fs.create(applied, true).close()
    fs.delete(ledger, true)
  }

  /** Mean / p95 cosine DISTANCE (1 − cos) of an assignment to its
    * centroids — one partial aggregation over the batch. */
  private def driftStats(assign: DataFrame): (Double, Double) = {
    val r = assign.agg(
      avg(lit(1.0) - col("cos")),
      percentile_approx(lit(1.0) - col("cos"), lit(0.95), lit(10000))).head()
    (r.getDouble(0), r.getDouble(1))
  }

  /** The recorded centroid-drift telemetry, human-readable (None until
    * an IVF append has run): per-append mean/p95 distance-to-centroid
    * vs the build-time baseline. Rising numbers mean the frozen
    * centroids no longer describe the appended data — rebuild with
    * [[writeIvf]]. */
  def driftReport(spark: SparkSession): Option[String] = {
    val meta = readMeta(spark)
    meta.get("drift_last_mean").map { m =>
      s"drift: appends=${meta.getOrElse("drift_appends", "?")} " +
        s"last mean=$m p95=${meta.getOrElse("drift_last_p95", "?")} " +
        s"(build mean=${meta.getOrElse("drift_build_mean", "?")} " +
        s"p95=${meta.getOrElse("drift_build_p95", "?")})"
    }
  }

  /** True when the LAST append's assignment quality exceeded the build
    * baseline by `ratio` on mean OR p95 distance-to-centroid (no
    * appends yet → false). The decision input for [[rebuildIvf]]. */
  def driftExceeds(spark: SparkSession, ratio: Double): Boolean = {
    val meta = readMeta(spark)
    (for {
      lm <- meta.get("drift_last_mean"); bm <- meta.get("drift_build_mean")
      lp <- meta.get("drift_last_p95"); bp <- meta.get("drift_build_p95")
    } yield lm.toDouble > bm.toDouble * ratio ||
      lp.toDouble > bp.toDouble * ratio).getOrElse(false)
  }

  /** The drift-warranted recovery: re-cluster the WHOLE store (original
    * + appended vectors, tombstoned ids excluded) against fresh
    * centroids, overwrite the posting layout, and reset the drift
    * baseline — after this [[driftReport]] is empty until the next
    * append. The vectors store is reused in place; only the IVF layout
    * rebuilds (O(store) — an offline maintenance cost, vs O(batch)
    * appends between rebuilds). */
  def rebuildIvf(spark: SparkSession, rounds: Int = 1): Unit = {
    val meta = readMeta(spark)
    val kind = meta("kind")
    require(kind == "ivf" || kind == "ivfpq",
      s"$root is not an IVF-family index")
    val (nClusters, dim) = (meta("nClusters").toInt, meta("dim").toInt)
    val dead = deadDf(spark)
    // sever lineage from the dirs being overwritten; vectors/ itself is
    // only read, but ivfIndex consumes q several times
    val metaCols = metaColsOf(meta)
    val q = dropDeadDf(spark.read.parquet(s"$root/vectors").drop("part"), dead)
      .localCheckpoint(true)
    val (cents, assign) = Similarity.ivfIndex(q, nClusters, dim, "vec_id", rounds)
    import spark.implicits._
    val kindMeta: Map[String, String] =
      if (kind == "ivf") {
        assign.join(q, "vec_id")
          .select(Seq("vec_id", "qe", "nq", "cluster").map(col) ++
            metaCols.map(col): _*)
          .repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$root/ivf")
        Map.empty
      } else {
        // the compressed tier re-trains its codebooks over the SAME
        // drifted corpus the fresh centroids describe, then re-codes —
        // a rebuild that kept stale codebooks would fix cluster recall
        // while leaving the ADC ranking trained on the old distribution
        val (mSub, ksub) = (meta("mSub").toInt, meta("ksub").toInt)
        val books = Similarity.pqCodebooks(q, mSub, ksub, dim)
        val codes = Similarity.pqCodes(q, books, mSub, dim)
        assign.join(codes, "vec_id").join(q, "vec_id")
          .select(Seq("vec_id", "codes", "cluster").map(col) ++
            metaCols.map(col): _*)
          .repartition(col("cluster"))
          .write.mode("overwrite").partitionBy("cluster")
          .parquet(s"$root/ivf")
        books.map(b => (b.m, b.cl, b.ce, b.nc)).toDF("m", "cl", "ce", "nc")
          .coalesce(1).write.mode("overwrite").parquet(s"$root/pq_codebooks")
        Map("mSub" -> mSub.toString, "ksub" -> ksub.toString)
      }
    // fresh-part-names invariant: see the note in writeIvf — this
    // overwrite keys the loadCents memo invalidation
    cents.toDF("cluster", "ce", "nc").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/ivf_centroids")
    val (bm, bp) = driftStats(assign)
    writeMeta(spark, Map(
      "kind" -> kind, "nClusters" -> nClusters.toString,
      "dim" -> dim.toString, "numParts" -> NumParts.toString,
      "metaCols" -> metaCols.mkString(","),
      "drift_build_mean" -> f"$bm%.6f", "drift_build_p95" -> f"$bp%.6f") ++
      kindMeta)
  }

  // ------------------------------------------------------- selective purge

  private def purgeStageOf(layout: String) = new Path(root, s"_purge_$layout")
  private def purgeDoneOf(stage: Path) = new Path(stage, "_graft_purge_done")

  /** (affected dirs, untouched dirs) across layouts of the last
    * [[purge]] — the selectivity contract made observable. */
  @transient @volatile var lastPurge: (Int, Int) = (0, 0)
  /** Test hook: simulate a crash right after a layout's commit marker
    * lands (staging complete, no swap) — the window [[healPurge]] must
    * roll forward from. */
  @transient private[graft] var crashAfterCommit = false

  /** SELECTIVE physical purge — clear the pending tombstones by
    * rewriting ONLY the partition dirs that actually hold dead rows,
    * leaving every other dir's files byte-untouched ([[compact]]'s
    * whole-layout rewrite stays the file-count maintenance). Dead ids
    * hash straight to their `vectors/part=P` dirs (no scan at all);
    * the bucket/cluster layouts locate their affected dirs with one
    * column-pruned membership scan (vec_id + partition values — dir
    * names, not payload) that is read-only and tiny next to the
    * rewrite it avoids. A bounded or cluster-localized retraction then
    * rewrites a handful of dirs; a uniform corpus-wide one naturally
    * degrades to the full rewrite it genuinely needs.
    *
    * Driver-free like [[compact]]: the dead set anti-joins, only
    * partition VALUES collect (≤ dir-count rows, metadata). Crash-safe
    * per layout via a committed-staging manifest that rolls FORWARD
    * ([[healPurge]] — also run at the first tombstone load of a fresh
    * instance); tombstones clear only after the LAST layout, so any
    * crash window keeps the serve-time filter engaged and rankings
    * exact. Offline discipline as [[compact]]. Returns (affected,
    * untouched) dir counts. */
  def purge(spark: SparkSession): (Int, Int) = {
    healPurge(spark)
    val fs = fsOf(spark)
    val dead0 = deadDf(spark)
    if (dead0.isEmpty) { lastPurge = (0, 0); return lastPurge }
    val dead = dead0.get.distinct().localCheckpoint(false)
    val kind = readMeta(spark)("kind")
    val layouts: Seq[(String, Seq[String])] =
      ("vectors", Seq("part")) +: (kind match {
        case "lsh" => Seq(("lsh_buckets", Seq("band", "part")))
        case _ => Seq(("ivf", Seq("cluster")))
      })
    var aff = 0
    var unt = 0
    layouts.foreach { case (name, partCols) =>
      if (!crashAfterCommit || aff == 0) {
        val (a, u) = purgeLayout(spark, dead, name, partCols)
        aff += a; unt += u
      }
    }
    lastPurge = (aff, unt)
    if (crashAfterCommit) return lastPurge // test hook: die pre-swap
    fs.delete(tombPath, true)
    tombCache = null
    lastPurge
  }

  /** The layout's leaf partition dirs as relative paths
    * (`part=3`, `band=1/part=2`, `cluster=7`). */
  private def leafDirs(spark: SparkSession, dir: Path,
                       partCols: Seq[String]): Seq[String] = {
    val fs = fsOf(spark)
    partCols.foldLeft(Seq((dir, ""))) { case (parents, c) =>
      parents.flatMap { case (p, rel) =>
        fs.listStatus(p).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith(c + "="))
          .map(s => (s.getPath,
            if (rel.isEmpty) s.getPath.getName else rel + "/" + s.getPath.getName))
      }
    }.map(_._2)
  }

  private def purgeLayout(spark: SparkSession, dead: DataFrame,
                          name: String, partCols: Seq[String]): (Int, Int) = {
    val fs = fsOf(spark)
    val dir = new Path(root, name)
    if (!fs.exists(dir)) return (0, 0)
    val all = leafDirs(spark, dir, partCols)
    // WHICH dirs hold dead rows: vectors parts come straight from the
    // id hash (zero reads); bucket/cluster layouts from one
    // column-pruned membership scan. Collected rows are partition
    // VALUES — bounded by the dir count, never row data.
    val affected: Seq[String] = (
      if (name == "vectors")
        dead.select(pmod(hash(col("vec_id")), lit(NumParts)).cast("int")
            .as("part"))
          .distinct().collect().map(r => s"part=${r.getInt(0)}").toSeq
      else
        spark.read.parquet(dir.toString)
          .select((partCols :+ "vec_id").map(col): _*)
          .join(dead, "vec_id")
          .select(partCols.map(col): _*).distinct().collect()
          .map(r => partCols.zipWithIndex
            .map { case (c, i) => s"$c=${r.get(i)}" }.mkString("/")).toSeq
      ).filter(all.toSet).sorted
    if (affected.isEmpty) return (0, all.size)
    val stage = purgeStageOf(name)
    if (fs.exists(stage)) fs.delete(stage, true)
    dropDeadDf(spark.read.option("basePath", dir.toString)
        .parquet(affected.map(rel => new Path(dir, rel).toString): _*),
        Some(dead))
      .repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*)
      .parquet(stage.toString)
    // commit: the marker records affected dirs AND which were staged —
    // the swap (or a post-crash heal) is a pure function of it: staged
    // promotes, affected-but-unstaged (every row died) deletes. ATOMIC
    // as in TextIndexStore.commitSwapMarker: temp write + rename is the
    // commit point (a torn marker read as committed could delete a
    // LIVE dir whose rel path was truncated), and the '#end' terminator
    // lets the read side reject a torn legacy manifest as uncommitted.
    val staged = affected.filter(rel => fs.exists(new Path(stage, rel)))
    val tmp = new Path(stage, "_graft_purge_done.tmp")
    val out = fs.create(tmp, true)
    try out.write(((affected.mkString(",") +: staged) :+ "#end")
      .mkString("\n").getBytes(UTF_8))
    finally out.close()
    if (fs.exists(purgeDoneOf(stage))) fs.delete(purgeDoneOf(stage), false)
    require(fs.rename(tmp, purgeDoneOf(stage)),
      s"purge commit rename failed for layout $name")
    if (crashAfterCommit) return (affected.size, all.size - affected.size)
    finishLayoutSwap(spark, name)
    (affected.size, all.size - affected.size)
  }

  /** Complete a COMMITTED layout swap from its marker — idempotent
    * roll-forward (same discipline as [[TextIndexStore]]'s purge). */
  private def finishLayoutSwap(spark: SparkSession, name: String): Unit = {
    val fs = fsOf(spark)
    val stage = purgeStageOf(name)
    val dir = new Path(root, name)
    val in = fs.open(purgeDoneOf(stage))
    val lines = try new String(in.readAllBytes(), UTF_8).split("\n").toSeq
      finally in.close()
    // a manifest without the terminator (0-byte / torn legacy write) is
    // NOT a commit: discard the staging instead of rolling it forward —
    // tombstones are intact, so serving never needed this swap
    if (lines.size < 2 || lines.last != "#end") {
      fs.delete(stage, true); return
    }
    val affected = lines.head.split(",").filter(_.nonEmpty).toSeq
    val staged = lines.tail.dropRight(1).filter(_.nonEmpty).toSet
    affected.foreach { rel =>
      val tgt = new Path(dir, rel)
      val src = new Path(stage, rel)
      if (staged(rel)) {
        if (fs.exists(src)) { // not yet promoted
          if (fs.exists(tgt)) fs.delete(tgt, true)
          fs.mkdirs(tgt.getParent)
          fs.rename(src, tgt)
        }
      } else if (fs.exists(tgt)) fs.delete(tgt, true) // dir fully dead
    }
    fs.delete(stage, true)
  }

  /** Heal interrupted [[purge]] swaps: committed staging rolls forward,
    * uncommitted is discarded (tombstones are intact either way, so
    * serving never depended on the purge finishing). Tombstones left by
    * a crash between the last swap and their delete stay pending —
    * harmless (the serve filter keeps dropping them) — and clear on the
    * next purge/compact. */
  private def healPurge(spark: SparkSession): Unit = {
    val fs = fsOf(spark)
    Seq("vectors", "lsh_buckets", "ivf").foreach { name =>
      val stage = purgeStageOf(name)
      if (fs.exists(stage)) {
        if (fs.exists(purgeDoneOf(stage))) finishLayoutSwap(spark, name)
        else fs.delete(stage, true)
      }
    }
  }

  /** Maintenance: fold the files `append` accumulates back to ~one per
    * partition dir (k appends leave k files per touched dir; serving
    * correctness is unaffected but open/list overhead grows), and
    * physically remove tombstoned rows from every layout (the
    * tombstones themselves clear once all layouts are purged — a crash
    * mid-way leaves them in place, so serving keeps filtering and a
    * re-run finishes the purge). Offline discipline (no concurrent
    * append/serve); each layout rewrites via a committed-staging swap —
    * a crash leaves either the old files or the folded copy, and
    * re-running compact first heals an interrupted swap (committed
    * staging rolls FORWARD over a partially-deleted original, as
    * everywhere else in this library). For a purge-only maintenance
    * pass prefer [[purge]] — it rewrites only the dirs holding dead
    * rows. */
  def compact(spark: SparkSession): Unit = {
    healPurge(spark)
    val fs = fsOf(spark)
    val kind = readMeta(spark)("kind")
    val dead = deadDf(spark)
    val layouts: Seq[(String, Seq[String])] =
      ("vectors", Seq("part")) +: (kind match {
        case "lsh" => Seq(("lsh_buckets", Seq("band", "part")))
        case _ => Seq(("ivf", Seq("cluster")))
      })
    layouts.foreach { case (name, partCols) =>
      val dir = new Path(root, name)
      val staged = new Path(root, s"_compact_$name")
      // heal first: committed staging wins, partial staging rolls back
      if (fs.exists(staged)) {
        if (fs.exists(new Path(staged, "_SUCCESS"))) {
          if (fs.exists(dir)) fs.delete(dir, true)
          fs.rename(staged, dir)
        } else fs.delete(staged, true)
      }
      if (fs.exists(dir)) {
        val df = dropDeadDf(spark.read.parquet(dir.toString), dead)
        df.repartition(partCols.map(col): _*)
          .write.mode("overwrite").partitionBy(partCols: _*)
          .parquet(staged.toString)
        fs.delete(dir, true)
        fs.rename(staged, dir)
      }
    }
    // all layouts purged → the tombstones have been folded in; clearing
    // them last keeps serving correct across any crash window above
    if (dead.nonEmpty) fs.delete(tombPath, true)
    tombCache = null
  }

  /** The probe row via the constant-folded part bucket: hash(lit(id))
    * folds to a literal, so partition pruning reads exactly one
    * `vectors/part=P` dir (same trick as ParquetReplicaSink.lookup). */
  private def probeVector(spark: SparkSession, probeId: Long): DataFrame =
    spark.read.parquet(s"$root/vectors")
      .filter(col("part") === pmod(hash(lit(probeId)), lit(NumParts)))
      .filter(col("vec_id") === probeId)
      .drop("part")

  private def score(candidates: DataFrame, probe: DataFrame, probeId: Long,
                    k: Int): DataFrame = {
    val p = broadcast(probe.select(col("qe").as("pe"), col("nq").as("np")))
    candidates.crossJoin(p)
      .withColumn("dp", Similarity.dotQ(col("qe"), col("pe")))
      .withColumn("cosine",
        col("dp") * lit(1.0) / sqrt((col("nq") * col("np")).cast("double")))
      .select(col("vec_id"), col("dp"), col("cosine"))
      .orderBy(desc("cosine"), col("vec_id"))
      .limit(k)
  }
}

object AnnIndexStore {
  /** Sub-partition count for the id-hash (vectors) and bucket-mod
    * (lsh_buckets) layouts — bounds dir counts while keeping every
    * serving read O(probed partitions). */
  val NumParts = 64

  /** Fold threshold for the one-file-per-delete tombstone appends: past
    * this many files SINCE THE LAST FOLD the dir is rewritten (deduped,
    * AQE-sized) inside delete(), bounding both the file count and the
    * (memoized) load cost. */
  val MaxTombstoneFiles = 8

  /** Serve-path dead-set bound: at or under this many pending
    * tombstones the serve filter memoizes a driver id set (the cheap
    * steady-state — retractions between compacts are
    * maintenance-bounded); above it — a wide retraction awaiting its
    * compact — every serve anti-joins the tombstone files distributed
    * instead, so no retraction width can ever materialize on the
    * driver (the [[TextIndexStore.DefaultServeDeadBound]] twin). */
  val ServeDeadBound = 1000000L
}
