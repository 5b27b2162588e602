package graft.llmops

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming curation — the training-data INTAKE shape: document files
  * arrive as a stream, curated parquet leaves, and the final state equals
  * the batch `llm_curate` pipeline run over the same corpus (tested).
  *
  * The batch pipeline is quality gate → language gate → exact dedup →
  * LSH near-dedup (exact n-gram-Jaccard verified) → curated set. The
  * gates are stateless; the dedups need memory of everything already
  * admitted. That memory lives in an on-disk store (not executor state —
  * a 100 TB corpus's dedup index outgrows any state store):
  *
  *   store/seen/b<batchId>/    exact-kept hashes (doc_id, content_hash)
  *   store/text/b<batchId>/    exact-kept text    (doc_id, text)
  *   store/buckets/b<batchId>/ the LSH bucket index (bucket, doc_id)
  *   store/curated/b<batchId>/ the final curated additions
  *
  * Every trigger writes ONLY its own `b<batchId>` subdirs (mode
  * Overwrite), so a replayed epoch rewrites the same dirs with the same
  * content instead of appending duplicates — reads always exclude the
  * current batch's dirs, making the recompute deterministic. Per-trigger
  * cost: gates are O(new docs); exact dedup anti-joins the new docs'
  * hashes against the seen store (hash shuffle, map-side prunable);
  * near-dedup joins the new docs' LSH buckets against the bucket index
  * and exact-verifies only bucket-sharing pairs — O(new + collisions),
  * never an all-pairs pass.
  *
  * EVERY store the trigger reads is persisted PARTITIONED, so no
  * per-trigger read ever scans what has already been admitted:
  *   - `buckets/b<k>/part=P`, `part = pmod(hash(bucket), NumParts)` —
  *     pruned to the new docs' bucket parts;
  *   - `seen/b<k>/part=P`, `part = pmod(hash(content_hash), NumParts)` —
  *     the exact-dedup anti-join reads only the parts the new docs'
  *     hashes can land in (an equal prior hash is always in the same
  *     part, so the pruning is lossless);
  *   - `text/b<k>/part=P`, `part = pmod(hash(doc_id), NumParts)` — the
  *     Jaccard-verify corpus read fetches only the parts holding the
  *     store-side candidate doc_ids (O(collisions), not O(corpus)).
  * A trigger therefore lists ≤ NumParts ints per store and plans
  * O(touched + new) leaf dirs — the same pruning discipline as
  * [[LshIndexStore]] and the warehouse replica sink.
  *
  * Parity contract with batch `llm_curate` (kept-set equality) holds
  * when docs arrive in ascending doc_id order (the batch tie-break drops
  * the larger id of a near-dup pair; out-of-order arrival would need to
  * retract an already-emitted doc, which an append-only intake cannot).
  */
object StreamingCurate {

  /** Non-core input columns in their original order — the multimodal
    * carry set: a training corpus's image/audio payloads and metadata
    * structs ride every stage untouched while gating/dedup read only
    * `text`. */
  private def extraCols(docs: DataFrame): Seq[String] =
    docs.columns.toSeq.filterNot(Set("doc_id", "source", "text"))

  /** The batch curation gate — quality (length, stopword ratio) +
    * language-ID (en) — EXACTLY the expressions `llm_curate` uses (the
    * batch query calls this function, so they cannot drift). Gates on
    * `text` only; any OTHER input column (binary payloads, metadata
    * structs — the multimodal carry) passes through untouched. */
  def gate(docs: DataFrame): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in", "is")
    def cnt(m: String): Column = TextOps.occurrences(col("text"), m)
    // internals are __-prefixed so a multimodal carry column with a
    // plausible name (n_tokens, pred, …) is never silently replaced by
    // a gate intermediate on its way through the funnel.
    // Counting shapes (guide §4): token/stopword/marker counts run as
    // codegen'd byte passes (tokenCount/stopTokenCount/occurrences) —
    // the previous size(filter(split…)) stop count was an interpreted
    // higher-order function evaluated per token per row, the dominant
    // per-row cost of this gate.
    docs
      .withColumn("__n_tokens", TextOps.tokenCount(col("text")))
      .withColumn("__n_stop", TextOps.stopTokenCount(col("text"), stop))
      .withColumn("__s_en", cnt(" the ") + cnt(" and ") + cnt(" of "))
      .withColumn("__s_de", cnt(" der ") + cnt(" und ") + cnt(" die "))
      .withColumn("__s_fr", cnt(" le ") + cnt(" et ") + cnt(" la "))
      .withColumn("__s_es", cnt(" el ") + cnt(" los ") + cnt(" las "))
      .withColumn("__pred",
        when(col("__s_en") >= col("__s_de") && col("__s_en") >= col("__s_fr")
          && col("__s_en") >= col("__s_es"), "en")
          .when(col("__s_de") >= col("__s_fr") &&
            col("__s_de") >= col("__s_es"), "de")
          .when(col("__s_fr") >= col("__s_es"), "fr")
          .otherwise("es"))
      .filter(col("__n_tokens") >= 20 &&
        col("__n_stop") * lit(1.0) / col("__n_tokens") >= 0.05 &&
        col("__pred") === "en")
      .select(col("doc_id").cast("long").as("doc_id") +: col("source") +:
        col("text") +: extraCols(docs).map(col): _*)
  }

  private val seenSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("content_hash", StringType)))
  private val textSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))
  private val bucketSchema = StructType(Seq(
    StructField("bucket", StringType), StructField("doc_id", LongType)))
  private val curatedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  /** Hash partition count (`part=P` subdirs per batch, every store). */
  val NumParts = 64

  /** Instrumentation: leaf dirs planned by the last applyBatch's store
    * reads — the O(touched) contract made observable. */
  @volatile var lastBucketDirsPlanned: Seq[String] = Nil
  @volatile var lastSeenDirsPlanned: Seq[String] = Nil
  @volatile var lastTextDirsPlanned: Seq[String] = Nil

  /** Per-trigger funnel observability: cumulative per-stage survivor
    * counts across every trigger this JVM has run — the STREAMING
    * companion of the batch `llm_curate_funnel` query (same stage
    * names: 0_raw → 1_gate → 2_exact → 3_near, plus 1a_model when the
    * trained-classifier gate is on, 1b_bloom when the benchmark-
    * decontamination stage is on, and 4_blocks when the
    * paragraph-rewrite stage is on). Scraped through [[MetricsServer]]
    * as `graft_curate_stage_docs_total{stage="..."}` +
    * `graft_curate_triggers_total`, so a gate suddenly dropping most of
    * its input pages someone MID-RUN — the incident the batch query
    * only explains after the fact. Counts ride the trigger's single
    * pass as observe() metrics (plus parquet footers for just-written
    * stages) and are folded in only after the durable writes commit —
    * zero extra jobs, no store reads. */
  private val stageDocs =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val triggersTotal = new java.util.concurrent.atomic.AtomicLong(0)
  private def bump(stage: String, n: Long): Unit =
    stageDocs.computeIfAbsent(stage,
      _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(n)

  /** Prometheus-shaped snapshot of the funnel counters (merged into the
    * /metrics exposition by the curate-mode app wiring). */
  def metricsSnapshot(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    stageDocs.asScala.map { case (st, v) =>
      s"""graft_curate_stage_docs_total{stage="$st"}""" -> v.get.toDouble
    }.toMap + ("graft_curate_triggers_total" -> triggersTotal.get.toDouble)
  }

  private def partOf(c: Column): Column = pmod(hash(c), lit(NumParts))

  /** Funnel-stage counters riding the single pass: `observed` attaches
    * a named `count(*)` observe() (CollectMetrics) at a point in the
    * plan; `observedMetric` reads it back SYNCHRONOUSLY from the
    * executed plan's accumulators (`queryExecution.observedMetrics`)
    * once an EAGER checkpoint has materialized that plan. No listener
    * bus, no waiting, zero extra jobs — the stage counts are collected
    * by the same action that materializes the batch (they used to
    * re-execute a plan prefix as one count() job per stage). The
    * fallback count() fires only if a metric went missing from the
    * executed plan — counters are spec-pinned exact, never
    * best-effort. */
  private def observed(df: DataFrame, stage: String): DataFrame =
    df.observe(s"__funnel_$stage", count(lit(1)).as("n"))
  private def observedMetric(executed: DataFrame, stage: String,
                             fallback: => Long): Long =
    executed.queryExecution.observedMetrics.get(s"__funnel_$stage")
      .map(_.getLong(0)).getOrElse(fallback)

  /** Read every PRIOR batch's subdir of `dir` (b<k> with k < batchId) —
    * never the current batch's own output, so a crash-replay recomputes
    * from the same inputs. */
  private def readPrior(spark: SparkSession, dir: Path, batchId: Long,
                        schema: StructType,
                        dynamic: Boolean = false): DataFrame = {
    BatchDirFold.heal(spark, dir) // an interrupted fold may hold the only copy
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
        .filter(_.getPath.getName.stripPrefix("b").toLong < batchId)
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else if (dynamic) // dynamic-schema kind: curated carries the
      // multimodal extras, which may widen across batches
      spark.read.option("mergeSchema", "true").parquet(dirs: _*)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** Prior batches' rows of a part-partitioned store restricted to
    * `touched` parts — only `b<k>/part=P` leaf dirs that can contain a
    * matching key are listed or opened (O(touched), never O(store)).
    * Returns (rows, plannedLeafDirs). */
  private def readPriorParts(spark: SparkSession, dir: Path, batchId: Long,
                             touched: Set[Int], schema: StructType)
      : (DataFrame, Seq[String]) = {
    BatchDirFold.heal(spark, dir) // an interrupted fold may hold the only copy
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val leafDirs =
      if (!fs.exists(dir)) Seq.empty
      else for {
        b <- fs.listStatus(dir).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("b"))
          .filter(_.getPath.getName.stripPrefix("b").toLong < batchId)
        p <- touched.toSeq.sorted
        leaf = new Path(b.getPath, s"part=$p") if fs.exists(leaf)
      } yield leaf.toString
    val df =
      if (leafDirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(leafDirs: _*)
    (df, leafDirs)
  }

  /** ≤ NumParts ints: the only store parts a batch's keys can live in.
    * A bounded driver collect (the part list, never the keys). */
  private def touchedParts(keyed: DataFrame, key: Column): Set[Int] =
    keyed.select(partOf(key).as("p")).distinct()
      .collect().map(_.getInt(0)).toSet

  /** One intake trigger: gate, dedup against the store, emit curated
    * additions. Factored from the stream for batch tests.
    *
    * `blockRewrite = true` adds the CCNet-style paragraph-dedup stage to
    * the intake: admitted docs are rewritten block-by-block against
    * everything ever admitted (a [[BlockDedupStore]] at
    * `storeDir/blocks`, sharing the store's replay discipline — a
    * replayed trigger recomputes the same rewrite from durable
    * ownership). Docs whose every block is already owned elsewhere
    * vanish from the curated set.
    *
    * `maxPerBucket` (None = unbounded, the batch-parity default) caps
    * how many doc_ids the PERSISTED bucket index keeps per LSH bucket:
    * a degenerate template bucket otherwise accumulates every admitted
    * doc forever, and each later batch's store-side candidate join
    * grows with it. With the cap, later docs in an over-cap bucket are
    * checked against the cap-many EARLIEST admitted members — for the
    * template buckets that motivate it (near-identical docs) any
    * member kills the dup, so drops are preserved; recall for mixed
    * over-cap buckets degrades by design (the same trade as
    * [[StreamingDedup]]'s maxPerBucket, which this mirrors). Exact
    * dedup and the within-batch candidate join are unaffected. */
  def applyBatch(batch: DataFrame, storeDir: String, batchId: Long,
                 blockRewrite: Boolean = false,
                 decontamDir: Option[String] = None,
                 sketchDir: Option[String] = None,
                 modelDir: Option[String] = None,
                 jaccard: Double = 0.8,
                 decontamMinShared: Int = 3,
                 maxPerBucket: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    // stage counters ride the single pass as observe() boundary
    // metrics — attached at each gate's output and collected by the
    // eager checkpoint below, never by separate count() jobs
    val gated00 = gate(observed(batch, "0_raw"))
    val gated00o = observed(gated00, "1_gate")
    // optional trained-model gate (Classifier.writeWeights artifact):
    // keep docs whose margin z >= 0 — a one-row weight read per
    // trigger (a refreshed model takes effect without restart), then a
    // pure integer filter, O(batch)
    val gated0 = modelDir match {
      case None => gated00o
      case Some(dir) =>
        observed(Classifier.gateDocs(gated00o,
          Classifier.loadWeights(spark, dir)), "1a_model")
    }
    // optional Bloom decontamination against a persisted benchmark
    // artifact (Dedup.writeBloom): docs whose bloom-positive shingle
    // count crosses the gate threshold never enter the corpus. The bit
    // table is bounded (≤ m rows) however large the benchmark union —
    // re-read per trigger so a refreshed artifact takes effect without
    // a restart; the read is O(bits), not O(benchmark). The flagged
    // branch re-executes the observed gate subtree: a duplicated
    // CollectMetrics node counts the same rows in both branches, so
    // the by-name metric read stays exact (scratch-verified).
    val gated = decontamDir match {
      case None => gated0
      case Some(dir) =>
        val flagged = Dedup.bloomContaminationFrom(spark, dir, gated0,
          minShared = decontamMinShared)
        observed(gated0.join(flagged.select("doc_id"),
          Seq("doc_id"), "left_anti"), "1b_bloom")
    }
    // exact dedup: min doc_id per hash WITHIN the batch, then drop any
    // hash the store has already admitted. The anti-join reads ONLY the
    // seen-store parts the batch's own hashes can land in — an equal
    // prior hash is in the same part, so the pruning is lossless.
    // the working hash is __-prefixed (like every gate intermediate):
    // a multimodal carry column named content_hash must reach the
    // curated corpus untouched, not replaced by the funnel's own hash
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__content_hash").orderBy("doc_id")
    val preKept = gated
      .withColumn("__content_hash", TextOps.contentHash(col("text")))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
    // EAGER: feeds the part-list and the anti-join either way, and the
    // boundary observations above fire with THIS materialization (a
    // lazy checkpoint's metrics report before any task has run);
    // preKept keeps the executed plan for the synchronous metric reads
    val batchKept = preKept.localCheckpoint(true)
    val hashParts = touchedParts(batchKept, col("__content_hash"))
    val (seen, seenDirs) = readPriorParts(
      spark, new Path(storeDir, "seen"), batchId, hashParts, seenSchema)
    lastSeenDirsPlanned = seenDirs
    val preExact = observed(batchKept
      .join(seen.select(col("content_hash").as("__content_hash")),
        Seq("__content_hash"), "left_anti"), "2_exact")
    // eager for the same reason: feeds buckets, verify, and three
    // writes either way, and executes its own 2_exact observation
    val newExactKept = preExact.localCheckpoint(true)

    // near-dedup: candidates = bucket collisions (new×store ∪ new×new),
    // verified by EXACT n-gram Jaccard — same predicate as the batch path
    val newBuckets = Dedup.lshBuckets(Dedup.minhashSignatures(newExactKept))
      .localCheckpoint(false) // feeds the part-list, two joins, one write
    val bucketParts = touchedParts(newBuckets, col("bucket"))
    val (storeBuckets, bucketDirs) = readPriorParts(
      spark, new Path(storeDir, "buckets"), batchId, bucketParts, bucketSchema)
    lastBucketDirsPlanned = bucketDirs
    val vsStore = storeBuckets.as("a")
      .join(newBuckets.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
      .localCheckpoint(false) // O(collisions); feeds the part-list + cands
    val vsNew = newBuckets.as("a")
      .join(newBuckets.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
    val cands = vsStore.unionByName(vsNew).distinct()
    // the verify corpus: ONLY the store docs that are left-side
    // candidates (text parts pruned by their doc_ids) + the new docs —
    // O(collisions + new) text read, never the whole admitted corpus
    val daParts = touchedParts(vsStore, col("da"))
    val (storeText, textDirs) = readPriorParts(
      spark, new Path(storeDir, "text"), batchId, daParts, textSchema)
    lastTextDirsPlanned = textDirs
    val corpus = storeText
      .unionByName(newExactKept.select("doc_id", "text"))
    val verified = Dedup.ngramJaccard(corpus, jaccard, candidates = Some(cands))
    val drops = verified.select(col("db").as("doc_id")).distinct()
    val curated = newExactKept.join(drops, Seq("doc_id"), "left_anti")

    // per-batch dirs, Overwrite: replay rewrites, never duplicates
    def out(kind: String) = s"$storeDir/$kind/b$batchId"
    newExactKept
      .select(col("doc_id"), col("__content_hash").as("content_hash"),
        partOf(col("__content_hash")).as("part"))
      .write.mode("overwrite").partitionBy("part").parquet(out("seen"))
    newExactKept
      .select(col("doc_id"), col("text"), partOf(col("doc_id")).as("part"))
      .write.mode("overwrite").partitionBy("part").parquet(out("text"))
    // bucket-index write, optionally capped per bucket: rows beyond
    // (cap - already-stored) in doc_id order are not persisted. The
    // rank is Dedup.globalRank (distributed range sort + zipWithIndex)
    // minus the bucket's min rank — never a single-task window, so a
    // degenerate chunk-sized bucket caps without serializing.
    val bucketsToStore = maxPerBucket match {
      case None => newBuckets
      case Some(k) =>
        val have = storeBuckets.groupBy("bucket")
          .agg(count(lit(1)).as("__have"))
        val ranked = Dedup.globalRank(
          newBuckets.select("bucket", "doc_id"), Seq("bucket", "doc_id"))
          .localCheckpoint(false) // rank + per-bucket-min sides reuse it
        ranked
          .join(ranked.groupBy("bucket").agg(min("__rn").as("__min")),
            "bucket")
          .join(have, Seq("bucket"), "left")
          .filter(col("__rn") - col("__min") <
            lit(k.toLong) - coalesce(col("__have"), lit(0L)))
          .select("bucket", "doc_id")
    }
    bucketsToStore
      .select(col("bucket"), col("doc_id"), partOf(col("bucket")).as("part"))
      .write.mode("overwrite").partitionBy("part").parquet(out("buckets"))
    // curated emission carries the full input row — core columns first,
    // then the multimodal extras (binary payloads, metadata structs)
    // the gates never touched
    val extras = extraCols(batch)
    val outCols = Seq("doc_id", "source", "text") ++ extras
    val emitted =
      if (!blockRewrite) curated.select(outCols.map(col): _*)
      else {
        val rew = new BlockDedupStore(s"$storeDir/blocks")
          .addBatch(spark, curated.select("doc_id", "text"), batchId)
        curated.select(col("doc_id") +: col("source") +: extras.map(col): _*)
          .join(rew.filter(col("n_kept") > 0)
            .select(col("doc_id"), col("kept_text").as("text")), "doc_id")
      }
    emitted.select(outCols.map(col): _*)
      .write.mode("overwrite").parquet(out("curated"))

    // optional corpus telemetry: fold the ADMITTED batch into a durable
    // SketchStore — per-source length-percentile histogram + distinct-
    // shingle HLL — so "what does my corpus look like NOW" is a bounded
    // sketch read, never a corpus scan. Sketches read BACK the trigger's
    // committed curated output (not an upstream plan), so they always
    // describe exactly what was emitted — including the block-rewrite
    // stage's dropped docs and rewritten text. Same b<id> replay
    // discipline as every other store write; O(batch) cost.
    sketchDir.foreach { dir =>
      val sk = new SketchStore(dir)
      val admitted = spark.read
        .schema("doc_id LONG, source STRING, text STRING")
        .parquet(out("curated"))
      sk.addHistBatch(admitted, "source", length(col("text")), batchId)
      sk.addHllBatch(
        TextOps.shingleRows(admitted, 3, idCol = "source", dedup = false),
        "source", col("shingle"), batchId)
    }

    // funnel counters LAST — the trigger's durable writes never wait
    // on observability. Every value is already paid for: the gate and
    // exact stages come off the two eager checkpoints' executed-plan
    // accumulators (synchronous reads, no listener bus), the near
    // stage off the parquet footers of the curated rows this trigger
    // just wrote — ZERO extra jobs per trigger (this block used to
    // re-execute a plan prefix as one count() job per stage). The
    // fallbacks never fire unless a metric vanished from the plan.
    bump("0_raw", observedMetric(preKept, "0_raw", batch.count()))
    bump("1_gate", observedMetric(preKept, "1_gate", gated00.count()))
    if (modelDir.isDefined)
      bump("1a_model", observedMetric(preKept, "1a_model", gated0.count()))
    if (decontamDir.isDefined)
      bump("1b_bloom", observedMetric(preKept, "1b_bloom", gated.count()))
    bump("2_exact", observedMetric(preExact, "2_exact", newExactKept.count()))
    // blockRewrite emits REWRITTEN rows to out("curated"), so the
    // pre-rewrite near count needs its own (opt-in path) job there
    bump("3_near",
      if (!blockRewrite) SegPool.rowCount(spark, out("curated"))
      else curated.count())
    if (blockRewrite)
      bump("4_blocks", SegPool.rowCount(spark, out("curated")))
    triggersTotal.incrementAndGet()
  }

  /** The streaming intake: a stream of (doc_id, source, text) rows in,
    * curated parquet out under `storeDir/curated/`. */
  def start(docs: DataFrame, storeDir: String, checkpointDir: String,
            trigger: org.apache.spark.sql.streaming.Trigger =
              org.apache.spark.sql.streaming.Trigger.AvailableNow(),
            blockRewrite: Boolean = false,
            decontamDir: Option[String] = None,
            sketchDir: Option[String] = None,
            modelDir: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .queryName("graft-curate")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) =>
        applyBatch(b, storeDir, id, blockRewrite, decontamDir, sketchDir,
          modelDir) }
      .start()

  /** Maintenance: fold the accumulated per-batch subdirs of each store
    * kind via the shared [[BatchDirFold]] protocol, so listing cost
    * stays flat over months of triggers. Every b-dir EXCEPT the newest
    * folds into one dir named after the highest FOLDED id — the newest
    * is excluded because it may belong to a checkpoint-uncommitted
    * trigger whose replay Overwrites its own `b<id>` dir; folding it in
    * would let that replay replace the entire merged store with one
    * batch's rows. Future batches (id > folded name) still read the
    * folded dir and the current-batch-exclusion rule is untouched. Run
    * OFFLINE (between streaming runs — same discipline as
    * ParquetReplicaSink.compact); interrupted swaps heal on the next
    * fold OR the next store read. Returns folded dir counts per kind.
    *
    * `excludeFrom` (release stores): batch ids at or above it are an
    * UNCOMMITTED release range — a crashed attempt's replayable writes
    * that the owning release will Overwrite or reclaim
    * ([[reclaimBatchRange]]). They must never fold under a
    * committed-looking name; the `curate-store` verb derives the bound
    * from the sibling docs root's current version. */
  def compactStore(spark: SparkSession, storeDir: String,
                   excludeFrom: Long = Long.MaxValue): Map[String, Int] =
    Seq(("seen", seenSchema, Some("content_hash")),
      ("text", textSchema, Some("doc_id")),
      ("buckets", bucketSchema, Some("bucket")),
      ("curated", curatedSchema, None))
      .map { case (kind, schema, partKey) =>
        val dir = new Path(storeDir, kind)
        val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
        kind -> BatchDirFold.fold(spark, dir, (folded, staged) => {
          // partitioned kinds' b-dirs are partitioned tables — read their
          // part=P leaf dirs directly (several roots would make partition
          // discovery conflict), then re-derive the part column on write
          val inputDirs =
            if (partKey.isDefined) folded.flatMap(b =>
              fs.listStatus(b).toSeq
                .filter(s => s.isDirectory && s.getPath.getName.startsWith("part="))
                .map(_.getPath.toString))
            else folded.map(_.toString)
          // curated is dynamic-schema (multimodal extras); the keyed
          // kinds are fixed-frame
          val merged =
            if (kind == "curated")
              spark.read.option("mergeSchema", "true").parquet(inputDirs: _*)
            else spark.read.schema(schema).parquet(inputDirs: _*)
              .select(schema.fieldNames.map(col): _*)
          // partitioned kinds keep their part=P pruning layout across folds
          val writer = partKey match {
            case Some(key) =>
              merged.withColumn("part", partOf(col(key)))
                .repartition(NumParts, col("part"))
                .write.partitionBy("part")
            case None => merged.write
          }
          writer.mode("overwrite").parquet(staged)
        }, excludeFrom)
        // ledger dirs are named by RELEASE id (b<relBatch>), not chunk
        // id — scale the bound down. (An uncommitted ledger dir cannot
        // actually exist — ledgers land after the publish that advances
        // the version — so this is belt-and-braces symmetry.)
      }.toMap ++ foldLedgers(spark, storeDir,
        if (excludeFrom == Long.MaxValue) Long.MaxValue
        else excludeFrom / 65536L)

  /** Reclaim every per-batch dir in an UNCOMMITTED release batch-id
    * range `[lo, hiExclusive)` — minus `keep` — across the store kinds
    * (`seen/text/buckets/curated` b-dirs, `blocks` batch dirs + their
    * applied markers) and an optional SketchStore's kinds. The
    * `release` verb owns the invariant that makes this safe: batch ids
    * are `relBatch*65536 + chunk`, `relBatch` advances with every
    * committed publish, and the id ledger (the delta's commit point)
    * lands after the publish — so nothing inside the CURRENT release's
    * range is durable state, only a crashed or displaced attempt's
    * replayable writes. Those must not survive: a retry that chunks
    * DIFFERENTLY (the raw corpus moved under the crash, or the batch
    * cap changed) never Overwrites the orphan ids, future releases
    * would read them as committed prior state, and — worst case — a
    * doc that left the raw corpus under the crash and is later
    * resubmitted anti-joins against a leftover seen row and silently
    * never reaches any frozen version. Returns the number of dirs (and
    * block markers) removed. */
  def reclaimBatchRange(spark: SparkSession, storeDir: String,
                        lo: Long, hiExclusive: Long,
                        keep: Set[Long] = Set.empty,
                        sketchDir: Option[String] = None): Int = {
    val conf = spark.sessionState.newHadoopConf()
    def inRange(id: Long) = id >= lo && id < hiExclusive && !keep(id)
    def sweep(root: String, kinds: Seq[String], prefix: String): Int =
      kinds.map { kind =>
        val dir = new Path(new Path(root), kind)
        val fs = dir.getFileSystem(conf)
        if (!fs.exists(dir)) 0
        else fs.listStatus(dir).toSeq
          .filter(s => s.getPath.getName.startsWith(prefix))
          .flatMap(s => scala.util.Try(
            s.getPath.getName.stripPrefix(prefix).toLong).toOption
            .map(id => (s.getPath, id)))
          .count { case (p, id) =>
            if (inRange(id)) { fs.delete(p, true); true } else false }
      }.sum
    sweep(storeDir, Seq("seen", "text", "buckets", "curated"), "b") +
      // blocks: the marker must go WITH the data — a surviving
      // `_applied/<id>` would make the owning replay skip its rewrite
      sweep(s"$storeDir/blocks", Seq("_applied"), "") +
      sweep(storeDir, Seq("blocks"), "batch=") +
      sketchDir.map(d =>
        sweep(d, Seq("kmv", "hll", "hist", "cms"), "b")).getOrElse(0)
  }

  private val ledgerSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("b", LongType)))

  /** Fold the `release` verb's delta id ledgers (`processed/b<R>`,
    * `retracted/b<R>` — one dir per release) through the same
    * [[BatchDirFold]] protocol, so delta detection stays a 2-3-child
    * plan after years of nightly releases instead of unioning one
    * DataFrame per release ever run. Liveness is decided by ORDER
    * (`max(processed.b) > max(retracted.b)`), so the fold must not
    * collapse rows onto the merged dir's name: the release batch id is
    * materialized as a per-row `b` column (legacy dirs that predate the
    * column get it from their dir name at fold time), and the ledger
    * reader coalesces the column with the dir name — fold-transparent
    * either way. Liveness only ever consumes `max(b)` per doc_id, so
    * the fold collapses to exactly that — a resubmitted id's older
    * rows drop, the merged ledger holds one row per id ever seen, and
    * the per-release liveness aggregation reads mostly-pre-reduced
    * input. A no-op for plain streaming-intake stores (no ledger
    * dirs). */
  private def foldLedgers(spark: SparkSession, storeDir: String,
                          excludeFrom: Long = Long.MaxValue): Map[String, Int] =
    Seq("processed", "retracted").filter { kind =>
      val dir = new Path(storeDir, kind)
      dir.getFileSystem(spark.sessionState.newHadoopConf()).exists(dir)
    }.map { kind =>
      kind -> BatchDirFold.fold(spark, new Path(storeDir, kind),
        (folded, staged) => {
          folded.map { b =>
            val dirB = b.getName.stripPrefix("b").toLong
            spark.read.schema(ledgerSchema).parquet(b.toString)
              .select(col("doc_id"), coalesce(col("b"), lit(dirB)).as("b"))
          }.reduce(_ unionByName _)
            .groupBy("doc_id").agg(max("b").as("b"))
            .write.mode("overwrite").parquet(staged)
        }, excludeFrom)
    }.toMap

  /** Fate probe — "why is doc X (not) in the corpus": one row per
    * requested id describing what the curation stores know about it.
    * Store reads follow the intake's own pruning discipline: the two
    * membership checks are ids-only column-pruned scans, and every
    * hash/bucket/text probe is part-pruned by the probe's OWN keys
    * (O(probe), not O(store)) — the same `readPriorParts` machinery
    * `applyBatch` plans its delta reads with. With the doc's raw text
    * supplied the probe recomputes the gate verdict, content hash and
    * LSH buckets using the intake's own operators, so the answer names
    * the exact stage that dropped the doc and the exact prior doc that
    * displaced it (exact hash owner / minimum Jaccard-verified
    * near-dup, the greedy min-id rule the funnel applies).
    *
    * Columns: doc_id, curated, exact_kept, content_hash (stored hash
    * for kept ids, recomputed when `raw` is given), gate_pass,
    * bloom_flagged, exact_dup_of, near_dup_of (the last four null
    * without `raw`; the gate/bloom verdicts honor the same optional
    * model/decontam artifacts the funnel ran with). */
  def explainDocs(spark: SparkSession, storeDir: String, ids: Seq[Long],
                  raw: Option[DataFrame] = None,
                  jaccard: Double = 0.8,
                  decontamDir: Option[String] = None,
                  decontamMinShared: Int = 3,
                  modelDir: Option[String] = None): DataFrame = {
    import spark.implicits._
    val idDf = ids.toDF("doc_id")
    val allParts = (0 until NumParts).toSet
    val curatedIds = curated(spark, storeDir)
      .join(idDf, Seq("doc_id")).select("doc_id").distinct()
      .withColumn("curated", lit(true))
    val (seenAll, _) = readPriorParts(spark, new Path(storeDir, "seen"),
      Long.MaxValue, allParts, seenSchema)
    val kept = seenAll.join(idDf, Seq("doc_id"))
      .groupBy("doc_id").agg(first("content_hash").as("kept_hash"))
      .withColumn("exact_kept", lit(true))
    val base = idDf
      .join(curatedIds, Seq("doc_id"), "left")
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("curated"), lit(false)).as("curated"),
        coalesce(col("exact_kept"), lit(false)).as("exact_kept"),
        col("kept_hash"))
    raw match {
      case None =>
        base.select(col("doc_id"), col("curated"), col("exact_kept"),
          col("kept_hash").as("content_hash"),
          lit(null).cast("boolean").as("gate_pass"),
          lit(null).cast("boolean").as("bloom_flagged"),
          lit(null).cast("long").as("exact_dup_of"),
          lit(null).cast("long").as("near_dup_of"))
      case Some(rawDocs) =>
        val rawSub = rawDocs
          .select(col("doc_id").cast("long").as("doc_id"), col("source"),
            col("text"))
          .join(idDf, Seq("doc_id")).localCheckpoint(false)
        val inRaw = rawSub.select("doc_id").withColumn("__inraw", lit(true))
        val gatePass = (modelDir match {
          case None => gate(rawSub)
          case Some(dir) =>
            Classifier.gateDocs(gate(rawSub), Classifier.loadWeights(spark, dir))
        }).select("doc_id").withColumn("__gate", lit(true))
        val bloomed = (decontamDir match {
          case None => spark.range(0).select(col("id").as("doc_id"))
          case Some(dir) => Dedup.bloomContaminationFrom(spark, dir, rawSub,
            minShared = decontamMinShared).select("doc_id")
        }).withColumn("__bloom", lit(true))
        val hashed = rawSub
          .withColumn("content_hash", TextOps.contentHash(col("text")))
          .localCheckpoint(false) // feeds the part list and two joins
        val (seenByHash, _) = readPriorParts(spark, new Path(storeDir, "seen"),
          Long.MaxValue, touchedParts(hashed, col("content_hash")), seenSchema)
        val exactDup = hashed.as("p")
          .join(seenByHash.as("s"),
            col("p.content_hash") === col("s.content_hash") &&
              col("p.doc_id") =!= col("s.doc_id"))
          .groupBy(col("p.doc_id").as("doc_id"))
          .agg(min(col("s.doc_id")).as("exact_dup_of"))
        // near: the probe's buckets against the store's, smaller-id
        // prior docs only (the funnel's greedy min-id drop rule), then
        // EXACT Jaccard over text parts pruned to the candidate ids
        val probeBuckets = Dedup.lshBuckets(Dedup.minhashSignatures(rawSub))
          .localCheckpoint(false)
        val (storeBuckets, _) = readPriorParts(spark,
          new Path(storeDir, "buckets"), Long.MaxValue,
          touchedParts(probeBuckets, col("bucket")), bucketSchema)
        val cands = storeBuckets.as("a")
          .join(probeBuckets.as("b"), col("a.bucket") === col("b.bucket") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
          .distinct().localCheckpoint(false)
        val (storeText, _) = readPriorParts(spark, new Path(storeDir, "text"),
          Long.MaxValue, touchedParts(cands, col("da")), textSchema)
        val corpus = storeText.unionByName(rawSub.select("doc_id", "text"))
        val nearDup = Dedup.ngramJaccard(corpus, jaccard,
            candidates = Some(cands))
          .groupBy(col("db").as("doc_id"))
          .agg(min("da").as("near_dup_of"))
        base
          .join(inRaw, Seq("doc_id"), "left")
          .join(gatePass, Seq("doc_id"), "left")
          .join(bloomed, Seq("doc_id"), "left")
          .join(hashed.select(col("doc_id"),
            col("content_hash").as("__hash")), Seq("doc_id"), "left")
          .join(exactDup, Seq("doc_id"), "left")
          .join(nearDup, Seq("doc_id"), "left")
          .select(col("doc_id"), col("curated"), col("exact_kept"),
            coalesce(col("__hash"), col("kept_hash")).as("content_hash"),
            when(col("__inraw"), coalesce(col("__gate"), lit(false)))
              .as("gate_pass"),
            when(col("__inraw"), coalesce(col("__bloom"), lit(false)))
              .as("bloom_flagged"),
            col("exact_dup_of"), col("near_dup_of"))
    }
  }

  /** All curated docs admitted so far (schema-merged: the multimodal
    * extras may widen across batches). */
  def curated(spark: SparkSession, storeDir: String): DataFrame =
    readPrior(spark, new Path(storeDir, "curated"), Long.MaxValue,
      curatedSchema, dynamic = true)

  /** The batch `llm_curate` per-source stats over the curated stream
    * state — comparable 1:1 with the batch query's output. */
  def stats(spark: SparkSession, storeDir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    curated(spark, storeDir)
      .withColumn("ws_tokens", size(toks))
      .withColumn("bpe_tokens",
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|\\\\S', 0)")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws"),
        sum("bpe_tokens").as("total_bpe"))
      .orderBy("source")
  }
}
