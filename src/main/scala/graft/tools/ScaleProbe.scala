package graft.tools

import graft.llmops.{Dedup, LshIndexStore}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the dedup/index operators at ~20× the sf0.1 corpus:
  * 100k synthetic documents (deterministic generator, ~1% planted
  * near-dups) through winnowing-pair detection and the durable LSH
  * index intake. Prints wall times + result sizes — the "does the shape
  * hold off the toy corpus" probe the bench queries can't give (their
  * documents table stays 5k rows at every SF).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "100000").toInt
    // deterministic corpus: 40-word docs from a 5000-token vocabulary,
    // token choice keyed by md5 of (doc, pos); every 100th doc is a
    // near-copy of its predecessor (one token changed)
    val docs = spark.range(nDocs)
      .select(col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 39), p ->
          concat('w', CAST(CAST(conv(substr(md5(concat(
            CAST(CASE WHEN id % 100 = 99 AND p > 0 THEN id - 1 ELSE id END
              AS STRING), '_', CAST(p AS STRING))), 1, 6), 16, 10) AS BIGINT)
            % 5000 AS STRING))))""").as("text"))
      .localCheckpoint(true)
    println(s"corpus: ${docs.count()} docs, " +
      s"${docs.agg(sum(size(split(col("text"), " ")))).first().getLong(0)} tokens")

    var t0 = System.nanoTime()
    val pairs = Dedup.winnowPairs(docs, dfCap = 50, minShared = 2).count()
    println(f"winnowPairs: $pairs pairs in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(expect ≈ ${nDocs / 100} planted)")

    // block-dedup + dup-span soak: the REAL registered query code over
    // the same 100k corpus (written as a temp documents.parquet so the
    // query reads exactly what it would in production). Planted truth:
    // every 100th doc copies 39/40 tokens of its predecessor, so blocks
    // 1..2 (p16..39) of each planted pair are corpus-duplicates (2 drops
    // per pair) and both members' positions p1..39 sit under duplicated
    // 8-grams (cov_milli = 975). Both must come out EXACT at volume.
    val corpusDir = java.nio.file.Files.createTempDirectory("scale-docs")
      .toFile.getAbsolutePath
    docs.write.mode("overwrite").parquet(s"$corpusDir/documents.parquet")
    t0 = System.nanoTime()
    val bd = graft.queries.LlmQueries.queries("llm_block_dedup")(spark, corpusDir)
    val nDropped = bd.agg(sum(expr("n_blocks - n_kept"))).first().getLong(0)
    println(f"block dedup: $nDropped blocks dropped in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (expect ${2 * (nDocs / 100)})")
    require(nDropped == 2L * (nDocs / 100),
      s"planted block-dup count off: $nDropped")
    t0 = System.nanoTime()
    val ds = graft.queries.LlmQueries.queries("llm_dup_spans")(spark, corpusDir)
    val nCovered = ds.filter(col("cov_milli") >= 900).count()
    println(f"dup spans: $nCovered docs >=90%% covered in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (expect ${2 * (nDocs / 100)})")
    require(nCovered == 2L * (nDocs / 100),
      s"planted span-coverage count off: $nCovered")

    // BPE soak: one word-count shuffle caps the dict, the merge loop
    // runs on the bounded dict, and corpus encode is vocab-factored —
    // per-word imperative work never scales with nDocs. Sanity bound:
    // subtokens sit between the word count (every word ≥1 unit) and
    // half the character count (200 merges on a 5000-word vocab must
    // at least halve the unmerged char-level encoding).
    t0 = System.nanoTime()
    val (bpeMerges, bpeEnc) = graft.llmops.Bpe.trainAndEncode(
      spark, docs, nMerges = 200, vocabCap = 8192)
    val bpeAgg = bpeEnc.agg(count(lit(1)), sum("n_ws_tokens"),
      sum("n_bpe_tokens")).first()
    val (bpeDocs, wsTok, bpeTok) =
      (bpeAgg.getLong(0), bpeAgg.getLong(1), bpeAgg.getLong(2))
    val nChars = docs.agg(sum(length(regexp_replace(col("text"), " ", ""))))
      .first().getLong(0)
    println(f"bpe: ${bpeMerges.length} merges, $bpeTok subtokens / " +
      f"$wsTok words / $nChars chars in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    require(bpeDocs == nDocs && wsTok == nDocs * 40L,
      s"bpe encode lost rows: $bpeDocs docs, $wsTok words")
    require(bpeTok >= wsTok && bpeTok * 2 <= nChars,
      s"bpe compression off: $bpeTok subtokens, $wsTok words, $nChars chars")

    // token-id emission + packing at volume: the id path must agree
    // with the count path token-for-token (sum of id-array lengths ==
    // the count encode's subtoken total), and packing must cut exact
    // fixed-budget sequences with nothing lost
    t0 = System.nanoTime()
    val bpeVocab = graft.llmops.Bpe.vocabOf(docs, bpeMerges)
    val docIds = graft.llmops.Bpe.encodeCorpusIds(docs, bpeMerges, bpeVocab)
      .withColumn("source", (col("doc_id") % 8).cast("string"))
      .localCheckpoint(true)
    val idTok = docIds.agg(sum(size(col("ids")))).first().getLong(0)
    require(idTok == bpeTok,
      s"id emission disagrees with count encode: $idTok vs $bpeTok")
    val packed = graft.llmops.Bpe.packSequences(docIds, budget = 2048)
    val pk = packed.agg(count(lit(1)), sum(size(col("ids"))),
      sum(when(size(col("ids")) === 2048, 1L).otherwise(0L))).first()
    val (nSeqs, packTok, fullSeqs) = (pk.getLong(0), pk.getLong(1), pk.getLong(2))
    require(packTok == bpeTok, s"packing lost tokens: $packTok vs $bpeTok")
    require(fullSeqs >= nSeqs - 8, // ≤1 partial sequence per shard
      s"non-final partial sequences: $fullSeqs full of $nSeqs")
    println(f"bpe ids+pack: |vocab|=${bpeVocab.count()} ids=$idTok " +
      f"-> $nSeqs seqs ($fullSeqs full) in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // Unigram-segmenter soak: vocab selection (substring counting over
    // the BOUNDED word dict + a TakeOrdered cut) and per-DISTINCT-word
    // Viterbi — corpus-scale cost is the word-count shuffle and the
    // occurrence join back, never a per-doc DP. Bounds: every word is
    // ≥1 piece, every piece ≥1 char.
    t0 = System.nanoTime()
    val ugVocab = graft.llmops.Unigram.trainVocab(docs)
    val ugAgg = graft.llmops.Unigram.segmentCorpus(docs, ugVocab)
      .agg(count(lit(1)), sum("n_ws_tokens"), sum("n_pieces")).first()
    val (ugDocs, ugWs, ugPieces) =
      (ugAgg.getLong(0), ugAgg.getLong(1), ugAgg.getLong(2))
    require(ugDocs == nDocs && ugWs == nDocs * 40L,
      s"unigram segment lost rows: $ugDocs docs, $ugWs words")
    require(ugPieces >= ugWs && ugPieces <= nChars,
      s"unigram piece count out of bounds: $ugPieces ($ugWs words, $nChars chars)")
    println(f"unigram: |vocab|=${ugVocab.pieces.length} pieces=$ugPieces " +
      f"/ $ugWs words / $nChars chars in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // durable block-dedup intake at volume: 4 sequential batches of the
    // same corpus through BlockDedupStore — per-trigger planning must
    // stay O(touched parts) and the planted block-dups must all land
    // (each planted pair straddles NO batch boundary here, so counts
    // match the batch operator exactly)
    val blkPath = java.nio.file.Files.createTempDirectory("scale-blk")
      .toFile.getAbsolutePath + "/blk"
    val blkStore = new graft.llmops.BlockDedupStore(blkPath)
    val blkBatch = nDocs / 4
    var blkDropped = 0L
    (0 until 4).foreach { b =>
      t0 = System.nanoTime()
      val out = blkStore.addBatch(spark,
        docs.filter(col("doc_id") >= b * blkBatch &&
          col("doc_id") < (b + 1) * blkBatch), b.toLong)
      val dropped = out.agg(sum(expr("n_blocks - n_kept"))).first().getLong(0)
      blkDropped += dropped
      println(f"block intake batch $b: $blkBatch docs, $dropped dropped in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(planned ${blkStore.lastPlannedDirs.size} part dirs)")
    }
    require(blkDropped == 2L * (nDocs / 100),
      s"streamed block-dup count off: $blkDropped")

    val idxPath = java.nio.file.Files.createTempDirectory("scale-lsh")
      .toFile.getAbsolutePath + "/idx"
    val store = new LshIndexStore(idxPath, simThreshold = 0.5)
    val batchSize = nDocs / 4
    (0 until 4).foreach { b =>
      t0 = System.nanoTime()
      val hits = store.addBatch(spark,
        docs.filter(col("doc_id") >= b * batchSize &&
          col("doc_id") < (b + 1) * batchSize), b.toLong).count()
      println(f"lsh intake batch $b: $batchSize docs, $hits hits in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"(planned ${store.lastPlannedDirs.size} part dirs)")
    }
    val indexed = store.indexRows(spark).select("doc_id").distinct().count()
    println(s"index: $indexed distinct docs")
    t0 = System.nanoTime()
    store.compact(spark)
    println(f"index compaction in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // KMV sketch soak: distinct-token estimate over the full corpus
    // (4M token instances, 5k true vocabulary) — the map-side-combined
    // aggregate must stay scan-bound, and the estimate lands within the
    // k=256 error envelope
    t0 = System.nanoTime()
    val sh = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
      .withColumn("g", lit("corpus"))
    val est = graft.llmops.Sketch.kmvDistinct(sh, "g", col("tok"))
      .first().getAs[Long]("n_est")
    println(f"kmv distinct-token estimate: $est (true 5000) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // HLL + histogram soak over the same corpus: both sketches are one
    // bounded partial-agg pass; HLL must land in its ~6.5% envelope on
    // the 5000-token vocabulary, the histogram p50 must straddle the
    // 40-words-per-doc corpus's known length distribution
    t0 = System.nanoTime()
    val hllEst = graft.llmops.Sketch.hllDistinct(sh, "g", col("tok"))
      .first().getAs[Long]("n_est")
    require(math.abs(hllEst - 5000) <= 1000,
      s"hll estimate $hllEst outside envelope (true 5000)")
    println(f"hll distinct-token estimate: $hllEst (true 5000) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    val p50 = graft.llmops.Sketch.histQuantiles(
        graft.llmops.Sketch.histTable(
          docs.select(lit("g").as("g"), length(col("text")).as("len")),
          "g", col("len")),
        "g", Seq(500L))
      .first().getAs[Long]("approx_lo")
    println(f"hist p50 doc length: $p50 chars in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // Bloom decontamination soak: benchmark = every 200th doc; its
    // ~19k distinct shingles fold into a 1 Mi-position bit table (the
    // broadcast stays 128 KiB as a bitset NO MATTER how big the
    // benchmark grows); the full corpus scans against it in one pass.
    // Every benchmark member must flag itself (a Bloom filter cannot
    // miss); false positives are counted honestly.
    t0 = System.nanoTime()
    val bloomM = 1 << 20
    val bench = docs.filter(col("doc_id") % 200 === 0)
    val bloomBits = Dedup.bloomBits(bench, mBits = bloomM)
    val flaggedIds = Dedup.bloomContamination(docs, bloomBits,
        minShared = 3, mBits = bloomM)
      .collect().map(_.getLong(0)).toSet
    val benchIds = (0L until nDocs.toLong by 200L).toSet
    require(benchIds.subsetOf(flaggedIds),
      s"bloom missed planted contamination: ${(benchIds -- flaggedIds).take(5)}")
    println(f"bloom decontam: ${flaggedIds.size} flagged of $nDocs docs " +
      f"(${benchIds.size} planted, ${flaggedIds.size - benchIds.size} FPs) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // streaming-curation intake soak: the per-trigger cost must track
    // the BATCH, not everything already admitted — every store read is
    // part-pruned (seen by content-hash, text by doc-id, buckets by LSH
    // bucket). Four equal batches; if any read were O(corpus), trigger
    // times would climb with the store.
    val curStore = java.nio.file.Files.createTempDirectory("scale-curate")
      .toFile.getAbsolutePath + "/store"
    // curation docs: long English-looking text so the gate admits them
    val curDocs = spark.range(20000)
      .select(col("id").as("doc_id"), lit("probe").as("source"),
        expr("""concat('the quick brown fox and the lazy dog of the old town ',
          concat_ws(' ', transform(sequence(0, 29), p ->
            concat('tok', CAST(CAST(conv(substr(md5(concat(CAST(id AS STRING),
              '_', CAST(p AS STRING))), 1, 6), 16, 10) AS BIGINT)
              % 4000 AS STRING)))))""").as("text"))
      .localCheckpoint(true)
    // ... with the round-7 optional stages ON: a persisted bloom gate
    // (a disjoint benchmark, so nothing in the corpus is dropped by it)
    // and the per-trigger sketch-store telemetry — the per-trigger cost
    // must STAY flat with both stages paying O(batch + bits) each.
    val bloomDir = java.nio.file.Files.createTempDirectory("scale-bloom")
      .toFile.getAbsolutePath + "/bloom"
    Dedup.writeBloom(spark, bloomDir, spark.range(200)
      .select(col("id").as("doc_id"),
        expr("concat('benchmark sentence number ', CAST(id AS STRING), " +
          "' unrelated to the probe corpus entirely')").as("text")))
    val sketchDir = java.nio.file.Files.createTempDirectory("scale-sketch")
      .toFile.getAbsolutePath + "/sk"
    val curBatch = 5000
    val trigSecs = (0 until 4).map { b =>
      t0 = System.nanoTime()
      graft.llmops.StreamingCurate.applyBatch(
        curDocs.filter(col("doc_id") >= b * curBatch &&
          col("doc_id") < (b + 1) * curBatch), curStore, b.toLong,
        decontamDir = Some(bloomDir), sketchDir = Some(sketchDir))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"curate trigger $b: $curBatch docs in $secs%.1f s (planned " +
        s"seen=${graft.llmops.StreamingCurate.lastSeenDirsPlanned.size} " +
        s"text=${graft.llmops.StreamingCurate.lastTextDirsPlanned.size} " +
        s"bucket=${graft.llmops.StreamingCurate.lastBucketDirsPlanned.size} dirs)")
      secs
    }
    val curN = graft.llmops.StreamingCurate.curated(spark, curStore).count()
    println(f"curate intake: $curN admitted; trigger 3 / trigger 1 = " +
      f"${trigSecs(3) / trigSecs(1)}%.2f (flat = no O(corpus) read)")
    // telemetry sanity: the sketch store's histogram covers exactly the
    // admitted corpus
    val skDocs = new graft.llmops.SketchStore(sketchDir).histCells(spark)
      .agg(sum(col("c"))).first().getLong(0)
    require(skDocs == curN, s"sketch store covers $skDocs of $curN admitted")
    println(s"curate sketch telemetry: $skDocs docs folded (== admitted)")

    // persisted ANN serving indexes: build both layouts over synthetic
    // embeddings with planted twins, serve a probe from disk, report
    // wall time — the pruning contract itself is pinned by
    // AnnIndexStoreSpec's planned-files assertions
    val nVecs = 20000
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val base = (0L until nVecs.toLong).map(i => (i, vec()))
    val twin = (nVecs.toLong,
      base(5)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat))
    val embs = (base :+ twin).toDF("vec_id", "embedding")
      .repartition(32).localCheckpoint(true)
    // Incremental aggregate view at volume: mixed-DML batches through
    // the warehouse apply with a declared per-group COUNT/SUM view —
    // after EVERY batch the maintained view must equal the replica
    // GROUP BY exactly (the IVM contract), at O(batch) upkeep.
    locally {
      import graft.model.{CdcColumn, CdcEvent}
      import spark.implicits._
      val whRoot = java.nio.file.Files.createTempDirectory("scale-agg")
        .toFile.getAbsolutePath
      val vdef = graft.sinks.AggViewDef("public.t1", Seq("grp"), Seq("amt"))
      val tsA = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      val live = scala.collection.mutable.HashMap.empty[Long, (String, Long)]
      var lsn = 0L
      def nextLsn(): Long = { lsn += 1; lsn }
      def cdcCols(id: Long, grp: String, amt: Long) =
        Seq(CdcColumn("id", id.toString), CdcColumn("grp", grp),
          CdcColumn("amt", amt.toString))
      val nIns = math.max(nDocs / 4, 2000)
      val b0 = (0L until nIns).map { i =>
        val (g, a) = (s"g${i % 16}", i % 97)
        live(i) = (g, a)
        CdcEvent("c", nextLsn(), 1L, tsA, "public", "t1", Nil,
          cdcCols(i, g, a), keyColumns = Seq("id"))
      }
      val exp0 = live.toMap // snapshot BEFORE b1's construction mutates live
      val b1 = (0L until nIns / 2).map { i =>
        val (og, oa) = live(i)
        if (i % 5 == 0) { // delete
          live.remove(i)
          CdcEvent("d", nextLsn(), 1L, tsA, "public", "t1",
            cdcCols(i, og, oa), Nil, keyColumns = Seq("id"))
        } else { // update; every 3rd moves group
          val ng = if (i % 3 == 0) s"g${(i + 7) % 16}" else og
          live(i) = (ng, oa + 1)
          CdcEvent("u", nextLsn(), 1L, tsA, "public", "t1",
            cdcCols(i, og, oa), cdcCols(i, ng, oa + 1), keyColumns = Seq("id"))
        }
      }
      val exp1 = live.toMap
      Seq((b0, exp0), (b1, exp1)).zipWithIndex.foreach { case ((events, snap), b) =>
        t0 = System.nanoTime()
        graft.streaming.CdcPipeline.applyWarehouseBatch(
          events.toDS(), whRoot, 8, batchId = b.toLong, aggViews = Seq(vdef))
        val view = vdef.sink(whRoot).read(spark).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
        val expect = snap.values.groupBy(_._1).map { case (g, vs) =>
          g -> (vs.size.toLong, vs.map(_._2).sum.toDouble) }
        require(view == expect, {
          val diff = (view.keySet ++ expect.keySet).toSeq.sorted
            .filter(k => view.get(k) != expect.get(k))
            .map(k => s"$k: view=${view.get(k)} expect=${expect.get(k)}")
          s"agg view diverged at batch $b: ${diff.take(4).mkString("; ")}"
        })
        println(f"agg-view batch $b: ${events.size} events -> " +
          f"${view.size} live groups, view == replica fold, in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      val folded = vdef.sink(whRoot).compact(spark)
      println(s"agg-view compact: folded $folded delta dirs")
    }

    // SCD2 history at volume: blind O(batch) appends through the
    // warehouse apply with a declared history, then merge-on-read
    // serving — a bulk batch, a churn batch, and a SMALL working-set
    // batch (the steady-state shape: serving must not re-derive the
    // whole store for a 1% delta); time travel + probe served from the
    // folded base.
    locally {
      import graft.model.{CdcColumn, CdcEvent}
      import spark.implicits._
      val whRoot = java.nio.file.Files.createTempDirectory("scale-hist")
        .toFile.getAbsolutePath
      val tsH = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      var lsn = 0L
      def nextLsn(): Long = { lsn += 1; lsn }
      def cols(id: Long, v: Long) =
        Seq(CdcColumn("id", id.toString), CdcColumn("v", v.toString))
      val nKeys = math.max(nDocs / 4, 2000).toLong
      val b0 = (0L until nKeys).map(i => CdcEvent("c", nextLsn(), 1L, tsH,
        "public", "t1", Nil, cols(i, i), keyColumns = Seq("id")))
      val b1 = (0L until nKeys / 2).map { i =>
        if (i % 5 == 0) CdcEvent("d", nextLsn(), 1L, tsH, "public", "t1",
          cols(i, i), Nil, keyColumns = Seq("id"))
        else CdcEvent("u", nextLsn(), 1L, tsH, "public", "t1",
          cols(i, i), cols(i, i + 1000), keyColumns = Seq("id"))
      }
      val tipAfterB1 = lsn
      val b2 = (0L until nKeys / 100).map { i => // 1% working set
        val id = i * 100 + 1
        CdcEvent("u", nextLsn(), 1L, tsH, "public", "t1",
          cols(id, id + 1000), cols(id, id + 2000), keyColumns = Seq("id"))
      }
      val hist = Seq("public.t1")
      Seq(b0, b1, b2).zipWithIndex.foreach { case (events, b) =>
        t0 = System.nanoTime()
        graft.streaming.CdcPipeline.applyWarehouseBatch(
          events.toDS(), whRoot, 8, batchId = b.toLong, historyTables = hist)
        println(f"history batch $b: ${events.size} events appended in " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      val hs = new graft.sinks.HistorySink(s"$whRoot/_history/public.t1", Nil)
      t0 = System.nanoTime()
      val foldedH = hs.compact(spark)
      println(f"history compact: folded $foldedH dirs in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
      val liveNow = hs.asOf(spark, lsn).count()
      val expLive = nKeys - nKeys / 2 / 5 // minus the deletes
      require(liveNow == expLive, s"asOf(tip)=$liveNow, expected $expLive")
      println(f"history asOf tip: $liveNow rows (== replica) in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
      val mid = hs.asOf(spark, tipAfterB1).count()
      require(mid == expLive, s"asOf(mid)=$mid, expected $expLive")
      println(f"history asOf mid-stream: $mid rows in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      t0 = System.nanoTime()
      val chain = hs.probe(spark, Seq("101")).collect()
      require(chain.length == 3, s"key 101 chain: ${chain.length} versions")
      println(f"history probe key 101: ${chain.length} versions in " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s (part-pruned)")
    }

    val annRoot = java.nio.file.Files.createTempDirectory("scale-ann")
      .toFile.getAbsolutePath
    val lshIdx = new graft.llmops.AnnIndexStore(s"$annRoot/lsh")
    t0 = System.nanoTime()
    lshIdx.writeLsh(embs)
    println(f"ann lsh index build: ${nVecs + 1} vecs in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    val lshTop = lshIdx.lshTopK(spark, probeId = 5L, k = 1)
      .first().getLong(0)
    println(f"ann lsh serve: top-1 = $lshTop (expect $nVecs) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    // incremental intake: append a twin of vec 6, serve it immediately
    t0 = System.nanoTime()
    lshIdx.append(Seq((nVecs + 1L,
      base(6)._2.map(x => x + 0.02f * rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding"))
    val appTop = lshIdx.lshTopK(spark, probeId = 6L, k = 1).first().getLong(0)
    println(f"ann lsh append+serve: top-1 = $appTop (expect ${nVecs + 1}) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val ivfIdx = new graft.llmops.AnnIndexStore(s"$annRoot/ivf")
    t0 = System.nanoTime()
    ivfIdx.writeIvf(embs.withColumn("label", (col("vec_id") % 4).cast("int")),
      nClusters = 64, metaCols = Seq("label"))
    println(f"ann ivf index build (64 clusters, metaCols=label): in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    val ivfN = ivfIdx.ivfTopK(spark, probeId = 5L, k = 10, nprobe = 8).count()
    println(f"ann ivf serve: $ivfN results (8/64 clusters) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    // metadata-filtered serve: the predicate applies inside the SAME
    // cluster-pruned posting read (label rides the posting lists) — the
    // restriction must never leak other labels or widen the scan
    t0 = System.nanoTime()
    val flt = ivfIdx.ivfTopK(spark, probeId = 5L, k = 10, nprobe = 8,
      where = Some(col("label") === 2)).collect()
    require(flt.nonEmpty && flt.forall(_.getLong(0) % 4 == 2L),
      "filtered serve leaked labels")
    println(f"ann ivf filtered serve: ${flt.length} results (label=2 only) in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // batch serving: 50 probes in ONE plan against each persisted layout
    // — the per-probe driver loop this replaces would re-plan 50×; the
    // planted twin must still rank first for its probe
    val probeSet = (0L until 50L).toSeq
    t0 = System.nanoTime()
    val lshBatch = lshIdx.lshTopKBatch(spark, probeSet, k = 3)
      .collect()
    val batchTop5 = lshBatch.filter(r => r.getLong(0) == 5L && r.getLong(4) == 1L)
      .map(_.getLong(1)).headOption.getOrElse(-1L)
    println(f"ann lsh batch serve: ${probeSet.size} probes, ${lshBatch.length} " +
      f"rows in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(probe 5 top-1 = $batchTop5, expect $nVecs)")
    t0 = System.nanoTime()
    val ivfBatch = ivfIdx.ivfTopKBatch(spark, probeSet, k = 3, nprobe = 8).count()
    println(f"ann ivf batch serve: ${probeSet.size} probes, $ivfBatch rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // distributed batch serving: a CORPUS-SIZED probe set (10k ids — half
    // the corpus) through the all-distributed forms, where the driver-
    // bounded batch path would materialize ~10k probes × bands × ball
    // candidate pairs on the driver. One plan per layout, no collect in
    // the path; the planted twin must rank first for its probe, and a
    // spot-check probe must agree row-for-row with the driver-bounded
    // serving it mirrors.
    val bigProbes = spark.range(0, 10000).select(col("id").as("vec_id"))
    t0 = System.nanoTime()
    val distRows = lshIdx.lshTopKBatchDistributed(bigProbes, k = 3)
      .localCheckpoint(true)
    val distN = distRows.count()
    val distTop5 = distRows.filter(col("pid") === 5L && col("rank") === 1L)
      .select("vec_id").first().getLong(0)
    println(f"ann lsh DISTRIBUTED batch: 10000 probes, $distN rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (probe 5 top-1 = $distTop5, " +
      s"expect $nVecs)")
    require(distTop5 == nVecs.toLong, "distributed serve lost the planted twin")
    val spotDist = distRows.filter(col("pid") === 17L)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    val spotDriver = lshIdx.lshTopKBatch(spark, Seq(17L), k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    require(spotDist == spotDriver,
      s"distributed/driver-bounded parity broke: $spotDist vs $spotDriver")
    t0 = System.nanoTime()
    val ivfDistN = ivfIdx.ivfTopKBatchDistributed(bigProbes, k = 3, nprobe = 8)
      .count()
    println(f"ann ivf DISTRIBUTED batch: 10000 probes, $ivfDistN rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // hard-negative distributed sweep over the labeled IVF store: the
    // pair predicate (candidate label ≠ probe's p_label) must hold for
    // EVERY returned row — audited distributed (label = vec_id % 4 by
    // construction), no driver sample
    t0 = System.nanoTime()
    val hnAgg = ivfIdx.ivfTopKBatchDistributed(bigProbes, k = 3, nprobe = 8,
        pairWhere = Some(col("label") =!= col("p_label")))
      .agg(count(lit(1)),
        sum(when(expr("pid % 4 = vec_id % 4"), 1L).otherwise(0L))).first()
    val (hnRows, hnSame) = (hnAgg.getLong(0), hnAgg.getLong(1))
    require(hnRows > 0 && hnSame == 0,
      s"hard-negative sweep returned $hnSame same-label rows of $hnRows")
    println(f"ann ivf hard-negative sweep: 10000 probes, $hnRows rows, " +
      f"0 same-label in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    // timed-cold serving vs memoized serving: the centroid/codebook
    // memo (AnnIndexStore.loadCents/loadBooks) means a store INSTANCE's
    // first serve pays the two index-metadata collect jobs and later
    // serves don't — so a bench median over repeated passes reports
    // steady-state serving. This row prices that claim in evidence: a
    // FRESH instance (cold memo, same on-disk index) vs the same
    // instance's second serve. Both compute the ranking from parquet;
    // only the K-row metadata collects differ.
    val pqColdIdx = new graft.llmops.AnnIndexStore(s"$annRoot/pqcold")
    pqColdIdx.writeIvfPq(embs, nClusters = 64)
    def pqServe(st: graft.llmops.AnnIndexStore): (Double, Long) = {
      val t = System.nanoTime()
      val n = st.pqTopK(spark, probeId = 5L, k = 10, nprobe = 8).count()
      ((System.nanoTime() - t) / 1e9, n)
    }
    val fresh = new graft.llmops.AnnIndexStore(s"$annRoot/pqcold")
    val (coldS, coldN) = pqServe(fresh)   // first serve: metadata collects
    val (warmS, warmN) = pqServe(fresh)   // memoized metadata, same plan
    require(coldN == warmN, s"cold/warm serve row counts differ: $coldN/$warmN")
    println(f"ann ivfpq serve cold-vs-memoized (fresh store instance): " +
      f"cold first-serve $coldS%.2f s, memoized second-serve $warmS%.2f s " +
      f"($coldN rows each; delta = centroid+codebook collect jobs)")

    // retraction: tombstone the planted twin — it must vanish from
    // serving immediately, and compact must purge it physically
    t0 = System.nanoTime()
    lshIdx.delete(spark, Seq(nVecs.toLong))
    val afterDel = lshIdx.lshTopK(spark, probeId = 5L, k = 1).first().getLong(0)
    require(afterDel != nVecs.toLong,
      s"tombstoned twin must not serve (got $afterDel)")
    lshIdx.compact(spark)
    val afterCompact = lshIdx.lshTopK(spark, probeId = 5L, k = 1).first().getLong(0)
    require(afterCompact != nVecs.toLong, "purged twin resurfaced after compact")
    println(f"ann retraction: delete + filtered serve + compacted purge in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (post-delete top-1 = $afterDel)")

    // IVF drift → recall evidence: appended vectors from 32 modes the
    // frozen centroids never saw. recall@10 (vs an exhaustive
    // all-cluster scan of the SAME store) degrades at bounded nprobe,
    // and the drift-warranted rebuildIvf must restore it. The row also
    // calibrates GRAFT_ANN_REBUILD_IF_DRIFT: on near-orthogonal data
    // the mean-distance baseline is already ~0.68, so a real ~0.3
    // recall loss moves the telemetry RATIO only a few percent — the
    // gate must be set ~1.03–1.05, not a comfortable-looking 1.5
    // (which would never fire). Asserted: the small ratio trips, the
    // rebuild restores recall.
    locally {
      val dIdx = new graft.llmops.AnnIndexStore(s"$annRoot/ivfdrift")
      t0 = System.nanoTime()
      dIdx.writeIvf(embs, nClusters = 64)
      val modes = (0 until 32).map(_ =>
        Array.fill(64)(2f * rnd.nextGaussian().toFloat))
      val drifted = (0 until 2000).map { i =>
        val m = modes(i % 32)
        (200000L + i,
          m.map(x => x + rnd.nextGaussian().toFloat))
      }
      dIdx.append(drifted.toDF("vec_id", "embedding"))
      def recall(nprobe: Int, probes: Seq[Long]): Double = {
        def top(np: Int): Map[Long, Set[Long]] =
          dIdx.ivfTopKBatch(spark, probes, k = 10, nprobe = np)
            .select("pid", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
            .view.mapValues(_.map(_._2).toSet).toMap
        val (ap, ex) = (top(nprobe), top(64))
        probes.map(p => (ap.getOrElse(p, Set.empty) intersect
          ex.getOrElse(p, Set.empty)).size / 10.0).sum / probes.size
      }
      val drProbes = (200000L until 200020L).toSeq
      val recPre = recall(4, drProbes)
      val gate = dIdx.driftExceeds(spark, 1.02)
      t0 = System.nanoTime()
      dIdx.rebuildIvf(spark)
      val rebuildSecs = (System.nanoTime() - t0) / 1e9
      val recPost = recall(4, drProbes)
      println(f"ann ivf drift: recall@10(nprobe=4/64) pre=$recPre%.2f " +
        f"post-rebuild=$recPost%.2f (rebuild $rebuildSecs%.1f s; " +
        s"${dIdx.driftReport(spark).getOrElse("telemetry reset")}; " +
        s"ratio-1.02 gate tripped pre-rebuild: $gate)")
      require(gate,
        "a recall-degrading drifted append must trip the ~1.02 ratio gate " +
          "(evidence for the GRAFT_ANN_REBUILD_IF_DRIFT default)")
      require(recPost >= 0.9 && recPost > recPre,
        f"rebuild must restore bounded-nprobe recall: $recPre%.2f -> $recPost%.2f")
    }

    // durable BM25 text index at corpus volume: build over the full
    // synthetic corpus, then point-serve — the planned-dir count must
    // stay bounded by the query terms' parts however many docs the
    // index holds, and the planted near-copy must rank right behind
    // its original on the original's own tokens
    t0 = System.nanoTime()
    val tiDir = java.nio.file.Files.createTempDirectory("scale-text")
      .toFile.getAbsolutePath + "/idx"
    val tiStore = new graft.llmops.TextIndexStore(tiDir, numParts = 64)
    tiStore.addBatch(spark, docs, 0)
    println(f"text index: ${docs.count()} docs indexed in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    t0 = System.nanoTime()
    // probe = doc 98's leading 6 tokens; doc 99 is its planted
    // near-copy (one token changed) — both must lead the ranking
    val tiQ = docs.filter(col("doc_id") === 98L)
      .select(lit(0L).as("qid"),
        explode(slice(split(col("text"), " "), 1, 6)).as("term"))
    val tiTop = tiStore.search(spark, tiQ, k = 5).collect()
      .sortBy(_.getInt(1)).map(_.getLong(2))
    require(tiTop.take(2).toSet == Set(98L, 99L),
      s"original+near-copy must lead the BM25 ranking: ${tiTop.toSeq}")
    require(tiStore.lastPlannedDirs.size <= 6,
      s"text search planned ${tiStore.lastPlannedDirs.size} dirs for <=6 terms")
    println(f"text search: top-5 ${tiTop.mkString(",")} in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
      f"(${tiStore.lastPlannedDirs.size} part dirs planned of 64)")

    // STOPWORD-BEARING phrase sweep at corpus volume: every phrase
    // pairs "zz" (df = corpus size — phrases are df-cap-exempt, a
    // stopword is a REQUIRED positional slot) with a unique anchor
    // token. The rarest-slot-first plan must anchor candidates on the
    // unique slot and fetch position arrays only for survivors — the
    // stopword's corpus-sized posting list never rides a shuffle
    // (PhraseBatchSpec pins the shuffled-row bound; this row times the
    // shape at 20k docs × 2000 phrases).
    locally {
      val pn = 20000
      val phDocs = spark.range(pn).select(col("id").as("doc_id"),
        expr("""concat('zz head', CAST(id AS STRING),
                ' zz tail', CAST(id AS STRING), ' zz zz filler')""")
          .as("text"))
      val phDir = java.nio.file.Files.createTempDirectory("scale-phrase")
        .toFile.getAbsolutePath + "/idx"
      val phIdx = new graft.llmops.TextIndexStore(phDir, numParts = 64)
      phIdx.addBatch(spark, phDocs, 0)
      val phr = spark.range(2000).select(col("id").as("qid"),
          posexplode(array(lit("zz"),
            concat(lit("head"), col("id").cast("string")))))
        .toDF("qid", "slot", "term")
      t0 = System.nanoTime()
      val sweep = phIdx.phraseSearchDistributed(phr)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val sweepSecs = (System.nanoTime() - t0) / 1e9
      require(sweep.length == 2000 &&
        sweep.forall { case (q, d, n) => q == d && n == 1L },
        s"each phrase must match exactly its own doc: got ${sweep.length}")
      println(f"phrase sweep (2000 stopword-bearing phrases over 20k " +
        f"docs, distributed rarest-slot-first): $sweepSecs%.1f s")
    }
    // release verb END-TO-END: a cold release over a 20k-doc corpus,
    // then (1) a +1% adds-only incremental and (2) a removal
    // incremental — per-stage wall times (delta_detect / apply_delta /
    // freeze / emit_shards) so the verb's cost is measurable
    // round-over-round, plus hard checks on the freeze plan: an
    // adds-only release REFERENCES every prior segment (zero bytes
    // moved), a removal rebuilds ONLY the segments holding removed
    // docs.
    import graft.streaming.GraftApp
    // texts derive from doc_id (id + offset), NOT the range id — an
    // offset batch must be fresh CONTENT, or the funnel exact-drops it
    // as a duplicate of the base corpus and the "+N docs" rows measure
    // nothing
    def relCorpus(n: Long, offset: Long) = spark.range(n)
      .select((col("id") + offset).as("doc_id"), lit("probe").as("source"),
        expr(s"""concat('the quick brown fox and the lazy dog of the old town ',
          concat_ws(' ', transform(sequence(0, 29), p ->
            concat('rtok', CAST(CAST(conv(substr(md5(concat(
              CAST(id + $offset AS STRING),
              '_r_', CAST(p AS STRING))), 1, 6), 16, 10) AS BIGINT)
              % 50000 AS STRING)))))""").as("text"),
        // deterministic 16-dim embedding rides the funnel as a non-core
        // column (the multimodal carry) — the ann-index sync rows below
        // index it straight out of the frozen segments
        expr(s"""transform(sequence(0, 15), j -> CAST(
          (CAST(conv(substr(md5(concat(CAST(id + $offset AS STRING),
            '_e_', CAST(j AS STRING))), 1, 6), 16, 10) AS BIGINT) % 2000
            - 1000) / 1000.0 AS FLOAT))""").as("embedding"))
    def relDir(tag: String) = java.nio.file.Files
      .createTempDirectory(s"scale-rel-$tag").toFile.getAbsolutePath
    val relRaw1 = relDir("raw1")
    relCorpus(20000, 0).write.mode("overwrite").parquet(relRaw1)
    val relTok = relDir("tok") + "/tok"
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "bpe-train", "GRAFT_BPE_DOCS" -> relRaw1,
      "GRAFT_BPE_OUT" -> relTok, "GRAFT_BPE_MERGES" -> "3"))
    val relOut = relDir("out") + "/rel"
    val relEnv = Map(
      "GRAFT_MAINTENANCE" -> "release", "GRAFT_RELEASE_OUT" -> relOut,
      "GRAFT_EMIT_TOKENIZER" -> relTok, "GRAFT_EMIT_BUDGET" -> "512",
      "GRAFT_EMIT_SHARDS" -> "16")
    def stagesStr = GraftApp.lastReleaseStageSecs
      .map { case (s, t) => f"$s=$t%.1fs" }.mkString(" ")
    t0 = System.nanoTime()
    val coldLines =
      GraftApp.maintenance(spark, relEnv + ("GRAFT_RELEASE_DOCS" -> relRaw1))
    println(f"release cold (20k docs): ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"[$stagesStr]")
    val coldFunnel = coldLines.find(_.startsWith("release 0:"))
      .get.split(" -> ").head
    // +1% adds: the freeze must REFERENCE the prior segment — no
    // rebuild, no copy
    val relRaw2 = relDir("raw2")
    spark.read.parquet(relRaw1).unionByName(relCorpus(200, 20000))
      .write.mode("overwrite").parquet(relRaw2)
    t0 = System.nanoTime()
    GraftApp.maintenance(spark, relEnv + ("GRAFT_RELEASE_DOCS" -> relRaw2))
    val incSecs = (System.nanoTime() - t0) / 1e9
    println(f"release +1%% incremental: $incSecs%.1f s [$stagesStr] " +
      s"(freeze plan rebuilt=${GraftApp.lastFreezePlan._1} " +
      s"referenced=${GraftApp.lastFreezePlan._2})")
    require(GraftApp.lastFreezePlan._1.isEmpty &&
      GraftApp.lastFreezePlan._2.nonEmpty,
      s"adds-only freeze must reference, never rebuild: ${GraftApp.lastFreezePlan}")
    // removal: only the segment holding the removed docs rebuilds;
    // the fresh +1% segment is referenced untouched
    val relRaw3 = relDir("raw3")
    spark.read.parquet(relRaw2).filter(col("doc_id") >= 100)
      .write.mode("overwrite").parquet(relRaw3)
    t0 = System.nanoTime()
    GraftApp.maintenance(spark, relEnv + ("GRAFT_RELEASE_DOCS" -> relRaw3))
    println(f"release removal incremental: ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"[$stagesStr] (freeze plan rebuilt=${GraftApp.lastFreezePlan._1} " +
      s"referenced=${GraftApp.lastFreezePlan._2})")
    require(GraftApp.lastFreezePlan._1 == Seq("0") &&
      GraftApp.lastFreezePlan._2.contains("1"),
      s"removal must rebuild only the holding seg: ${GraftApp.lastFreezePlan}")
    // chunked COLD release: the same 20k-doc corpus through 3 bounded
    // sequential intake chunks — identical funnel end state to the
    // one-shot cold release (the streaming-parity contract at volume),
    // with the within-chunk LSH working set bounded by the chunk size
    val relOutC = relDir("outc") + "/rel"
    t0 = System.nanoTime()
    val chunkLines = GraftApp.maintenance(spark, relEnv ++ Map(
      "GRAFT_RELEASE_OUT" -> relOutC, "GRAFT_RELEASE_DOCS" -> relRaw1,
      "GRAFT_RELEASE_BATCH_DOCS" -> "8000"))
    val chunkFunnel = chunkLines.find(_.startsWith("release 0:"))
      .get.split(" -> ").head
    println(f"release cold CHUNKED (3x~6.7k docs): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s [$stagesStr]")
    require(chunkFunnel == coldFunnel,
      s"chunked cold release must equal one-shot:\n$chunkFunnel\n$coldFunnel")
    // release-synced text index: a cold sync REBUILDS over the current
    // corpus once; the next release's sync is a manifest DIFF — prior
    // segments skipped (never read), cost bounded by the delta
    t0 = System.nanoTime()
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "text-index-sync", "GRAFT_RELEASE_OUT" -> relOut))
    val syncCold = graft.llmops.CorpusIndexSync
      .syncedVersion(spark, s"$relOut/_text_index")
    println(f"text-index sync cold (~20k docs rebuild -> v${syncCold.get}): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val relRaw4 = relDir("raw4")
    spark.read.parquet(relRaw3).unionByName(relCorpus(200, 20200))
      .write.mode("overwrite").parquet(relRaw4)
    t0 = System.nanoTime()
    GraftApp.maintenance(spark, relEnv ++ Map(
      "GRAFT_RELEASE_DOCS" -> relRaw4, "GRAFT_RELEASE_TEXT_INDEX" -> "1"))
    val sr = GraftApp.lastIndexSync.get
    println(f"text-index sync diff (+200 docs with the release): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s [$stagesStr] " +
      s"(mode=${sr.mode} +${sr.added} -${sr.removed} " +
      s"${sr.segsSkipped} segs untouched)")
    require(sr.mode == "diff" && sr.added == 200 && sr.segsSkipped >= 2,
      s"release sync must diff, not rebuild: $sr")
    // release-synced ANN index: cold sync REBUILDS (staged) once over
    // the current corpus' carried embedding column; the next release's
    // sync is a manifest DIFF — prior segments skipped (never read),
    // cost bounded by the delta
    t0 = System.nanoTime()
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "ann-index-sync", "GRAFT_RELEASE_OUT" -> relOut))
    val annCold = graft.llmops.CorpusIndexSync
      .syncedVersion(spark, s"$relOut/_ann_index")
    println(f"ann-index sync cold (~20k docs lsh rebuild -> v${annCold.get}): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")
    val relRaw5 = relDir("raw5")
    spark.read.parquet(relRaw4).unionByName(relCorpus(200, 60000))
      .write.mode("overwrite").parquet(relRaw5)
    t0 = System.nanoTime()
    // both flags from here on: an unsynced release whose gap outlives
    // GRAFT_RELEASE_RETAIN correctly forces the rebuild fallback
    // (spec-pinned) — the probe rows measure the DIFF path
    GraftApp.maintenance(spark, relEnv ++ Map(
      "GRAFT_RELEASE_DOCS" -> relRaw5, "GRAFT_RELEASE_ANN_INDEX" -> "1",
      "GRAFT_RELEASE_TEXT_INDEX" -> "1"))
    val ar = GraftApp.lastAnnSync.get
    println(f"ann-index sync diff (+200 docs with the release): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s [$stagesStr] " +
      s"(mode=${ar.mode} +${ar.added} -${ar.removed} " +
      s"${ar.segsSkipped} segs untouched)")
    require(ar.mode == "diff" && ar.added == 200 && ar.segsSkipped >= 3,
      s"release ann sync must diff, not rebuild: $ar")
    // retraction sync: drop the +200 batch again — BOTH synced indexes
    // must take the removal as a diff (tombstones + exact stat
    // adjustment), never a rebuild, with the untouched segments skipped
    t0 = System.nanoTime()
    GraftApp.maintenance(spark, relEnv ++ Map(
      "GRAFT_RELEASE_DOCS" -> relRaw4, "GRAFT_RELEASE_TEXT_INDEX" -> "1",
      "GRAFT_RELEASE_ANN_INDEX" -> "1"))
    val trm = GraftApp.lastIndexSync.get
    val arm = GraftApp.lastAnnSync.get
    println(f"index sync retraction (-200 docs, text+ann with the release): " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s [$stagesStr] " +
      s"(text ${trm.mode} -${trm.removed}, ann ${arm.mode} -${arm.removed})")
    require(trm.mode == "diff" && trm.removed == 200 &&
      arm.mode == "diff" && arm.removed == 200,
      s"retraction must sync as a diff on both indexes: $trm / $arm")
    // CORPUS-SIZED lexical serving: every doc queries 3 of its own rare
    // tokens against the synced text index — searchDistributed's one
    // postings scan + shuffle joins (no driver term list), per-qid
    // window top-k; compared against nothing driver-side, the require
    // is shape: every probe doc must rank ITSELF first on its own rare
    // terms
    locally {
      val vCur = graft.llmops.VersionedDir
        .currentPath(spark, s"$relOut/docs").get
      val tIdx = new graft.llmops.TextIndexStore(s"$relOut/_text_index", 64)
      val sweepQ = graft.llmops.SegPool.readDocs(spark, vCur)
        .select(col("doc_id").as("qid"),
          explode(slice(split(col("text"), " "), 13, 3)).as("term"))
      t0 = System.nanoTime()
      val top1 = tIdx.searchDistributed(sweepQ, k = 1, maxDfPermille = 600L)
      val nSelf = top1.filter(col("qid") === col("doc_id")).count()
      val nQ = top1.count()
      println(f"text sweep distributed (~20k docs x 3 rare terms, top-1): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
        s"($nSelf/$nQ probes rank themselves first)")
      require(nQ > 15000 && nSelf * 100 >= nQ * 95,
        s"rare-term self-retrieval must dominate: $nSelf/$nQ")
    }
    // corpus-sized HYBRID sweep: every live vector probes both synced
    // tiers, RRF-fused per probe to parquet — the RAG-eval shape
    locally {
      val hybOut = relDir("hyb") + "/out"
      t0 = System.nanoTime()
      val hl = GraftApp.maintenance(spark, Map(
        "GRAFT_MAINTENANCE" -> "hybrid-sweep", "GRAFT_RELEASE_OUT" -> relOut,
        "GRAFT_HYBRID_PROBES" -> "self", "GRAFT_HYBRID_OUT" -> hybOut))
      println(f"hybrid sweep (self = every live vector, both tiers): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s — ${hl.head}")
    }
    // IVF-PQ SYNCED-STORE drift → recall: the standalone drift row
    // above calibrates the rebuild gate on a hand-built IVF store; this
    // row walks the path production actually runs —
    // CorpusIndexSync.syncAnn(kind=ivfpq) across DRIFTING releases
    // (appends assign + code against the frozen centroids/codebooks),
    // then the sync verb's GRAFT_ANN_REBUILD_IF_DRIFT rebuild — and
    // requires recall@10 restored, so the knob's ~1.02 default stays
    // evidence-based end-to-end on the release path.
    locally {
      def ivfCorpus(n: Long, offset: Long, drifted: Boolean) = {
        // base docs: unstructured per-doc random vectors (every doc
        // its own direction — like real embedding corpora, and what
        // keeps the lowest-id k-means seeding representative). Drifted
        // docs: 32 hash-random mode centers FARTHER OUT than anything
        // the frozen build saw, plus noise — same-mode neighbors (the
        // cosine ground truth) SCATTER across the frozen clusters, so
        // bounded-nprobe recall genuinely degrades until the rebuild
        // re-clusters (the standalone drift row's geometry, walked
        // through the release path)
        val signal =
          if (!drifted) "0.0"
          else
            s"(CAST(conv(substr(md5(concat('m', " +
              s"CAST((id + $offset) % 32 AS STRING), '_', " +
              "CAST(j AS STRING))), 1, 6), 16, 10) AS BIGINT) % 8000 " +
              "- 4000) / 1000.0"
        val noiseScale = if (drifted) 4000 else 4000
        spark.range(n).select((col("id") + offset).as("doc_id"),
          lit("probe").as("source"),
          expr(s"""concat('the quick brown fox and the lazy dog of the old town ',
            concat_ws(' ', transform(sequence(0, 29), p ->
              concat('vtok', CAST(CAST(conv(substr(md5(concat(
                CAST(id + $offset AS STRING),
                '_v_', CAST(p AS STRING))), 1, 6), 16, 10) AS BIGINT)
                % 50000 AS STRING)))))""").as("text"),
          expr(s"""transform(sequence(0, 15), j -> CAST($signal +
            (CAST(conv(substr(md5(concat(CAST(id + $offset AS STRING),
              '_w_', CAST(j AS STRING))), 1, 6), 16, 10) AS BIGINT)
              % $noiseScale - ${noiseScale / 2}) / 1000.0 AS FLOAT))""")
            .as("embedding"))
      }
      val ivfOut = relDir("ivfpq") + "/rel"
      def annSync(extra: (String, String)*): Seq[String] =
        GraftApp.maintenance(spark, Map(
          "GRAFT_MAINTENANCE" -> "ann-index-sync",
          "GRAFT_RELEASE_OUT" -> ivfOut,
          "GRAFT_ANN_SYNC_KIND" -> "ivfpq",
          "GRAFT_ANN_SYNC_CLUSTERS" -> "64") ++ extra)
      val ivfRaw1 = relDir("ivfraw1")
      ivfCorpus(4000, 0, drifted = false)
        .write.mode("overwrite").parquet(ivfRaw1)
      GraftApp.maintenance(spark, relEnv ++ Map(
        "GRAFT_RELEASE_OUT" -> ivfOut, "GRAFT_RELEASE_DOCS" -> ivfRaw1))
      t0 = System.nanoTime()
      annSync()
      println(f"ann-index sync cold (4k docs ivfpq rebuild): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s")
      // two drifting releases: each appends 1000 two-hot docs
      (1 to 2).foreach { r =>
        val raw = relDir(s"ivfraw${r + 1}")
        ivfCorpus(4000, 0, drifted = false)
          .unionByName(ivfCorpus(r * 1000L, 100000L, drifted = true))
          .write.mode("overwrite").parquet(raw)
        GraftApp.maintenance(spark, relEnv ++ Map(
          "GRAFT_RELEASE_OUT" -> ivfOut, "GRAFT_RELEASE_DOCS" -> raw))
        annSync()
      }
      def recall(np: Int): Double = {
        val st = new graft.llmops.AnnIndexStore(s"$ivfOut/_ann_index")
        val probes = (100000L until 100030L).toSeq
        // the ivfpq serve path: ADC shortlist + exact rerank; the
        // exhaustive arm probes ALL clusters with the same shortlist,
        // so the recall delta isolates the cluster pruning the drift
        // gate protects
        def top(n: Int): Map[Long, Set[Long]] =
          st.pqTopKBatchDistributed(probes.toDF("vec_id"), k = 10,
              nprobe = n, shortlist = 100)
            .select("pid", "vec_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
            .view.mapValues(_.map(_._2).toSet).toMap
        val (ap, ex) = (top(np), top(64))
        probes.map(p => (ap.getOrElse(p, Set.empty) intersect
          ex.getOrElse(p, Set.empty)).size / 10.0).sum / probes.size
      }
      val recPre = recall(4)
      t0 = System.nanoTime()
      val rebLines = annSync("GRAFT_ANN_REBUILD_IF_DRIFT" -> "1.02")
      val rebSecs = (System.nanoTime() - t0) / 1e9
      val recPost = recall(4)
      println(f"ann ivfpq SYNCED drift: recall@10(nprobe=4/64) " +
        f"pre=$recPre%.2f post-release-rebuild=$recPost%.2f " +
        f"(rebuild $rebSecs%.1f s; ${rebLines.mkString("; ")})")
      require(rebLines.exists(_.contains("rebuilt ivf")),
        "drifted synced appends must trip the x1.02 gate on the " +
          s"release path: $rebLines")
      require(recPost >= 0.9 && recPost >= recPre + 0.05,
        f"release-verb rebuild must restore a REAL recall loss " +
          f"(drifted appends must degrade bounded-nprobe recall first): " +
          f"$recPre%.2f -> $recPost%.2f")
    }
    // WIDE retraction: a whole source GDPR-deleted out of a corpus
    // frozen as many hash sub-segments — every holding sub-seg
    // rebuilds, but through ONE partitioned job (the r<batch>-v<N>
    // pool parent), so the wall time is one shuffle of the affected
    // bytes, never one sequential Spark job per segment
    val relRawW = relDir("raww")
    relCorpus(20000, 40000)
      .withColumn("source",
        when(col("doc_id") % 10 === 0, lit("purged")).otherwise(lit("kept")))
      .write.mode("overwrite").parquet(relRawW)
    val relOutW = relDir("outw") + "/rel"
    val wideEnv = relEnv ++ Map("GRAFT_RELEASE_OUT" -> relOutW,
      "GRAFT_RELEASE_SEG_ROWS" -> "2000") // ~10 sub-segs at 20k docs
    GraftApp.maintenance(spark, wideEnv + ("GRAFT_RELEASE_DOCS" -> relRawW))
    val nSubSegs = graft.llmops.SegPool.readManifest(
      new org.apache.hadoop.fs.Path(relOutW).getFileSystem(
        spark.sessionState.newHadoopConf()),
      graft.llmops.VersionedDir.currentPath(spark, s"$relOutW/docs").get).size
    // text index synced at v1 so the wide retraction below lands as a
    // 2000-id tombstone diff — the compact row then times the
    // driver-free physical purge over it
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "text-index-sync", "GRAFT_RELEASE_OUT" -> relOutW))
    val relRawW2 = relDir("raww2")
    spark.read.parquet(relRawW).filter(col("source") =!= "purged")
      .write.mode("overwrite").parquet(relRawW2)
    t0 = System.nanoTime()
    GraftApp.maintenance(spark, wideEnv +
      ("GRAFT_RELEASE_DOCS" -> relRawW2) +
      ("GRAFT_RELEASE_TEXT_INDEX" -> "1") +
      // auto-compact held off: the compact is timed as its own row
      ("GRAFT_RELEASE_TEXT_COMPACT" -> "0"))
    println(f"release WIDE retraction (2k docs of 20k, " +
      f"${GraftApp.lastFreezePlan._1.size}/$nSubSegs sub-segs rebuilt, " +
      f"one job): ${(System.nanoTime() - t0) / 1e9}%.1f s [$stagesStr]")
    require(GraftApp.lastFreezePlan._1.size >= 5,
      "a hash-spread source must span (and rebuild) many sub-segs: " +
        s"${GraftApp.lastFreezePlan}")
    locally {
      val vCur = graft.llmops.VersionedDir
        .currentPath(spark, s"$relOutW/docs").get
      val left = graft.llmops.SegPool.readDocs(spark, vCur)
      require(left.filter(col("source") === "purged").count() == 0,
        "wide retraction must drop the whole source")
      require(left.count() == 18000, "kept docs must survive")
    }
    // the text-index WIDE-RETRACTION purge: 2000 pending tombstones
    // (the sync's diff wrote them distributed) fold out of the postings
    // by anti-join — no driver id set at any width (spec-pinned in
    // WideRetractionSpec; this row is the wall-clock evidence)
    locally {
      val wIdx = new graft.llmops.TextIndexStore(s"$relOutW/_text_index", 64)
      val wr = GraftApp.lastIndexSync.get
      require(wr.mode == "diff" && wr.removed == 2000,
        s"wide retraction must sync as a 2000-id tombstone diff: $wr")
      val pending = wIdx.tombstoneCount(spark)
      require(pending == 2000L, s"pending tombstones: $pending")
      t0 = System.nanoTime()
      wIdx.compact(spark)
      println(f"text-index wide-retraction compact (2000 of 20000 dead, " +
        f"driver-free anti-join purge): ${(System.nanoTime() - t0) / 1e9}%.1f s")
      require(wIdx.tombstoneCount(spark) == 0L, "compact must clear the set")
      val wDead = spark.read.parquet(s"$relOutW/_text_index")
        .select("doc_id").distinct()
        .filter(col("doc_id") % 10 === 0).count()
      require(wDead == 0, s"purged docs still in the postings: $wDead")
    }
    // SELECTIVE purge vs full compact at the SAME retraction: when the
    // dead docs are confined to one ingest batch of ten (the common
    // shape — a source leaves, and sources arrive in specific release
    // batches), purge must cost O(affected batch) — it rewrites ONE
    // batch's postings/df/lens/stats and leaves the other nine
    // byte-untouched — while compact rewrites the whole index. Same
    // survivors, bit-identical ranking (required below).
    locally {
      val corpus = relCorpus(20000, 200000).select("doc_id", "text")
        .localCheckpoint(true)
      val pDir = relDir("selpurge") + "/idx"
      val cDir = relDir("selcompact") + "/idx"
      val pIdx = new graft.llmops.TextIndexStore(pDir, 64, serveDeadBound = 0L)
      val cIdx = new graft.llmops.TextIndexStore(cDir, 64, serveDeadBound = 0L)
      (0 until 10).foreach { b =>
        val part = corpus.filter(col("doc_id") % 10 === b)
        pIdx.addBatch(spark, part, b)
        cIdx.addBatch(spark, part, b)
      }
      val deadW = corpus.filter(col("doc_id") % 10 === 7).select("doc_id")
      pIdx.delete(spark, deadW)
      cIdx.delete(spark, deadW)
      t0 = System.nanoTime()
      val (aff, unt) = pIdx.purge(spark)
      val purgeSecs = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      cIdx.compact(spark)
      val compactSecs = (System.nanoTime() - t0) / 1e9
      println(f"text-index SELECTIVE purge (2k dead confined to 1 of 10 " +
        f"batches): purge=$purgeSecs%.1f s ($aff batch rewritten, $unt " +
        f"untouched) vs full compact=$compactSecs%.1f s " +
        f"(x${compactSecs / math.max(purgeSecs, 0.001)}%.1f)")
      require(aff == 1 && unt == 9, s"selectivity: ($aff, $unt)")
      val qp = corpus.filter(col("doc_id").isin(200003L, 200015L))
        .select(col("doc_id").as("qid"),
          explode(expr("slice(split(text, ' '), 12, 3)")).as("term"))
        .localCheckpoint(true)
      def rows(ix: graft.llmops.TextIndexStore) =
        ix.search(spark, qp, k = 10, maxDfPermille = 900L).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
          .toSeq.sorted
      require(rows(pIdx) == rows(cIdx),
        "selective purge and full compact must serve identically")
      // the ANN sibling: a 5-id retraction touches ≤5 of 64 vector part
      // dirs (ids hash straight to their dirs — zero discovery reads)
      // plus only the bucket dirs holding those ids; everything else
      // stays byte-untouched (SelectivePurgeSpec pins the inventory)
      val aDir = relDir("annselp") + "/idx"
      val aIdx = new graft.llmops.AnnIndexStore(aDir, serveDeadBound = 0L)
      aIdx.writeLsh(relCorpus(20000, 200000).select("doc_id", "embedding"),
        idCol = "doc_id")
      aIdx.delete(spark, Seq(200011L, 200012L, 200013L, 200014L, 200016L))
      t0 = System.nanoTime()
      val (aAff, aUnt) = aIdx.purge(spark)
      println(f"ann-index SELECTIVE purge (5 dead of 20k): " +
        f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"($aAff dirs rewritten, $aUnt untouched)")
      require(aAff < aUnt, s"a 5-id purge must leave most dirs: ($aAff, $aUnt)")
    }

    spark.stop()
  }
}
