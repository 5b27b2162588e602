package graft

import java.nio.file.Files
import graft.llmops.TextIndexStore
import graft.streaming.GraftApp
import org.apache.spark.sql.functions._

/** The standalone sync verb's maintenance knobs end to end:
  * GRAFT_TEXT_PURGE=1 runs the selective purge after the sync
  * (tombstones cleared, dead postings physically gone, untouched
  * batches byte-identical) and GRAFT_TEXT_FOLD_BATCHES=N runs the
  * tiered fold (batch dirs bounded, tombstone-free ranking parity with
  * a fresh build). */
class IndexVerbKnobsSpec extends SparkSpecBase {

  test("text-index-sync verb: GRAFT_TEXT_PURGE purges selectively, " +
      "GRAFT_TEXT_FOLD_BATCHES bounds the batch dirs; parity throughout") {
    import spark.implicits._
    def en(tag: String, zebras: Int): String =
      (("the start and more of it" +: (0 until 24).map(i => s"$tag$i")) ++
        Seq.fill(zebras)("zebra")).mkString(" ")
    val docs = (1L to 6L).map(i => (i, "web", en(s"k$i", i.toInt % 4)))
    def writeRaw(rows: Seq[(Long, String, String)]): String = {
      val d = Files.createTempDirectory("ivk-raw").toFile.getAbsolutePath
      rows.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(d)
      d
    }
    val tok = Files.createTempDirectory("ivk-tok")
      .toFile.getAbsolutePath + "/tok"
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "bpe-train",
      "GRAFT_BPE_DOCS" -> writeRaw(docs.take(2)),
      "GRAFT_BPE_OUT" -> tok, "GRAFT_BPE_MERGES" -> "3"))
    val out = Files.createTempDirectory("ivk-out")
      .toFile.getAbsolutePath + "/rel"
    def release(rows: Seq[(Long, String, String)]): Unit =
      GraftApp.maintenance(spark, Map(
        "GRAFT_MAINTENANCE" -> "release", "GRAFT_RELEASE_DOCS" -> writeRaw(rows),
        "GRAFT_RELEASE_OUT" -> out, "GRAFT_EMIT_TOKENIZER" -> tok,
        "GRAFT_RELEASE_RETAIN" -> "6",
        "GRAFT_EMIT_BUDGET" -> "64", "GRAFT_EMIT_SHARDS" -> "2"))
    def sync(extra: (String, String)*): Seq[String] =
      GraftApp.maintenance(spark, Map(
        "GRAFT_MAINTENANCE" -> "text-index-sync",
        "GRAFT_RELEASE_OUT" -> out) ++ extra)
    val idxDir = s"$out/_text_index"
    // three synced versions -> three batch dirs (rebuild + two diffs)
    release(docs.take(2)); sync()
    release(docs.take(4)); sync()
    release(docs); sync()
    def batchDirs: Seq[String] = Option(new java.io.File(idxDir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("batch="))
      .map(_.getName).sorted.toSeq
    assert(batchDirs.size == 3, s"$batchDirs")
    // retract docs 3,4 (they live in the v2-sync batch) — sync the
    // retraction WITHOUT purging, then the PURGE knob clears it
    release(docs.filterNot(d => d._1 == 3L || d._1 == 4L))
    sync()
    assert(new java.io.File(idxDir, "_tombstones").exists())
    val untouched = batchDirs.filterNot(_ == "batch=2")
    val lines = sync("GRAFT_TEXT_PURGE" -> "1")
    assert(lines.exists(_.contains("noop")), s"$lines")
    assert(!new java.io.File(idxDir, "_tombstones").exists(),
      "the purge knob must clear the pending tombstones")
    assert(spark.read.parquet(idxDir).select("doc_id")
      .filter(col("doc_id").isin(3L, 4L)).isEmpty,
      "dead postings must be physically gone")
    assert(batchDirs.filterNot(_ == "batch=2") == untouched)
    // the FOLD knob bounds the batch dirs
    sync("GRAFT_TEXT_FOLD_BATCHES" -> "2")
    assert(batchDirs.size <= 2, s"$batchDirs")
    // ranking parity with a fresh build over the current corpus
    val q = Seq(("q", "zebra")).toDF("qid", "term")
    def hits(ix: TextIndexStore) =
      ix.search(spark, q, k = 10).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    val curDir = graft.llmops.VersionedDir
      .currentPath(spark, s"$out/docs").get
    val fd = Files.createTempDirectory("ivk-fresh")
      .toFile.getAbsolutePath + "/idx"
    val fresh = new TextIndexStore(fd, 64)
    fresh.addBatch(spark,
      graft.llmops.SegPool.readDocs(spark, curDir).select("doc_id", "text"), 0L)
    val (hs, hf) = (hits(new TextIndexStore(idxDir, 64)), hits(fresh))
    assert(hs == hf && hs.nonEmpty, s"synced $hs\nfresh $hf")
  }

  test("auto-fold default: batch dirs stay bounded WITHOUT the fold " +
      "knob; GRAFT_TEXT_FOLD_BATCHES=0 opts out; parity preserved") {
    import spark.implicits._
    def en(tag: String, zebras: Int): String =
      (("the start and more of it" +: (0 until 24).map(i => s"$tag$i")) ++
        Seq.fill(zebras)("zebra")).mkString(" ")
    val docs = (1L to 5L).map(i => (i, "web", en(s"af$i", i.toInt % 3)))
    def writeRaw(rows: Seq[(Long, String, String)]): String = {
      val d = Files.createTempDirectory("afd-raw").toFile.getAbsolutePath
      rows.toDF("doc_id", "source", "text").write.mode("overwrite").parquet(d)
      d
    }
    val tok = Files.createTempDirectory("afd-tok")
      .toFile.getAbsolutePath + "/tok"
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "bpe-train",
      "GRAFT_BPE_DOCS" -> writeRaw(docs.take(2)),
      "GRAFT_BPE_OUT" -> tok, "GRAFT_BPE_MERGES" -> "3"))
    val out = Files.createTempDirectory("afd-out")
      .toFile.getAbsolutePath + "/rel"
    def release(rows: Seq[(Long, String, String)]): Unit =
      GraftApp.maintenance(spark, Map(
        "GRAFT_MAINTENANCE" -> "release", "GRAFT_RELEASE_DOCS" -> writeRaw(rows),
        "GRAFT_RELEASE_OUT" -> out, "GRAFT_EMIT_TOKENIZER" -> tok,
        "GRAFT_RELEASE_RETAIN" -> "8",
        "GRAFT_EMIT_BUDGET" -> "64", "GRAFT_EMIT_SHARDS" -> "2"))
    def sync(extra: (String, String)*): Unit =
      GraftApp.maintenance(spark, Map(
        "GRAFT_MAINTENANCE" -> "text-index-sync",
        "GRAFT_RELEASE_OUT" -> out,
        // test-scaled auto bound (the production default is 32 — a
        // nightly cadence takes a month to reach it)
        "GRAFT_TEXT_FOLD_AUTO_MAX" -> "2") ++ extra)
    val idxDir = s"$out/_text_index"
    def batchDirs: Seq[String] = Option(new java.io.File(idxDir).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("batch="))
      .map(_.getName).sorted.toSeq
    // releases 1-2: at or under the bound, nothing folds
    release(docs.take(2)); sync()
    release(docs.take(3)); sync()
    assert(batchDirs.size == 2, s"$batchDirs")
    // release 3: 3 dirs > 2 -> the DEFAULT folds down to the bound,
    // no knob set anywhere
    release(docs.take(4)); sync()
    assert(batchDirs.size <= 2,
      s"auto-fold must bound the serve plan by default: $batchDirs")
    // explicit opt-out: the next sync leaves the new batch unfolded
    release(docs); sync("GRAFT_TEXT_FOLD_BATCHES" -> "0")
    assert(batchDirs.size == 3,
      s"=0 must opt out of the auto-fold: $batchDirs")
    // ranking parity with a fresh build over the current corpus
    val q = Seq(("q", "zebra")).toDF("qid", "term")
    def hits(ix: TextIndexStore) =
      ix.search(spark, q, k = 10).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    val curDir = graft.llmops.VersionedDir
      .currentPath(spark, s"$out/docs").get
    val fd = Files.createTempDirectory("afd-fresh")
      .toFile.getAbsolutePath + "/idx"
    val fresh = new TextIndexStore(fd, 64)
    fresh.addBatch(spark,
      graft.llmops.SegPool.readDocs(spark, curDir).select("doc_id", "text"), 0L)
    val (hs, hf) = (hits(new TextIndexStore(idxDir, 64)), hits(fresh))
    assert(hs == hf && hs.nonEmpty, s"synced $hs\nfresh $hf")
  }
}
