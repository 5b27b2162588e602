package graft

import java.nio.file.Files
import graft.llmops.TextIndexStore
import org.apache.spark.sql.functions._

/** Tiered batch fold ([[TextIndexStore.fold]]) — the LSM answer to the
  * one-batch-per-release growth of the synced index: merge only the
  * SMALLEST batches down to `keepBatches` dirs, leave every large
  * batch's files byte-untouched, keep the crashed-sync id invariant
  * (merged dir takes the largest folded id), and NEVER clear pending
  * tombstones (unfolded batches may still hold dead docs) while
  * purging the folded subset in passing. */
class TieredFoldSpec extends SparkSpecBase {

  private def inventory(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    walk(dir).map(f =>
      f.getAbsolutePath.stripPrefix(dir.getAbsolutePath) ->
        (f.length(), f.lastModified())).toMap
  }

  /** batches 0-3 small (10 docs), 4-5 large (200 docs); doc ids are
    * batch*1000+i so membership is readable in assertions. */
  private def mkDocs(b: Long) = {
    import spark.implicits._
    val n = if (b >= 4) 200 else 10
    (0 until n).map(i => (b * 1000 + i, s"zz t${b}x$i tail"))
      .toDF("doc_id", "text")
  }

  test("fold merges the smallest batches into the largest folded id; " +
      "large batches byte-identical; parity; planning bounded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fold").toFile.getAbsolutePath + "/idx"
    val store = new TextIndexStore(dir, numParts = 8)
    (0L to 5L).foreach(b => store.addBatch(spark, mkDocs(b), b))
    val untouched = Seq("batch=4", "batch=5", "_df/batch=4", "_df/batch=5",
        "_lens/batch=4", "_lens/batch=5", "_stats/batch=4", "_stats/batch=5")
      .map(s => s -> inventory(new java.io.File(dir, s))).toMap
    val q = Seq(("q", "zz")).toDF("qid", "term")
    val before = store.search(spark, q, k = 1000).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq.sorted

    assert(store.fold(spark, keepBatches = 3) == ((4, 2)),
      "four smallest batches fold, two large ones stay")
    assert(store.lastFold == ((4, 2)))

    // the merged dir carries the LARGEST folded id (3): ids above the
    // synced version must still mean "crashed attempt"
    assert(new java.io.File(dir, "batch=3").exists())
    Seq(0, 1, 2).foreach(b =>
      assert(!new java.io.File(dir, s"batch=$b").exists() &&
        !new java.io.File(dir, s"_lens/batch=$b").exists(),
        s"folded batch $b must be gone"))
    untouched.foreach { case (s, inv) =>
      assert(inventory(new java.io.File(dir, s)) == inv,
        s"$s was rewritten by a fold that did not concern it") }
    // ranking identical before/after the fold
    val after = store.search(spark, q, k = 1000).collect()
      .map(r => (r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(after == before, "fold must not change any ranking")
    assert(after.size == 4 * 10 + 2 * 200)
    // planning now spans at most 3 batch dirs per probed part
    store.search(spark, q, k = 5).collect()
    val plannedBatches = store.lastPlannedDirs
      .map(_.split("/").takeRight(2).head).distinct
    assert(plannedBatches.size <= 3, s"planned: $plannedBatches")
    // stats exact through the merge
    assert(store.stats(spark) == ((440L, 440L * 3)))
  }

  test("fold with pending tombstones keeps them (kept batches still " +
      "hold dead docs) while purging the folded subset in passing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fold-tombs")
      .toFile.getAbsolutePath + "/idx"
    val store = new TextIndexStore(dir, numParts = 8, serveDeadBound = 0L)
    (0L to 5L).foreach(b => store.addBatch(spark, mkDocs(b), b))
    // dead docs in a SMALL (to-be-folded) batch and a LARGE (kept) one
    store.delete(spark, Seq(1000L, 1001L, 4000L, 4001L).toDF("doc_id"))
    assert(store.fold(spark, keepBatches = 3) == ((4, 2)))
    assert(new java.io.File(dir, "_tombstones").exists(),
      "fold must NOT clear tombstones — batch 4 still holds dead docs")
    // folded subset physically purged: the merged dir has no dead rows
    assert(spark.read.parquet(s"$dir/batch=3")
      .filter(col("doc_id").isin(1000L, 1001L)).isEmpty)
    // serving stays exact: equals a fresh build over the survivors
    val q = Seq(("q", "zz")).toDF("qid", "term")
    val served = store.search(spark, q, k = 1000).collect()
      .map(_.getLong(2)).toSet
    assert(!served(1000L) && !served(1001L) && !served(4000L) &&
      !served(4001L) && served.size == 440 - 4)
    // the follow-up purge clears the remaining (kept-batch) dead rows
    assert(store.purge(spark)._1 == 1, "only batch 4 still holds dead docs")
    assert(!new java.io.File(dir, "_tombstones").exists())
    assert(spark.read.parquet(s"$dir/batch=4")
      .filter(col("doc_id").isin(4000L, 4001L)).isEmpty)
    assert(store.search(spark, q, k = 1000).collect()
      .map(_.getLong(2)).toSet == served)
  }

  test("a fold crashing after its commit marker rolls forward from the " +
      "next serve entry, tombstones preserved") {
    import spark.implicits._
    val dir = Files.createTempDirectory("fold-crash")
      .toFile.getAbsolutePath + "/idx"
    val store = new TextIndexStore(dir, numParts = 8, serveDeadBound = 0L)
    (0L to 4L).foreach(b => store.addBatch(spark, mkDocs(b), b))
    store.delete(spark, Seq(4000L).toDF("doc_id")) // dead in a KEPT batch
    store.crashAfterCommit = true
    store.fold(spark, keepBatches = 2)
    store.crashAfterCommit = false
    assert(new java.io.File(dir, "_purge_stage/_graft_purge_done").exists())
    val reopened = new TextIndexStore(dir, numParts = 8, serveDeadBound = 0L)
    val q = Seq(("q", "zz")).toDF("qid", "term")
    val ids = reopened.search(spark, q, k = 1000).collect()
      .map(_.getLong(2)).toSet
    assert(ids.size == 4 * 10 + 200 - 1 && !ids(4000L),
      s"healed serve must hold every survivor exactly once: ${ids.size}")
    assert(!new java.io.File(dir, "_purge_stage").exists())
    assert(new java.io.File(dir, "_tombstones").exists(),
      "a fold heal must keep the pending tombstones")
  }
}
