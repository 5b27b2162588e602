package graft

import graft.llmops.LshIndexStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Durable incremental LSH index: cross-batch dup detection, O(touched)
  * read planning, replay idempotence, offline compaction. */
class LshIndexStoreSpec extends SparkSpecBase {

  private def doc(id: Long, words: Seq[String]) = (id, words.mkString(" "))

  private def corpus(ids: Range, tag: String) =
    ids.map(i => doc(i.toLong,
      (1 to 30).map(j => s"${tag}_${i}_w$j")))

  test("cross-batch dups are caught; survivors (and only they) are indexed") {
    import spark.implicits._
    val path = Files.createTempDirectory("lshidx").toFile.getAbsolutePath + "/idx"
    val store = new LshIndexStore(path, simThreshold = 0.9)

    val base = (1 to 10).map(j => s"common w$j extra token$j filler$j")
    val original = doc(1L, base)
    val batch1 = (original +: corpus(2 to 5, "a")).toDF("doc_id", "text")
    val hits1 = store.addBatch(spark, batch1, 0L)
    assert(hits1.count() == 0, "batch 1 has no dups")

    // batch 2: doc 100 is an exact text copy of doc 1 (batch 1), doc 101
    // copies doc 102 WITHIN the batch; 103 is fresh
    val batch2 = Seq(
      doc(100L, base),
      doc(102L, (1 to 12).map(j => s"intra v$j mid$j")),
      doc(101L, (1 to 12).map(j => s"intra v$j mid$j")),
      doc(103L, (1 to 25).map(j => s"fresh_$j"))).toDF("doc_id", "text")
    val hits2 = store.addBatch(spark, batch2, 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits2.exists(h => h._1 == 100L && h._2 == 1L && h._3 == 1.0),
      s"cross-batch exact copy must hit the index: ${hits2.mkString(",")}")
    assert(hits2.exists(h => h._1 == 102L && h._2 == 101L),
      s"intra-batch dup must resolve smaller-id-wins: ${hits2.mkString(",")}")

    val indexed = store.indexRows(spark).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!indexed.contains(100L) && !indexed.contains(102L),
      "dups must not be indexed")
    assert(indexed.contains(101L) && indexed.contains(103L) && indexed.contains(1L))
  }

  test("read planning is O(touched parts), not O(index)") {
    import spark.implicits._
    val path = Files.createTempDirectory("lshidx-prune").toFile.getAbsolutePath + "/idx"
    val store = new LshIndexStore(path, simThreshold = 0.9, numParts = 16)
    store.addBatch(spark, corpus(1 to 40, "seed").toDF("doc_id", "text"), 0L)
    // one incoming doc touches ≤ 4 band buckets → ≤ 4 parts of 16
    store.addBatch(spark, corpus(500 to 500, "x").toDF("doc_id", "text"), 1L)
    assert(store.lastPlannedDirs.nonEmpty)
    val partsRead = store.lastPlannedDirs
      .map(_.split("/part=").last.toInt).toSet
    assert(partsRead.size <= 4,
      s"single doc must read ≤ 4 of 16 parts, read $partsRead")
  }

  test("replay: marker makes re-delivery a no-op; crash-before-marker is exact") {
    import spark.implicits._
    val path = Files.createTempDirectory("lshidx-replay").toFile.getAbsolutePath + "/idx"
    val store = new LshIndexStore(path, simThreshold = 0.9)
    val b1 = corpus(1 to 6, "r").toDF("doc_id", "text")
    store.addBatch(spark, b1, 0L)
    val snapshot = store.indexRows(spark)
      .collect().map(_.toSeq).toSet

    // marker present → replay emits nothing and changes nothing
    assert(store.addBatch(spark, b1, 0L).count() == 0)
    assert(store.indexRows(spark).collect().map(_.toSeq).toSet == snapshot)

    // crash-before-marker: delete the marker (data retained) → replay
    // rewrites the batch dirs to the identical end state, no doubling
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path, "_applied/0"), false)
    val replayHits = store.addBatch(spark, b1, 0L)
    assert(replayHits.count() == 0,
      "replay must not dup-match docs against their own crashed write")
    assert(store.indexRows(spark).collect().map(_.toSeq).toSet == snapshot)
  }

  test("compaction folds batches, preserves content, and survives a crash mid-swap") {
    import spark.implicits._
    val path = Files.createTempDirectory("lshidx-compact").toFile.getAbsolutePath + "/idx"
    val store = new LshIndexStore(path, simThreshold = 0.9)
    (0 to 3).foreach(b =>
      store.addBatch(spark,
        corpus(b * 10 + 1 to b * 10 + 5, s"c$b").toDF("doc_id", "text"), b.toLong))
    val before = store.indexRows(spark).collect().map(_.toSeq).toSet
    store.compact(spark)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
    assert(dirs == Seq("batch=0"), s"compaction must fold to one batch dir: $dirs")
    assert(store.indexRows(spark).collect().map(_.toSeq).toSet == before)
    // markers survive → an ancient replayed batch is still a no-op
    assert(store.addBatch(spark,
      corpus(11 to 15, "c1").toDF("doc_id", "text"), 1L).count() == 0)

    // crash mid-swap: staging committed (done-marker) but root deletion
    // interrupted → next compact() rolls forward
    val staging = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path).getParent, "idx._lsh_compact")
    fs.mkdirs(staging)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(path),
      fs, staging, false, spark.sessionState.newHadoopConf())
    // FileUtil.copy copies INTO staging/idx — flatten to staging root
    fs.listStatus(new org.apache.hadoop.fs.Path(staging, "idx")).foreach(s =>
      fs.rename(s.getPath, new org.apache.hadoop.fs.Path(staging, s.getPath.getName)))
    fs.delete(new org.apache.hadoop.fs.Path(staging, "idx"), true)
    fs.create(new org.apache.hadoop.fs.Path(staging, "_graft_compact_done"), true).close()
    store.compact(spark) // rolls the interrupted swap forward
    assert(store.indexRows(spark).collect().map(_.toSeq).toSet == before)
    assert(!fs.exists(staging))
  }

  test("a mismatched part modulus is refused, not silently mis-planned") {
    import spark.implicits._
    val path = Files.createTempDirectory("lshidx-parts")
      .toFile.getAbsolutePath + "/idx"
    new LshIndexStore(path, numParts = 16)
      .addBatch(spark, corpus(1 to 3, "a").toDF("doc_id", "text"), 0L)
    val err = intercept[IllegalArgumentException] {
      new LshIndexStore(path, numParts = 64)
        .addBatch(spark, corpus(4 to 6, "b").toDF("doc_id", "text"), 1L)
    }
    assert(err.getMessage.contains("numParts=16"))
  }
}
