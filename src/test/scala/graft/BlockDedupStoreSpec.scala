package graft

import graft.llmops.BlockDedupStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Durable incremental block dedup: stream-vs-batch parity with the
  * llm_block_dedup operator, O(touched) read planning, replay
  * idempotence, crash heal, offline compaction. */
class BlockDedupStoreSpec extends SparkSpecBase {

  // docs of 3 full 16-token blocks; block b of doc i spells out its
  // identity so any sharing is intentional
  private def blockText(tag: String, b: Int) =
    (0 until 16).map(j => s"${tag}_b${b}_w$j").mkString(" ")
  private def doc(id: Long, tags: Seq[String]) =
    (id, tags.zipWithIndex.map { case (t, b) => blockText(t, b) }.mkString(" "))

  test("sequential intake reproduces the batch llm_block_dedup exactly") {
    import spark.implicits._
    val path = Files.createTempDirectory("blk-parity").toFile.getAbsolutePath + "/blk"
    val store = new BlockDedupStore(path)
    // doc 3 repeats doc 1's second block; doc 12 (batch 2) repeats doc
    // 1's first block AND doc 11's third block within its own batch
    val b1 = Seq(
      doc(1L, Seq("a1", "shared", "a3")),
      doc(2L, Seq("b1", "b2", "b3")),
      doc(3L, Seq("c1", "shared", "c3"))).toDF("doc_id", "text")
    val b2 = Seq(
      doc(11L, Seq("d1", "d2", "dup2")),
      doc(12L, Seq("a1", "e2", "dup2"))).toDF("doc_id", "text")

    val streamed = store.addBatch(spark, b1, 0L)
      .unionByName(store.addBatch(spark, b2, 1L))
      .withColumn("kept_hash", md5(col("kept_text"))).drop("kept_text")

    val all = b1.unionByName(b2)
    val dir = Files.createTempDirectory("blk-docs").toFile.getAbsolutePath
    all.write.parquet(s"$dir/documents.parquet")
    val batch = graft.queries.LlmQueries.queries("llm_block_dedup")(spark, dir)

    assert(streamed.count() == 5)
    assert(batch.exceptAll(streamed).isEmpty && streamed.exceptAll(batch).isEmpty,
      s"stream: ${streamed.orderBy("doc_id").collect().mkString("\n")}\n" +
        s"batch: ${batch.collect().mkString("\n")}")
    // and the specific plants landed: doc 3 lost its shared block,
    // doc 12 lost both its cross-batch and intra-batch repeats
    val kept = streamed.collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kept(1L) == 3 && kept(2L) == 3 && kept(3L) == 2)
    assert(kept(11L) == 3 && kept(12L) == 1)
  }

  test("read planning is O(touched parts); replay is a no-op") {
    import spark.implicits._
    val path = Files.createTempDirectory("blk-prune").toFile.getAbsolutePath + "/blk"
    val store = new BlockDedupStore(path, numParts = 16)
    val seed = (1 to 40).map(i =>
      doc(i.toLong, Seq(s"s${i}a", s"s${i}b", s"s${i}c"))).toDF("doc_id", "text")
    store.addBatch(spark, seed, 0L)
    // one 1-block doc touches exactly 1 part of 16
    val one = Seq((500L, blockText("lone", 0))).toDF("doc_id", "text")
    val first = store.addBatch(spark, one, 1L).collect().toSet
    assert(store.lastPlannedDirs.nonEmpty)
    val partsRead = store.lastPlannedDirs.map(_.split("/part=").last.toInt).toSet
    assert(partsRead.size == 1, s"1-block doc must read 1 of 16 parts: $partsRead")

    // replay of an applied batch: the index is untouched and the SAME
    // rewrite comes back (recomputed from durable ownership), so a
    // downstream sink can persist it again and converge
    val before = store.indexRows(spark).count()
    val replay = store.addBatch(spark, one, 1L).collect().toSet
    assert(replay == first, s"replay rewrite must match: $replay vs $first")
    assert(store.indexRows(spark).count() == before)
  }

  test("a mismatched part modulus is refused, not silently mis-planned") {
    import spark.implicits._
    val path = Files.createTempDirectory("blk-parts").toFile.getAbsolutePath + "/blk"
    new BlockDedupStore(path, numParts = 16)
      .addBatch(spark, Seq(doc(1L, Seq("p1", "p2", "p3")))
        .toDF("doc_id", "text"), 0L)
    val err = intercept[IllegalArgumentException] {
      new BlockDedupStore(path, numParts = 64)
        .addBatch(spark, Seq(doc(2L, Seq("q1", "q2", "q3")))
          .toDF("doc_id", "text"), 1L)
    }
    assert(err.getMessage.contains("numParts=16"))
  }

  test("crash heal: lost marker replays idempotently; compact folds batches") {
    import spark.implicits._
    val path = Files.createTempDirectory("blk-crash").toFile.getAbsolutePath + "/blk"
    val store = new BlockDedupStore(path, numParts = 8)
    val b1 = Seq(doc(1L, Seq("x1", "x2", "x3"))).toDF("doc_id", "text")
    val b2 = Seq(doc(2L, Seq("x1", "y2", "y3"))).toDF("doc_id", "text")
    store.addBatch(spark, b1, 0L)
    val out2 = store.addBatch(spark, b2, 1L).collect()
    assert(out2.head.getLong(2) == 2, "doc 2 keeps 2 of 3 blocks")

    // crash window: data written but marker lost → re-run must converge
    // to the same ownership (doc 2 still must NOT own the x1 block)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path, "_applied/1"), true)
    val replay = store.addBatch(spark, b2, 1L).collect()
    assert(replay.head.getLong(2) == 2, "healed replay keeps the same 2 blocks")
    val owners = store.indexRows(spark)
      .groupBy("bhash").agg(countDistinct("doc_id").as("n"))
      .agg(max("n")).first().getLong(0)
    assert(owners == 1L, "every block hash has exactly one owner after heal")

    store.compact(spark)
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
    assert(dirs == Seq("batch=0"), s"compact must fold to batch=0: $dirs")
    // post-compact intake still sees the folded ownership
    val b3 = Seq(doc(3L, Seq("x1", "z2", "z3"))).toDF("doc_id", "text")
    assert(store.addBatch(spark, b3, 2L).first().getLong(2) == 2)
  }
}
