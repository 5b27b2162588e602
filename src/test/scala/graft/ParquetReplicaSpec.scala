package graft

import graft.sinks.ParquetReplicaSink
import java.nio.file.Files

/** MERGE-semantics replica maintenance (the 100 TB apply path). */
class ParquetReplicaSpec extends SparkSpecBase {

  test("upsert + delete across batches yields the reference end state") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-replica").toFile.getAbsolutePath + "/t1"
    val sink = new ParquetReplicaSink(path, Seq("id"))

    // batch 0: inserts 1..5
    sink.applyBatch(spark,
      (1 to 5).map(i => (i, i * 10, "c", i.toLong)).toDF("id", "val", "op", "lsn"), 0)
    assert(spark.read.parquet(path).count() == 5)

    // batch 1: update 2 twice (last wins), delete 4, insert 6
    sink.applyBatch(spark, Seq(
      (2, 21, "u", 10L), (2, 22, "u", 11L), (4, 0, "d", 12L), (6, 60, "c", 13L))
      .toDF("id", "val", "op", "lsn"), 1)

    val got = spark.read.parquet(path).as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 10, 2 -> 22, 3 -> 30, 5 -> 50, 6 -> 60))
  }

  test("run-length squash: within-batch latest-by-lsn wins even out of order") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-replica2").toFile.getAbsolutePath + "/t1"
    val sink = new ParquetReplicaSink(path, Seq("id"))
    sink.applyBatch(spark, Seq(
      (1, 3, "u", 30L), (1, 1, "c", 10L), (1, 2, "u", 20L))
      .toDF("id", "val", "op", "lsn"), 0)
    val got = spark.read.parquet(path).as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 3))
  }

  test("delete as the final state removes the key entirely") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft-replica3").toFile.getAbsolutePath + "/t1"
    val sink = new ParquetReplicaSink(path, Seq("id"))
    sink.applyBatch(spark, Seq((1, 1, "c", 1L)).toDF("id", "val", "op", "lsn"), 0)
    sink.applyBatch(spark, Seq((1, 0, "d", 2L)).toDF("id", "val", "op", "lsn"), 1)
    assert(spark.read.parquet(path).count() == 0)
  }
}
