package graft

import graft.operators.Skew
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Scale-machinery checks: bucketed co-located joins (no shuffle) and
  * salted skew joins (correctness under replication). */
class ScaleShapeSpec extends SparkSpecBase {

  test("bucketed tables join without a shuffle exchange (co-located q3 shape)") {
    val sf = "/root/testdata/sf0.001"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    // the 100 TB layout: fact and dim co-bucketed on the join key
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_b")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_b")
    // broadcast would hide the point at this size — force SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) +
          p.children.map(shuffles).sum
      // only the final groupBy(status) may shuffle — the JOIN must not
      assert(shuffles(plan) <= 1,
        s"bucketed join shuffled: ${plan.toString.take(1200)}")
      assert(plan.toString.contains("SortMergeJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10 * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("zone-consulted scan plans a fraction of the bucket dirs (skip ratio observable)") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("shape-zones")
      .toFile.getAbsolutePath + "/t1"
    val sink = new graft.sinks.ParquetReplicaSink(path, Seq("id"), numBuckets = 16)
    // layout-correlated stat column (the shape zone maps exist for):
    // region derives from the row's own hash bucket
    val bucketOf = (1 to 800).toDF("id")
      .withColumn("b", pmod(hash(col("id")), lit(16)))
      .as[(Int, Int)].collect().toMap
    sink.applyBatch(spark, (1 to 800).map(i =>
        (i, f"r${bucketOf(i)}%02d", i, "c", i.toLong))
      .toDF("id", "region", "amt", "op", "lsn"), 0)
    // chaos-shaped churn: a delete-heavy second batch (scenario3) must
    // leave the zones sound (widened, never wrong)
    sink.applyBatch(spark, (600 to 800).map(i =>
        (i, f"r${bucketOf(i)}%02d", i, "d", 1000L + i))
      .toDF("id", "region", "amt", "op", "lsn"), 1)
    val total = 16
    // equality on the correlated column: 1/16 of the layout planned
    assert(sink.scan(spark, col("region") === "r07").count() ==
      (1 to 599).count(bucketOf(_) == 7))
    assert(sink.lastScanPlannedBuckets == 1,
      s"zone skip ratio broke: planned ${sink.lastScanPlannedBuckets}/$total")
    // range: strictly fewer than all bucket dirs
    sink.scan(spark, col("region") >= "r12").count()
    assert(sink.lastScanPlannedBuckets < total && sink.lastScanPlannedBuckets > 0,
      s"range scan must skip buckets: planned ${sink.lastScanPlannedBuckets}/$total")
    // weakly-correlated column: any skip must still find the row (no
    // wrong skips — the row count IS the soundness check), and the
    // counter records what was actually planned
    assert(sink.scan(spark, col("amt") === 17).count() == 1)
    assert(sink.lastScanPlannedBuckets > 0 && sink.lastScanPlannedBuckets <= total)
  }

  test("bloom-consulted point lookup plans ~1 of 64 bucket dirs on an uncorrelated column") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("shape-blooms")
      .toFile.getAbsolutePath + "/t1"
    val sink = new graft.sinks.ParquetReplicaSink(path, Seq("id"), numBuckets = 64)
    // high-cardinality column with NO relation to the key layout: the
    // shape zone maps cannot serve (every bucket's range overlaps), the
    // shape the bloom index exists for
    sink.applyBatch(spark, (1 to 3000).map(i =>
        (i, f"ord-$i%06d", "c", i.toLong))
      .toDF("id", "order_ref", "op", "lsn"), 0)
    sink.buildBlooms(spark, Seq("order_ref"))
    assert(sink.scan(spark, col("order_ref") === "ord-001234").count() == 1)
    assert(sink.lastScanPlannedBuckets <= 2,
      s"bloom point plan broke: planned ${sink.lastScanPlannedBuckets}/64")
    // online maintenance keeps the contract across a later batch
    sink.applyBatch(spark, Seq((9001, "ord-late", "c", 9001L))
      .toDF("id", "order_ref", "op", "lsn"), 1)
    assert(sink.scan(spark, col("order_ref") === "ord-late").count() == 1)
    assert(sink.lastScanPlannedBuckets <= 2,
      s"post-batch bloom plan: ${sink.lastScanPlannedBuckets}/64")
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // the third leg of the 100 TB join toolkit (broadcast for small dims,
    // bucketing for co-location): when a scaling dim carries a selective
    // filter and must shuffle-join, Spark injects a bloom filter built
    // from the filtered dim keys into the FACT scan — rows that cannot
    // match die before the shuffle. Production defaults gate it by size
    // (creation side ≤ 10 GB); the toy-scale thresholds here only make
    // the optimization observable, the plan shape is what's pinned.
    val sf = "/root/testdata/sf0.001"
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val p = spark.read.parquet(s"$sf/part.parquet").filter(col("p_size") === 1)
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        "fact side lost its runtime bloom filter:\n" + plan.take(1500))
      assert(plan.contains("bloom_filter_agg"),
        "no bloom built from the filtered dim:\n" + plan.take(1500))
      // and it must not change the answer
      val expected = li.join(p.hint("broadcast"),
        col("l_partkey") === col("p_partkey")).count()
      assert(j.collect()(0).getLong(0) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join: same result as plain join, key spread across salts") {
    import spark.implicits._
    // one pathologically hot key
    val left = ((1 to 1000).map(i => (7L, i)) ++ Seq((8L, 1), (9L, 2)))
      .toDF("k", "payload")
    val right = Seq((7L, "hot"), (8L, "a"), (9L, "b")).toDF("k", "name")
    val plain = left.join(right, "k").count()
    val salted = Skew.saltedJoin(left, right, "k", factor = 8,
      discriminator = "payload")
    assert(salted.count() == plain)
    // the hot key's rows really spread over multiple salt partitions
    val spread = left.filter($"k" === 7)
      .withColumn("s", pmod(hash($"k", $"payload"), lit(8)))
      .select("s").distinct().count()
    assert(spread > 4, s"salting left the hot key on $spread partitions")
  }

  test("stateless llmops transforms run unchanged on streams") {
    import graft.llmops.TextOps
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text")
      .withColumn("h", TextOps.contentHash(col("text")))
      .withColumn("n_tokens", size(TextOps.tokens(col("text"))))
      .withColumn("pred", TextOps.languagePredict(
        TextOps.languageScores(col("text"), Seq(
          "en" -> Seq(" the "), "de" -> Seq(" der ")))))
      .writeStream.format("memory").queryName("llm_stream").start()
    try {
      mem.addData((1L, "a the b the c"), (2L, "x der y"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, n_tokens, pred FROM llm_stream ORDER BY doc_id")
        .collect()
      assert(rows(0).getInt(1) == 5 && rows(0).getString(2) == "en")
      assert(rows(1).getString(2) == "de")
    } finally q.stop()
  }
}
