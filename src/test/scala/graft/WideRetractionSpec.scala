package graft

import java.nio.file.Files
import graft.llmops.{AnnIndexStore, TextIndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{In, InSet}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Wide-retraction scale contract for BOTH serving indexes: the
  * tombstone PURGE paths (compact / liveStats) and — above the serve
  * bound — the serve filters must never materialize the dead set on the
  * driver. A whole-source GDPR retraction's dead set is corpus-sized
  * exactly when compact must clear it; these specs force the wide path
  * with `serveDeadBound = 0` and pin ZERO driver collects of the
  * tombstone set (the stores' own load counters) while ranking parity
  * with a fresh build over the survivors holds bit-for-bit. */
class WideRetractionSpec extends SparkSpecBase {

  test("TextIndexStore wide retraction: compact + serve are driver-free " +
      "(zero dead-set collects) with ranking parity over survivors") {
    import spark.implicits._
    val dir = Files.createTempDirectory("text-wide")
      .toFile.getAbsolutePath + "/idx"
    val all = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(200).cache()
    // serveDeadBound = 0: EVERY nonempty dead set takes the wide
    // (anti-join) path — what a 10%-of-20B retraction would at scale
    val store = new TextIndexStore(dir, numParts = 16, serveDeadBound = 0L)
    store.addBatch(spark, all.filter(col("doc_id") < 120), 0)
    store.addBatch(spark, all.filter(col("doc_id") >= 120), 1)
    // the wide retraction lands DISTRIBUTED (DataFrame delete): half
    // the corpus, never a driver id list
    store.delete(spark, all.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id")))
    val survivors = all.filter(col("doc_id") % 2 =!= 0)
    // probe with survivors' own lead terms so dead docs would rank if
    // any serve path missed the tombstones
    val queries = all.filter(col("doc_id").isin(3L, 17L))
      .select(col("doc_id").cast("string").as("qid"),
        explode(slice(split(col("text"), " "), 1, 4)).as("term"))
      .localCheckpoint(true)
    def hits(ix: TextIndexStore): Seq[(String, Int, Long, Long)] =
      ix.search(spark, queries, k = 10).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    val freshDir = Files.createTempDirectory("text-wide-fresh")
      .toFile.getAbsolutePath + "/idx"
    val fresh = new TextIndexStore(freshDir, numParts = 16)
    fresh.addBatch(spark, survivors, 0)
    val expected = hits(fresh)
    // pending window: the serve anti-join path is exact
    assert(hits(store) == expected,
      "wide-pending serve must equal a fresh build over survivors")
    assert(expected.nonEmpty && expected.forall(_._3 % 2 != 0),
      s"no dead doc may serve: $expected")
    // searchDistributed's corpus-sized path under the same wide set
    val distRows = store.searchDistributed(queries, k = 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(distRows == expected, "distributed serve must match in the window")
    // the PURGE: compact folds + physically removes the dead postings
    store.compact(spark)
    assert(!new java.io.File(dir, "_tombstones").exists(),
      "compact must clear the tombstone dir")
    assert(store.tombstoneCount(spark) == 0L)
    assert(hits(store) == expected, "post-compact parity must hold")
    assert(spark.read.parquet(dir).select("doc_id").distinct()
      .filter(col("doc_id") % 2 === 0).isEmpty,
      "dead postings must be physically gone")
    // THE contract: across delete, two serve forms, and the compact,
    // the tombstone set never collected to the driver
    assert(store.driverDeadLoads == 0,
      s"driver collected the dead set ${store.driverDeadLoads}× on the " +
        "wide path — a corpus-sized retraction would OOM the driver")
    all.unpersist()
  }

  test("TextIndexStore bounded retraction: the memoized serve set loads " +
      "once and invalidates on mutation") {
    import spark.implicits._
    val dir = Files.createTempDirectory("text-bounded")
      .toFile.getAbsolutePath + "/idx"
    val docs = (0L until 60L).map(i => (i, s"zz r${i}a r${i}b"))
      .toDF("doc_id", "text")
    val store = new TextIndexStore(dir, numParts = 8) // default bound
    store.addBatch(spark, docs, 0)
    store.delete(spark, Seq(7L, 9L))
    val q = Seq(("q", "zz")).toDF("qid", "term")
    store.search(spark, q, k = 5).collect()
    store.search(spark, q, k = 5).collect()
    store.phraseSearch(spark, Seq("zz", "r3a")).collect()
    assert(store.driverDeadLoads == 1,
      s"bounded serves must share ONE memoized load: ${store.driverDeadLoads}")
    store.delete(spark, Seq(11L))
    store.search(spark, q, k = 5).collect()
    assert(store.driverDeadLoads == 2,
      "a mutation must invalidate the memoized set")
  }

  test("AnnIndexStore wide retraction: serve via anti-join above the " +
      "bound, probe gate still rejects dead probes, compact purges") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def vec(): Array[Float] = Array.fill(32)(rnd.nextGaussian().toFloat)
    val base = (0L until 80L).map(i => (i, vec()))
    // twin planted on an EVEN id: the wide retraction below kills every
    // odd id, and the probe must stay live
    val twin = (80L, base(6)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    val df = (base :+ twin).toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("ann-wide")
      .toFile.getAbsolutePath + "/idx"
    // serveDeadBound = 0 forces the wide path for ANY pending dead set
    val store = new AnnIndexStore(root, serveDeadBound = 0L)
    store.writeLsh(df)
    // distributed wide retraction: every odd id
    store.delete(spark, df.filter(col("vec_id") % 2 === 1)
      .select("vec_id"))
    // single-probe serve on the wide path: dead candidates are
    // anti-joined out BEFORE the (bounded) candidate collect
    val served = store.lshTopK(spark, probeId = 6L, k = 1000)
      .collect().map(_.getLong(0))
    assert(served.nonEmpty && served.forall(_ % 2 == 0),
      s"dead candidates must not serve on the wide path: ${served.toSeq}")
    assert(served.headOption.contains(80L), "live twin must still rank first")
    // batch + distributed forms agree with the wide filter
    val batch = store.lshTopKBatch(spark, Seq(6L, 80L), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val dist = store.lshTopKBatchDistributed(
        Seq(6L, 80L).toDF("vec_id"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(batch == dist, s"batch $batch vs distributed $dist")
    assert(batch.forall(_._2 % 2 == 0))
    // the probe gate still rejects a dead probe — now via a
    // distributed ids-only join, not a driver set
    val err = intercept[IllegalArgumentException] {
      store.lshTopK(spark, probeId = 7L, k = 3)
    }
    assert(err.getMessage.contains("tombstoned"), err.getMessage)
    assert(store.liveIds(spark).collect().map(_.getLong(0))
      .forall(_ % 2 == 0))
    assert(store.hasDocs(spark, Seq(4L, 7L, 8L)) == Set(4L, 8L),
      "hasDocs must exclude dead ids (anti-join, isin-pruned read)")
    assert(store.tombstoneCount(spark) == 40L)
    // purge parity: compact clears the wide set without driver ids
    store.compact(spark)
    assert(!new java.io.File(s"$root/_tombstones").exists())
    val post = store.lshTopK(spark, probeId = 6L, k = 1000)
      .collect().map(_.getLong(0))
    assert(post.toSeq == served.toSeq, "post-compact serve must be identical")
  }

  test("AnnIndexStore bounded serve filter: a broadcast anti-join, never " +
      "a dead-set-sized In literal list") {
    import spark.implicits._
    def executed(df: DataFrame): SparkPlan =
      df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      // descend into AQE query stages and reused exchanges too — the
      // join under test materializes behind them
      val kids = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case _ => p.children
      }
      (p +: kids.flatMap(nodes)) ++ p.subqueries.flatMap(nodes)
    }
    val rnd = new scala.util.Random(13)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val df = (0L until 2400L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("ann-bounded-plan")
      .toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root) // default bound: memoized-set path
    store.writeLsh(df)
    // 2000 pending dead ids — bounded (under the 1M default), but far
    // past anything a per-plan literal In should ever carry: at the 1M
    // ceiling the old `isin` form built and serialized a million
    // Literal children on the driver for EVERY serve plan
    store.delete(spark, spark.range(400L, 2400L).select($"id".as("vec_id")))
    val rows = store.lshTopK(spark, probeId = 6L, k = 10).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) < 400L),
      "dead candidates must not serve")
    // the driver-bounded form's dead filter runs in its internal
    // candidate job; the distributed batch form keeps the WHOLE serve
    // lazy, so its returned plan carries the filter — assert there
    val served = store.lshTopKBatchDistributed(
      Seq(6L, 8L).toDF("vec_id"), k = 10)
    val batchRows = served.collect()
    assert(batchRows.nonEmpty &&
      batchRows.forall(_.getLong(1) < 400L), "dead served in batch form")
    val ps = nodes(executed(served))
    assert(ps.exists {
      case b: BroadcastHashJoinExec => b.joinType.toString == "LeftAnti"
      case _ => false
    }, "the bounded dead filter must ride as a broadcast LeftAnti join:\n" +
      executed(served).toString.take(4000))
    // probe bucket-ball/ids IN-lists are query-bounded and stay; the
    // DEAD set must never appear as one
    val bigIns = ps.flatMap(_.expressions).flatMap(_.collect {
      case i: In if i.list.size > 1000 => s"In(${i.list.size})"
      case s: InSet if s.hset.size > 1000 => s"InSet(${s.hset.size})"
    })
    assert(bigIns.isEmpty,
      s"dead-set-sized IN literals in the serve plan: $bigIns")
  }

  test("AnnIndexStore tombstone fold: AQE-sized (no single-task funnel) " +
      "and re-triggered by appends since the fold, not absolute size") {
    import spark.implicits._
    val df = (0L until 40L)
      .map(i => (i, Array.fill(16)(new scala.util.Random(i.toInt)
        .nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("ann-fold")
      .toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeLsh(df)
    // drive past the fold threshold with single-id deletes
    (0 until 10).foreach(i => store.delete(spark, Seq(i.toLong)))
    def dataFiles(): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      walk(new java.io.File(s"$root/_tombstones"))
        .map(_.getName).filter(n => n.endsWith(".parquet"))
    }
    assert(dataFiles().size <= AnnIndexStore.MaxTombstoneFiles,
      s"fold must bound the dir: ${dataFiles()}")
    // the fold recorded its own output size: the next single delete
    // must NOT re-fold (file count grows by exactly the append)
    val marker = new java.io.File(s"$root/_tombstones/_nfolded")
    assert(marker.exists(), "fold must record its output file count")
    val folded = new String(java.nio.file.Files.readAllBytes(
      marker.toPath)).trim.toInt
    val before = dataFiles().size
    store.delete(spark, Seq(30L))
    assert(dataFiles().size == before + 1,
      "a post-fold delete must append, not rewrite the folded set")
    assert(folded >= 1 && before >= folded)
    // correctness through it all: all deleted ids are dead
    assert(store.liveIds(spark).collect().map(_.getLong(0)).toSet ==
      ((10L until 40L).toSet - 30L))
  }
}
