package graft

import java.io.File
import java.nio.file.Files
import graft.llmops.{AnnIndexStore, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** The persisted ANN serving indexes: results must equal the in-memory
  * `*Indexed` forms, and every per-probe read must PLAN only the probed
  * partitions — asserted on real FileSourceScanExec metrics, so the
  * layouts are proven prunable by Catalyst, not by hand-listing. */
class AnnIndexStoreSpec extends SparkSpecBase {

  private def parquetFiles(dir: String): Int = {
    def walk(f: File): Int =
      if (f.isFile) { if (f.getName.endsWith(".parquet")) 1 else 0 }
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(new File(dir))
  }

  /** (pathFragment → numFiles) for every parquet scan in the final plan. */
  private def scanFiles(df: DataFrame): Seq[(String, Long)] = {
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def all(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      // AQE hides materialized subplans behind stage/reuse wrappers with
      // empty `children` — descend into the wrapped plan explicitly
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        p +: all(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        p +: all(r.child)
      case _ =>
        (p +: p.children.flatMap(all)) ++ p.subqueries.flatMap(all)
    }
    all(plan).collect { case s: FileSourceScanExec =>
      s.relation.location.rootPaths.mkString(",") -> s.metrics("numFiles").value
    }
  }

  private def planted(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def perturb(v: Array[Float]): Array[Float] =
      v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val base = (0L until n.toLong).map(i => (i, vec()))
    val twins = Seq((n.toLong, perturb(base(5)._2)), (n + 1L, perturb(base(17)._2)))
    (base ++ twins).toDF("vec_id", "embedding")
  }

  test("persisted LSH index: serves the in-memory result, plans only probed buckets") {
    val df = planted(7, 100)
    val root = Files.createTempDirectory("ann-lsh").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeLsh(df)

    // parity with the in-memory form, planted twin found
    val served = store.lshTopK(spark, probeId = 5L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inMem = Similarity.signLshTopK(df, probeId = 5L, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == inMem, s"served=$served inMem=$inMem")
    assert(served.head._1 == 100L, "planted twin must rank first")

    // pruning: the bucket-index scan plans a fraction of the layout, the
    // probe-vector fetch plans exactly one part dir
    // the candidate read (executed eagerly inside lshTopK) must
    // partition-prune the bucket layout to the probe's literal
    // (band, part, bucket) predicates
    val bucketTotal = parquetFiles(s"$root/lsh_buckets")
    val bucketScan = scanFiles(store.lshCandidates(spark, probeId = 5L, radius = 1))
      .filter(_._1.contains("lsh_buckets")).map(_._2).sum
    assert(bucketScan > 0 && bucketScan < bucketTotal / 2,
      s"bucket index must partition-prune: planned $bucketScan of $bucketTotal files")
    val scans = scanFiles(store.lshTopK(spark, probeId = 5L, k = 3))
    // EVERY vectors read must be pruned: the probe fetch plans one part
    // dir and the candidate gather plans only the candidates' part dirs
    // — the SUM across all vectors scans stays a fraction of the store
    // (a full-store rescore gather would alone plan every file)
    val vecTotal = parquetFiles(s"$root/vectors")
    val vecScans = scans.filter(_._1.contains("vectors")).map(_._2)
    assert(vecScans.nonEmpty && vecScans.min == 1,
      s"probe fetch must read ONE vectors part dir, scans=$vecScans")
    assert(vecScans.sum < vecTotal / 2,
      s"all vectors reads together must stay pruned: planned ${vecScans.sum} of $vecTotal files, scans=$vecScans")
  }

  test("persisted IVF index: serves the in-memory result, plans only probed clusters") {
    val df = planted(41, 120)
    val root = Files.createTempDirectory("ann-ivf").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeIvf(df, nClusters = 16)

    val served = store.ivfTopK(spark, probeId = 5L, k = 3, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inMem = Similarity.ivfTopK(df, probeId = 5L, k = 3, nClusters = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(served == inMem, s"served=$served inMem=$inMem")

    val scans = scanFiles(store.ivfTopK(spark, probeId = 5L, k = 3, nprobe = 4))
    val ivfTotal = parquetFiles(s"$root/ivf")
    val memberScan = scans.filter(_._1.contains("/ivf")).map(_._2).sum
    assert(memberScan > 0 && memberScan <= ivfTotal / 2,
      s"member scan must prune to nprobe clusters: planned $memberScan of $ivfTotal")
    val vecScans = scans.filter(_._1.contains("vectors")).map(_._2)
    assert(vecScans.nonEmpty && vecScans.min == 1,
      s"probe fetch must read ONE vectors part dir, scans=$vecScans")
  }

  test("persisted IVF-PQ index: codes-only first pass, pruned reads, exact rerank, recall >= int8") {
    val df = planted(53, 200)
    val root = Files.createTempDirectory("ann-pq").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeIvfPq(df, nClusters = 8, mSub = 8, ksub = 16)

    // posting lists carry codes, NOT vectors — the compression point
    val posting = spark.read.parquet(s"$root/ivf")
    assert(posting.columns.toSet == Set("vec_id", "codes", "cluster"),
      s"posting lists must be (vec_id, codes): ${posting.columns.mkString(",")}")
    assert(posting.select("codes").head().getSeq[Long](0).size == 8)

    // the planted twin survives the ADC shortlist and ranks first with a
    // TRUE cosine (the rerank is exact)
    val served = store.pqTopK(spark, probeId = 5L, k = 3, nprobe = 4,
      shortlist = 30).collect()
    assert(served.head.getLong(0) == 200L,
      s"planted twin must rank first: ${served.map(_.getLong(0)).mkString(",")}")
    val exact = Similarity.bruteForceTopK(df, probeId = 5L, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(served.head.getDouble(2) == exact.head._2,
      "reranked score must be the exact cosine, not an ADC approximation")

    // pruning: the ADC pass plans only nprobe cluster dirs; the rerank
    // gather plans O(shortlist parts) of the vectors store, never all 64
    val adcScans = scanFiles(store.pqShortlist(spark, probeId = 5L,
      nprobe = 4, shortlist = 30, where = None))
    val ivfTotal = parquetFiles(s"$root/ivf")
    val memberScan = adcScans.filter(_._1.contains("/ivf")).map(_._2).sum
    assert(memberScan > 0 && memberScan <= ivfTotal / 2,
      s"ADC scan must prune to nprobe clusters: planned $memberScan of $ivfTotal")
    val scans = scanFiles(store.pqTopK(spark, probeId = 5L, k = 3,
      nprobe = 4, shortlist = 30))
    val vecTotal = parquetFiles(s"$root/vectors")
    val gatherScan = scans.filter(_._1.contains("vectors")).map(_._2).max
    assert(gatherScan < vecTotal,
      s"rerank gather must prune by shortlist parts: $gatherScan of $vecTotal")

    // recall-vs-int8 on the full serving paths: top-10 against the exact
    // float ranking. int8 scans everything (recall ~1); PQ reads codes
    // only and reranks a 30-shortlist — it must stay within 2 hits
    val truth = Similarity.bruteForceTopK(df, probeId = 7L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val int8 = Similarity.bruteForceTopK8(df, probeId = 7L, k = 10)
      .collect().map(_.getLong(0)).toSet
    val pq = store.pqTopK(spark, probeId = 7L, k = 10, nprobe = 8,
      shortlist = 60).collect().map(_.getLong(0)).toSet
    val (r8, rpq) = ((int8 & truth).size, (pq & truth).size)
    assert(r8 >= 8, s"int8 recall@10 degraded: $r8")
    assert(rpq >= r8 - 2 && rpq >= 6,
      s"PQ-rerank recall@10 must track int8: pq=$rpq int8=$r8")

    // append with frozen codebooks: a twin added later is served
    import spark.implicits._
    val rnd = new scala.util.Random(97)
    val twin = df.filter(col("vec_id") === 11L)
      .select("embedding").head().getSeq[Float](0).toArray
    store.append(Seq((900L, twin.map(x => x + 0.02f * rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding"))
    assert(store.pqTopK(spark, probeId = 11L, k = 1, nprobe = 4, shortlist = 30)
      .select("vec_id").head().getLong(0) == 900L)

  }

  test("distributed PQ batch retrieval: per-probe parity with pqTopK, no driver relations") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val df = planted(61, 150)   // twins: 150 ~ base(5), 151 ~ base(17)
    val root = Files.createTempDirectory("ann-d-pq").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeIvfPq(df, nClusters = 8, mSub = 8, ksub = 16)
    // probe set as a DATASET (Range leaf — nothing driver-materialized)
    val probes = spark.range(0, 152).select(col("id").as("vec_id"))
    val dist = store.pqTopKBatchDistributed(probes, k = 3, nprobe = 4,
      shortlist = 30)
    def leaves(d: DataFrame) = d.queryExecution.optimizedPlan.collectLeaves()
    assert(!leaves(dist).exists(_.isInstanceOf[LocalRelation]),
      s"distributed PQ plan must not carry driver-materialized relations:\n" +
        leaves(dist).map(_.nodeName).mkString(", "))
    val got = dist.collect()
      .map(r => (r.getLong(0),
        (r.getLong(4), r.getLong(1), r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3, t._4)).toSeq)
      .toMap
    assert(got.size == 152, s"every live probe must answer: ${got.size}")
    // row parity (ids, exact integer dots AND reranked cosines) with the
    // driver-bounded per-probe form on a probe sample including both twins
    for (pid <- Seq(0L, 5L, 17L, 42L, 99L, 150L, 151L)) {
      val want = store.pqTopK(spark, pid, k = 3, nprobe = 4, shortlist = 30)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got(pid) == want, s"PQ distributed/driver parity broke at pid=$pid:" +
        s"\n dist=${got(pid)}\n want=$want")
    }
    assert(got(5L).head._1 == 150L, "planted twin of 5 must rank first")
    // the kind dispatcher serves ivfpq now (the ann-sweep verb's path)
    assert(store.sweepDistributed(probes, k = 3, shortlist = 30)
      .filter(col("pid") === 17L).collect().head.getLong(1) == 151L)
    // tombstones: dropped as probe and as candidate
    store.delete(spark, Seq(150L))
    val afterDel = store.pqTopKBatchDistributed(probes, k = 5, nprobe = 4,
      shortlist = 30).collect()
    assert(!afterDel.exists(_.getLong(1) == 150L), "tombstoned candidate surfaced")
    assert(!afterDel.exists(_.getLong(0) == 150L), "tombstoned probe produced rows")
  }

  test("incremental append: new vectors serve from both index kinds without rebuild") {
    import spark.implicits._
    val df = planted(19, 80)
    val rnd = new scala.util.Random(77)
    // a later batch containing a close twin of base vector 9
    val probeVec = df.filter(col("vec_id") === 9L)
      .select("embedding").head().getSeq[Float](0).toArray
    val batch2 = Seq(
      (500L, probeVec.map(x => x + 0.02f * rnd.nextGaussian().toFloat)),
      (501L, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")

    val lshRoot = Files.createTempDirectory("ann-app-lsh").toFile.getAbsolutePath + "/idx"
    val lsh = new AnnIndexStore(lshRoot)
    lsh.writeLsh(df)
    lsh.append(batch2)
    val lshTop = lsh.lshTopK(spark, probeId = 9L, k = 1)
      .select("vec_id").head().getLong(0)
    assert(lshTop == 500L, s"appended twin must be served (got $lshTop)")
    // and the appended vector itself is probe-able (vectors store grew)
    assert(lsh.lshTopK(spark, probeId = 500L, k = 1)
      .select("vec_id").head().getLong(0) == 9L)

    val ivfRoot = Files.createTempDirectory("ann-app-ivf").toFile.getAbsolutePath + "/idx"
    val ivf = new AnnIndexStore(ivfRoot)
    ivf.writeIvf(df, nClusters = 8)
    ivf.append(batch2)
    // the twin lands in 9's cluster (same nearest centroid) → top-1
    val ivfTop = ivf.ivfTopK(spark, probeId = 9L, k = 1, nprobe = 2)
      .select("vec_id").head().getLong(0)
    assert(ivfTop == 500L, s"appended twin must be served from IVF (got $ivfTop)")
  }

  test("compact folds appended files; serving unchanged; heals a crashed swap") {
    import spark.implicits._
    val df = planted(29, 60)
    val root = Files.createTempDirectory("ann-cmp").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeLsh(df)
    val rnd = new scala.util.Random(5)
    (0 until 4).foreach { b =>
      store.append(Seq((1000L + b, Array.fill(64)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding"))
    }
    val before = store.lshTopK(spark, probeId = 5L, k = 3)
      .collect().map(_.getLong(0)).toSeq
    val filesBefore = parquetFiles(s"$root/lsh_buckets")
    store.compact(spark)
    assert(parquetFiles(s"$root/lsh_buckets") < filesBefore,
      s"compact must shrink the file count (was $filesBefore)")
    assert(store.lshTopK(spark, probeId = 5L, k = 3)
      .collect().map(_.getLong(0)).toSeq == before)

    // crash window: committed staging + gutted vectors dir → compact
    // heals by rolling the staging forward
    val vec = new File(s"$root/vectors")
    val staged = new File(s"$root/_compact_vectors")
    def copyDir(src: File, dst: File): Unit = {
      dst.mkdirs()
      src.listFiles().foreach { f =>
        if (f.isDirectory) copyDir(f, new File(dst, f.getName))
        else java.nio.file.Files.copy(f.toPath, new File(dst, f.getName).toPath)
      }
    }
    copyDir(vec, staged)
    assert(new File(staged, "_SUCCESS").exists())
    def gut(f: File): Unit =
      Option(f.listFiles()).getOrElse(Array.empty).foreach { c =>
        if (c.isDirectory) gut(c)
        else if (c.getName.endsWith(".parquet")) assert(c.delete())
      }
    gut(vec)
    store.compact(spark)
    assert(!staged.exists())
    assert(store.lshTopK(spark, probeId = 5L, k = 3)
      .collect().map(_.getLong(0)).toSeq == before,
      "committed staging must roll forward — the rows survive the crash")
  }

  test("batch probe serving: one plan, per-probe parity, union-pruned reads") {
    val df = planted(57, 110)
    val probes = Seq(5L, 17L, 30L, 64L)

    // LSH: batch result must be row-for-row the per-probe result
    val lshRoot = Files.createTempDirectory("ann-b-lsh").toFile.getAbsolutePath + "/idx"
    val lsh = new AnnIndexStore(lshRoot)
    lsh.writeLsh(df)
    val lshBatch = lsh.lshTopKBatch(spark, probes, k = 3)
    val byPid = lshBatch.collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3)).toSeq).toMap
    probes.foreach { pid =>
      val single = lsh.lshTopK(spark, pid, k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(byPid.getOrElse(pid, Seq.empty) == single,
        s"batch must equal per-probe serving for pid=$pid")
    }
    assert(byPid(5L).head._1 == 110L, "planted twin of 5 must rank first in batch")
    // the one serving plan's vector reads stay pruned to the union of
    // probe + candidate parts — never the whole store
    val vecTotal = parquetFiles(s"$lshRoot/vectors")
    val vecScans = scanFiles(lsh.lshTopKBatch(spark, probes, k = 3))
      .filter(_._1.contains("vectors")).map(_._2)
    assert(vecScans.nonEmpty && vecScans.sum < vecTotal,
      s"batch gather must stay pruned: planned ${vecScans.sum} of $vecTotal files")

    // IVF: same contract; the member scan prunes to the UNION of all
    // probes' nprobe clusters inside the single plan
    val ivfRoot = Files.createTempDirectory("ann-b-ivf").toFile.getAbsolutePath + "/idx"
    val ivf = new AnnIndexStore(ivfRoot)
    ivf.writeIvf(df, nClusters = 16)
    val ivfBatch = ivf.ivfTopKBatch(spark, probes, k = 3, nprobe = 4)
    val ivfByPid = ivfBatch.collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3)).toSeq).toMap
    probes.foreach { pid =>
      val single = ivf.ivfTopK(spark, pid, k = 3, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(ivfByPid.getOrElse(pid, Seq.empty) == single,
        s"IVF batch must equal per-probe serving for pid=$pid")
    }
    val ivfTotal = parquetFiles(s"$ivfRoot/ivf")
    val memberScan = scanFiles(ivf.ivfTopKBatch(spark, probes, k = 3, nprobe = 4))
      .filter(_._1.contains("/ivf")).map(_._2).sum
    assert(memberScan > 0 && memberScan < ivfTotal,
      s"batch member scan must prune to the probed-cluster union: $memberScan of $ivfTotal")
  }

  test("distributed batch retrieval: parity with driver-bounded serving, no driver candidates") {
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val df = planted(83, 120)   // twins: 120 ~ base(5), 121 ~ base(17)
    // probe set as a DATASET (Range leaf — nothing driver-materialized)
    val probes = spark.range(0, 40).select(col("id").as("vec_id"))

    def leaves(d: DataFrame) = d.queryExecution.optimizedPlan.collectLeaves()

    // LSH: row-parity with the driver-bounded batch on the same live ids
    val lshRoot = Files.createTempDirectory("ann-d-lsh").toFile.getAbsolutePath + "/idx"
    val lsh = new AnnIndexStore(lshRoot)
    lsh.writeLsh(df)
    val dist = lsh.lshTopKBatchDistributed(probes, k = 3)
    // plan-level no-collect contract: every leaf is a file scan or the
    // probe Dataset — no LocalRelation (the driver-bounded form's
    // collected ball/pair tables would appear as exactly that)
    assert(!leaves(dist).exists(_.isInstanceOf[LocalRelation]),
      s"distributed plan must not carry driver-materialized relations:\n" +
        leaves(dist).map(_.nodeName).mkString(", "))
    assert(leaves(lsh.lshTopKBatch(spark, Seq(5L), k = 3))
      .exists(_.isInstanceOf[LocalRelation]),
      "sanity: the driver-bounded form DOES materialize local relations")
    val distRows = dist.collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3)).toSeq).toMap
    val driver = lsh.lshTopKBatch(spark, (0L until 40L).toSeq, k = 3).collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3)).toSeq).toMap
    assert(distRows == driver,
      s"distributed/driver-bounded parity broke (dist=${distRows.size} pids, " +
        s"driver=${driver.size} pids)")
    assert(distRows(5L).head._1 == 120L, "planted twin of 5 must rank first")

    // IVF: same parity + plan contract
    val ivfRoot = Files.createTempDirectory("ann-d-ivf").toFile.getAbsolutePath + "/idx"
    val ivf = new AnnIndexStore(ivfRoot)
    ivf.writeIvf(df, nClusters = 16)
    val ivfDist = ivf.ivfTopKBatchDistributed(probes, k = 3, nprobe = 4)
    assert(!leaves(ivfDist).exists(_.isInstanceOf[LocalRelation]),
      "IVF distributed plan must not carry driver-materialized relations")
    val ivfDistRows = ivfDist.collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3)).toSeq).toMap
    val ivfDriver = ivf.ivfTopKBatch(spark, (0L until 40L).toSeq, k = 3, nprobe = 4)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(4), r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(_._1).map(t => (t._2, t._3)).toSeq).toMap
    assert(ivfDistRows == ivfDriver, "IVF distributed/driver-bounded parity broke")

    // tombstoned ids: dropped from probes AND candidates (the documented
    // distributed contract — no eager require on a lazy probe Dataset)
    lsh.delete(spark, Seq(120L))
    val afterDel = lsh.lshTopKBatchDistributed(
      spark.range(0, 130).select(col("id").as("vec_id")), k = 5).collect()
    assert(!afterDel.exists(_.getLong(1) == 120L), "tombstoned candidate surfaced")
    assert(!afterDel.exists(_.getLong(0) == 120L), "tombstoned probe produced rows")
  }

  test("tombstones: one load per serve batch (memoized), files fold past the bound") {
    val df = planted(67, 60)
    val root = Files.createTempDirectory("ann-tomb").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeLsh(df)

    // ten one-id deletes → without folding, ten files; the fold keeps
    // the dir at or under the bound (+1 in-flight append)
    (0 until 10).foreach(i => store.delete(spark, Seq(40L + i)))
    val tombFiles = parquetFiles(s"$root/_tombstones")
    assert(tombFiles <= AnnIndexStore.MaxTombstoneFiles,
      s"tombstone dir must fold: $tombFiles files after 10 deletes")
    // the folded set still blankets serving
    val served = store.lshTopK(spark, 5L, k = 1000).collect().map(_.getLong(0))
    assert((40L until 50L).forall(id => !served.contains(id)),
      "folded tombstones must keep filtering serving")

    // memoization: a fresh instance loads the set ONCE across many
    // serves; a delete invalidates and forces exactly one reload
    val fresh = new AnnIndexStore(root)
    fresh.lshTopK(spark, 5L, k = 3).collect()
    fresh.lshTopK(spark, 17L, k = 3).collect()
    fresh.lshTopKBatch(spark, Seq(5L, 17L), k = 3).collect()
    assert(fresh.tombLoads == 1,
      s"serve batch must read tombstones once, read ${fresh.tombLoads}×")
    fresh.delete(spark, Seq(51L))
    fresh.lshTopK(spark, 5L, k = 3).collect()
    fresh.lshTopK(spark, 17L, k = 3).collect()
    assert(fresh.tombLoads == 2,
      s"post-delete serving must reload exactly once, read ${fresh.tombLoads}×")
    // and compact clears + invalidates: the next serve reloads empty
    fresh.compact(spark)
    val postCompact = fresh.lshTopK(spark, 5L, k = 1000).collect().map(_.getLong(0))
    assert((40L to 51L).forall(id => !postCompact.contains(id)),
      "purged ids must stay gone after compact")
  }

  test("retraction: deleted ids never surface; compact purges them physically") {
    import spark.implicits._
    val df = planted(23, 90)   // twins: 90 ~ base(5), 91 ~ base(17)
    val lshRoot = Files.createTempDirectory("ann-del-lsh").toFile.getAbsolutePath + "/idx"
    val lsh = new AnnIndexStore(lshRoot)
    lsh.writeLsh(df)
    assert(lsh.lshTopK(spark, 5L, k = 1).head().getLong(0) == 90L)

    // tombstone the twin: serving must skip it IMMEDIATELY (pre-compact)
    lsh.delete(spark, Seq(90L))
    val afterDel = lsh.lshTopK(spark, 5L, k = 5).collect().map(_.getLong(0))
    assert(!afterDel.contains(90L), s"tombstoned id surfaced: ${afterDel.toSeq}")
    assert(!lsh.lshTopKBatch(spark, Seq(5L, 17L), k = 5)
      .collect().map(_.getLong(1)).contains(90L))
    intercept[IllegalArgumentException] { lsh.lshTopK(spark, 90L, k = 1) }

    // compact folds the tombstone out of BOTH layouts and clears it
    lsh.compact(spark)
    assert(!new File(s"$lshRoot/_tombstones").exists())
    assert(spark.read.parquet(s"$lshRoot/vectors")
      .filter(col("vec_id") === 90L).isEmpty, "vectors row must be purged")
    assert(spark.read.parquet(s"$lshRoot/lsh_buckets")
      .filter(col("vec_id") === 90L).isEmpty, "bucket rows must be purged")
    assert(!lsh.lshTopK(spark, 5L, k = 5)
      .collect().map(_.getLong(0)).contains(90L))

    // IVF: same contract, including the append→delete→serve sequence
    val ivfRoot = Files.createTempDirectory("ann-del-ivf").toFile.getAbsolutePath + "/idx"
    val ivf = new AnnIndexStore(ivfRoot)
    ivf.writeIvf(df, nClusters = 8)
    val rnd = new scala.util.Random(11)
    val probeVec = df.filter(col("vec_id") === 17L)
      .select("embedding").head().getSeq[Float](0).toArray
    ivf.append(Seq((200L, probeVec.map(x => x + 0.02f * rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding"))
    assert(ivf.ivfTopK(spark, 17L, k = 1, nprobe = 2).head().getLong(0) == 200L)
    ivf.delete(spark, Seq(200L))
    assert(!ivf.ivfTopK(spark, 17L, k = 5, nprobe = 2)
      .collect().map(_.getLong(0)).contains(200L))
    assert(!ivf.ivfTopKBatch(spark, Seq(17L), k = 5, nprobe = 2)
      .collect().map(_.getLong(1)).contains(200L))
    ivf.compact(spark)
    assert(spark.read.parquet(s"$ivfRoot/ivf")
      .filter(col("vec_id") === 200L).isEmpty, "posting row must be purged")
    assert(!ivf.ivfTopK(spark, 17L, k = 5, nprobe = 2)
      .collect().map(_.getLong(0)).contains(200L))
  }

  test("IVF drift telemetry: appends record mean/p95 distance vs build baseline") {
    import spark.implicits._
    val df = planted(31, 70)
    val root = Files.createTempDirectory("ann-drift").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeIvf(df, nClusters = 8)
    assert(store.driftReport(spark).isEmpty, "no drift before any append")
    val rnd = new scala.util.Random(9)
    store.append(Seq((300L, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding"))
    val rep1 = store.driftReport(spark)
    assert(rep1.exists(r => r.startsWith("drift: appends=1") &&
      r.contains("build mean=")), rep1.toString)
    store.append(Seq((301L, Array.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding"))
    assert(store.driftReport(spark).exists(_.startsWith("drift: appends=2")))
  }

  test("ivfpq drift rebuild: fresh centroids AND retrained codebooks, serving intact") {
    import spark.implicits._
    val df = planted(43, 90)   // twins: 90 ~ base(5), 91 ~ base(17)
    val root = Files.createTempDirectory("ann-pq-rb").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeIvfPq(df, nClusters = 8, mSub = 8, ksub = 16)
    val booksBefore = spark.read.parquet(s"$root/pq_codebooks").collect()
      .map(_.toString).toSet
    // a shifted-distribution append: drift telemetry records it
    val rnd = new scala.util.Random(11)
    store.append((400L until 430L).map(i =>
        (i, Array.fill(64)((rnd.nextGaussian() + 3.0).toFloat)))
      .toDF("vec_id", "embedding"))
    assert(store.driftReport(spark).isDefined)
    store.rebuildIvf(spark)
    // kind + PQ geometry survive; drift baseline reset; codebooks
    // RETRAINED over the drifted corpus (not carried stale)
    assert(store.driftReport(spark).isEmpty, "rebuild must reset the baseline")
    val booksAfter = spark.read.parquet(s"$root/pq_codebooks").collect()
      .map(_.toString).toSet
    assert(booksAfter != booksBefore,
      "rebuild must retrain the codebooks over the drifted corpus")
    // both serving forms still work and find the planted twin
    assert(store.pqTopK(spark, probeId = 5L, k = 1, nprobe = 8, shortlist = 30)
      .head().getLong(0) == 90L)
    assert(store.pqTopKBatchDistributed(
        spark.range(0, 92).select(col("id").as("vec_id")),
        k = 1, nprobe = 8, shortlist = 30)
      .filter(col("pid") === 17L).head().getLong(1) == 91L)
  }

  test("crashed rebuild: old _meta is dropped first, serving fails fast") {
    val df = planted(13, 40)
    val root = Files.createTempDirectory("ann-meta").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeLsh(df)
    assert(store.lshTopK(spark, probeId = 5L, k = 1).count() == 1)
    // a rebuild whose corpus evaluation blows up mid-build: the old
    // (lsh) _meta must already be gone, so the half-built root serves
    // "missing meta", never a stale-meta hybrid of old and new layouts
    val poison = df.withColumn("embedding",
      when(col("vec_id") < 0, col("embedding"))
        .otherwise(raise_error(lit("boom")).cast("void").cast("array<float>")))
    intercept[Exception] { store.writeIvf(poison, nClusters = 4) }
    assert(!new File(s"$root/_meta").exists(),
      "rebuild must clear the old _meta before touching layouts")
    intercept[Exception] { store.lshTopK(spark, probeId = 5L, k = 1) }
  }

  test("filtered serving: metadata predicate restricts both index kinds") {
    // label = vec_id % 3 rides the layouts as a declared metaCol; a
    // filtered serve must equal client-side filtering of the unfiltered
    // ranking (same candidates, same scores — the filter only restricts),
    // and survive append batches that carry the same metadata
    val df = planted(19, 60)
      .withColumn("label", (col("vec_id") % 3).cast("int"))

    def expectFiltered(all: Seq[(Long, Double)], k: Int): Seq[Long] =
      all.filter(_._1 % 3 == 1L).take(k).map(_._1)

    // LSH
    val lshRoot = Files.createTempDirectory("ann-flt-lsh").toFile.getAbsolutePath + "/idx"
    val lsh = new AnnIndexStore(lshRoot)
    lsh.writeLsh(df, metaCols = Seq("label"))
    val lshAll = lsh.lshTopK(spark, probeId = 5L, k = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val lshGot = lsh.lshTopK(spark, probeId = 5L, k = 3,
        where = Some(col("label") === 1))
      .collect().map(_.getLong(0)).toSeq
    assert(lshGot.nonEmpty && lshGot == expectFiltered(lshAll, 3),
      s"lsh filtered=$lshGot all=$lshAll")

    // IVF (posting lists carry the metadata — no gather at all)
    val ivfRoot = Files.createTempDirectory("ann-flt-ivf").toFile.getAbsolutePath + "/idx"
    val ivf = new AnnIndexStore(ivfRoot)
    ivf.writeIvf(df, nClusters = 4, metaCols = Seq("label"))
    val ivfAll = ivf.ivfTopK(spark, probeId = 5L, k = 1000)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val ivfGot = ivf.ivfTopK(spark, probeId = 5L, k = 3,
        where = Some(col("label") === 1))
      .collect().map(_.getLong(0)).toSeq
    assert(ivfGot.nonEmpty && ivfGot == expectFiltered(ivfAll, 3),
      s"ivf filtered=$ivfGot all=$ivfAll")

    // append carries the metadata; a batch missing it is refused
    import spark.implicits._
    val batch = Seq((200L, Array.fill(64)(0.01f)))
      .toDF("vec_id", "embedding").withColumn("label", lit(1))
    lsh.append(batch)
    val afterAppend = lsh.lshTopK(spark, probeId = 5L, k = 1000,
        where = Some(col("label") === 1)).collect().map(_.getLong(0)).toSeq
    assert(afterAppend.forall(id => id % 3 == 1L || id == 200L))
    intercept[IllegalArgumentException] {
      lsh.append(Seq((201L, Array.fill(64)(0.01f))).toDF("vec_id", "embedding"))
    }

    // batch probe serving honors the same filter
    val batchGot = lsh.lshTopKBatch(spark, Seq(5L, 17L), k = 3,
        where = Some(col("label") === 1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batchGot.nonEmpty &&
      batchGot.filter(_._1 == 5L).map(_._2) ==
        lsh.lshTopK(spark, 5L, k = 3, where = Some(col("label") === 1))
          .collect().map(_.getLong(0)).toSeq)

    // ...and so does the distributed form (filter inside the candidate
    // gather, before scoring — same rows as the driver-bounded batch)
    val probesDf = spark.range(0, 20).select(col("id").as("vec_id"))
    val distGot = lsh.lshTopKBatchDistributed(probesDf, k = 3,
        where = Some(col("label") === 1)).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).toSeq
    val drvGot = lsh.lshTopKBatch(spark, (0L until 20L).toSeq, k = 3,
        where = Some(col("label") === 1)).collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(distGot == drvGot,
      s"distributed filtered serving diverged: $distGot vs $drvGot")
    assert(distGot.forall(t => t._3 % 3 == 1L || t._3 == 200L))
  }

  test("distributed hard-negative sweep: pair predicate equals exact mining") {
    // label rides both layouts; pairWhere "label <> p_label" must turn
    // the sweep into hard-negative mining — per probe, the nearest
    // DIFFERENT-label vectors, ranked over the filtered candidates
    val df = planted(23, 50)
      .withColumn("label", (col("vec_id") % 3).cast("int"))
    val probesDf = spark.range(0, 6).select(col("id").as("vec_id"))

    // IVF with nprobe = nClusters covers the whole corpus, so the
    // sweep must equal the in-memory exact miner row for row
    val ivfRoot = Files.createTempDirectory("ann-hn-ivf").toFile.getAbsolutePath + "/idx"
    val ivf = new AnnIndexStore(ivfRoot)
    ivf.writeIvf(df, nClusters = 4, metaCols = Seq("label"))
    val got = ivf.ivfTopKBatchDistributed(probesDf, k = 5, nprobe = 4,
        pairWhere = Some(col("label") =!= col("p_label")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .sortBy(t => (t._1, t._3)).toSeq
    val want = graft.llmops.Similarity.hardNegatives(df, col("vec_id") < 6, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
      .sortBy(t => (t._1, t._3)).toSeq
    assert(got.nonEmpty && got == want,
      s"ivf hard negatives diverged: $got vs $want")

    // LSH: ranking over the pair-filtered candidate set must equal
    // client-side filtering + re-ranking of the UNRESTRICTED sweep
    val lshRoot = Files.createTempDirectory("ann-hn-lsh").toFile.getAbsolutePath + "/idx"
    val lsh = new AnnIndexStore(lshRoot)
    lsh.writeLsh(df, metaCols = Seq("label"))
    val lshGot = lsh.lshTopKBatchDistributed(probesDf, k = 3,
        pairWhere = Some(col("label") =!= col("p_label")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
      .sortBy(t => (t._1, t._3)).toSeq
    val lshAll = lsh.lshTopKBatchDistributed(probesDf, k = 10000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    val lshWant = lshAll.groupBy(_._1).toSeq.flatMap { case (pid, rows) =>
      rows.filter { case (_, cid, _, _) => cid % 3 != pid % 3 }
        .sortBy { case (_, cid, cos, _) => (-cos, cid) }
        .take(3).zipWithIndex
        .map { case ((_, cid, _, _), i) => (pid, cid, i + 1L) }
    }.sortBy(t => (t._1, t._3))
    assert(lshGot.nonEmpty && lshGot == lshWant,
      s"lsh hard negatives diverged: $lshGot vs $lshWant")
    assert(lshGot.forall { case (pid, cid, _) => cid % 3 != pid % 3 })
  }

  test("index kind guard: serving the wrong kind fails fast") {
    val df = planted(3, 30)
    val root = Files.createTempDirectory("ann-kind").toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeLsh(df)
    intercept[IllegalArgumentException] {
      store.ivfTopK(spark, probeId = 1L, k = 1)
    }
  }

  test("addBatch streaming intake: exactly-once under replay and a " +
      "crashed append; streamed store equals the one-shot build") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val df = planted(11, 90).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val root = Files.createTempDirectory("ann-intake")
      .toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    // build over the first slice, stream the rest through foreachBatch
    store.writeLsh(df.take(30).toDF("vec_id", "embedding"))
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        store.addBatch(b, id)
      }
      .option("checkpointLocation", root + "_ckpt")
      .start()
    try {
      mem.addData(df.slice(30, 60): _*); q.processAllAvailable()
      mem.addData(df.drop(60): _*); q.processAllAvailable()
    } finally q.stop()
    val oneShot = Files.createTempDirectory("ann-intake-one")
      .toFile.getAbsolutePath + "/idx"
    val one = new AnnIndexStore(oneShot)
    one.writeLsh(df.toDF("vec_id", "embedding"))
    val probes = Seq(5L, 17L, 90L, 91L).toDF("vec_id")
    def hits(ix: AnnIndexStore): Seq[(Long, Long, Long, Long)] =
      ix.sweepDistributed(probes, k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
        .toSeq.sorted
    assert(hits(store).nonEmpty && hits(store) == hits(one),
      "streamed intake must serve the one-shot-built ranking")
    // REPLAY of an applied batch id is a no-op (the crash-replay shape
    // foreachBatch delivers): vector count and ranking unchanged
    val nVec = spark.read.parquet(s"$root/vectors").count()
    store.addBatch(df.slice(30, 60).toDF("vec_id", "embedding"), 0L)
    assert(spark.read.parquet(s"$root/vectors").count() == nVec)
    assert(hits(store) == hits(one))
    // CRASHED append: ledger written, rows landed, NO applied marker —
    // the retry purges the recorded ids before re-appending, so the
    // batch lands exactly once
    val extra = Seq((200L, df.head._2.map(x => x + 0.01f).toSeq))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    extra.toDF("vec_id", "embedding")
      .select(col("vec_id")).write.mode("overwrite")
      .parquet(s"$root/_intake/b9")
    new AnnIndexStore(root) // fresh instance: no memoized tombstones
      .append(extra.toDF("vec_id", "embedding"))
    store.addBatch(extra.toDF("vec_id", "embedding"), 9L)
    assert(spark.read.parquet(s"$root/vectors")
      .filter(col("vec_id") === 200L).count() == 1,
      "crashed-append retry must land the vector exactly once")
    // a full rebuild resets the intake history: the old applied marker
    // must not no-op a fresh chain's batch 0
    store.writeLsh(df.take(30).toDF("vec_id", "embedding"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/_applied")))
    store.addBatch(df.slice(30, 60).toDF("vec_id", "embedding"), 0L)
    assert(spark.read.parquet(s"$root/vectors").count() == 60)
  }
}
