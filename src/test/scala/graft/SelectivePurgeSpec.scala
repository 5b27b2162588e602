package graft

import java.nio.file.Files
import graft.llmops.{AnnIndexStore, TextIndexStore}
import org.apache.spark.sql.functions._

/** Selective-purge contract for [[TextIndexStore.purge]]: clearing a
  * LOCALIZED retraction must not rewrite the index. The per-batch
  * `_lens` tables pinpoint the batches holding dead docs; purge
  * rewrites ONLY those (postings + `_df` + `_lens` + `_stats`) and
  * leaves every other batch's files byte-untouched — at 100 TB the
  * difference between an O(retraction-locality) maintenance job and a
  * full-corpus rewrite. These specs pin: (1) untouched batches keep
  * identical file paths/sizes/mtimes, (2) ranking parity with a fresh
  * build over the survivors holds bit-for-bit after the purge with the
  * df-cap pricing slack-free again, (3) the dead set never collects to
  * the driver, (4) an all-dead batch is removed outright, and (5) a
  * crash between the commit marker and the swap rolls FORWARD from the
  * next serve entry. */
class SelectivePurgeSpec extends SparkSpecBase {

  /** Recursive (relativePath -> (length, mtime)) inventory of a dir —
    * the byte-untouched assertion's evidence. */
  private def inventory(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
    walk(dir).map(f =>
      f.getAbsolutePath.stripPrefix(dir.getAbsolutePath) ->
        (f.length(), f.lastModified())).toMap
  }

  private def docs200 = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").limit(200)

  private def hits(ix: TextIndexStore,
                   queries: org.apache.spark.sql.DataFrame)
      : Seq[(String, Int, Long, Long)] =
    ix.search(spark, queries, k = 10, maxDfPermille = 900L).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("purge rewrites ONLY the batches holding dead docs; untouched " +
      "batches stay byte-identical; parity + driver-free") {
    val dir = Files.createTempDirectory("text-purge")
      .toFile.getAbsolutePath + "/idx"
    val all = docs200.cache()
    val store = new TextIndexStore(dir, numParts = 16, serveDeadBound = 0L)
    store.addBatch(spark, all.filter(col("doc_id") < 70), 0)
    store.addBatch(spark,
      all.filter(col("doc_id") >= 70 && col("doc_id") < 140), 1)
    store.addBatch(spark, all.filter(col("doc_id") >= 140), 2)
    // the retraction is CONFINED to batch 1: half its docs, landed
    // distributed (the wide path — serveDeadBound = 0)
    val deadPred = col("doc_id") >= 70 && col("doc_id") < 140 &&
      col("doc_id") % 2 === 0
    store.delete(spark, all.filter(deadPred).select("doc_id"))
    val untouched = Seq("batch=0", "batch=2",
        "_df/batch=0", "_df/batch=2", "_lens/batch=0", "_lens/batch=2",
        "_stats/batch=0", "_stats/batch=2")
      .map(s => s -> inventory(new java.io.File(dir, s))).toMap
    untouched.foreach { case (s, inv) =>
      assert(inv.nonEmpty, s"$s must exist before the purge") }

    assert(store.purge(spark) == ((1, 2)),
      "exactly one affected batch, two untouched")
    assert(store.lastPurge == ((1, 2)))

    // THE selectivity contract: not one byte of the other batches moved
    untouched.foreach { case (s, inv) =>
      assert(inventory(new java.io.File(dir, s)) == inv,
        s"$s was rewritten by a purge that did not concern it") }
    assert(!new java.io.File(dir, "_tombstones").exists(),
      "purge must clear the tombstones")
    assert(store.tombstoneCount(spark) == 0L)
    // dead postings physically gone from the affected batch
    assert(spark.read.parquet(s"$dir/batch=1").select("doc_id")
      .filter(col("doc_id") % 2 === 0).isEmpty,
      "dead postings must be physically purged")
    // ranking parity vs a fresh build over the survivors — stats and
    // df-cap pricing are exact (slack-free) again after the purge
    val queries = all.filter(col("doc_id").isin(3L, 75L, 141L))
      .select(col("doc_id").cast("string").as("qid"),
        explode(slice(split(col("text"), " "), 1, 4)).as("term"))
      .localCheckpoint(true)
    val freshDir = Files.createTempDirectory("text-purge-fresh")
      .toFile.getAbsolutePath + "/idx"
    val fresh = new TextIndexStore(freshDir, numParts = 16)
    fresh.addBatch(spark, all.filter(!deadPred), 0)
    val expected = hits(fresh, queries)
    assert(expected.nonEmpty && hits(store, queries) == expected,
      "post-purge ranking must equal a fresh build over survivors")
    assert(store.driverDeadLoads == 0,
      s"the dead set collected ${store.driverDeadLoads}x to the driver " +
        "during a wide-path purge")
    all.unpersist()
  }

  test("a batch whose docs ALL died is removed outright; stats exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("text-purge-alldead")
      .toFile.getAbsolutePath + "/idx"
    val mk = (lo: Long, hi: Long) =>
      (lo until hi).map(i => (i, s"w$i common tail")).toDF("doc_id", "text")
    val store = new TextIndexStore(dir, numParts = 8, serveDeadBound = 0L)
    store.addBatch(spark, mk(0, 30), 0)
    store.addBatch(spark, mk(30, 60), 1)
    store.delete(spark, mk(30, 60).select("doc_id"))
    assert(store.purge(spark) == ((1, 1)))
    Seq("batch=1", "_df/batch=1", "_lens/batch=1", "_stats/batch=1")
      .foreach(s => assert(!new java.io.File(dir, s).exists(),
        s"$s of the all-dead batch must be gone"))
    assert(store.stats(spark) == ((30L, 90L)),
      "stats must count exactly the surviving batch")
    val q = Seq(("q", "common")).toDF("qid", "term")
    val ids = store.search(spark, q, k = 50).collect().map(_.getLong(2))
    assert(ids.nonEmpty && ids.forall(_ < 30L))
  }

  test("a purge crashing after its commit marker rolls forward from " +
      "the next serve entry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("text-purge-crash")
      .toFile.getAbsolutePath + "/idx"
    val docs = (0L until 40L).map(i => (i, s"zz u${i}a u${i}b"))
      .toDF("doc_id", "text")
    val store = new TextIndexStore(dir, numParts = 8, serveDeadBound = 0L)
    store.addBatch(spark, docs.filter(col("doc_id") < 20), 0)
    store.addBatch(spark, docs.filter(col("doc_id") >= 20), 1)
    store.delete(spark, docs.filter(col("doc_id") >= 30).select("doc_id"))
    store.crashAfterCommit = true
    store.purge(spark) // staging + marker land, NO swap — the crash
    store.crashAfterCommit = false
    assert(new java.io.File(dir, "_purge_stage/_graft_purge_done").exists(),
      "the commit marker must be on disk in the crash window")
    assert(new java.io.File(dir, "_tombstones").exists(),
      "tombstones must survive the crash (serving still filters them)")
    // a FRESH handle (no in-memory state) serves: heal rolls the swap
    // forward, then the ranking equals a fresh build over survivors
    val reopened = new TextIndexStore(dir, numParts = 8, serveDeadBound = 0L)
    val q = Seq(("q", "zz")).toDF("qid", "term")
    val ids = reopened.search(spark, q, k = 50).collect().map(_.getLong(2))
    assert(ids.toSet == (0L until 30L).toSet,
      s"healed serve must return exactly the survivors: ${ids.sorted.toSeq}")
    assert(!new java.io.File(dir, "_purge_stage").exists(),
      "heal must retire the staging")
    assert(!new java.io.File(dir, "_tombstones").exists(),
      "heal must clear the spent tombstones")
    assert(reopened.tombstoneCount(spark) == 0L)
  }

  test("a torn commit marker (0-byte or truncated) is discarded as " +
      "uncommitted staging — never rolled forward") {
    import spark.implicits._
    val dir = Files.createTempDirectory("text-purge-torn")
      .toFile.getAbsolutePath + "/idx"
    val docs = (0L until 40L).map(i => (i, s"tt v${i}a v${i}b"))
      .toDF("doc_id", "text")
    val store = new TextIndexStore(dir, numParts = 8)
    store.addBatch(spark, docs.filter(col("doc_id") < 20), 0)
    store.addBatch(spark, docs.filter(col("doc_id") >= 20), 1)
    // rare per-doc terms: "tt" rides every doc and the 900-permille
    // df-cap would drop it
    val q = Seq(("q", "v3a"), ("q", "v25a")).toDF("qid", "term")
    val before = hits(store, q)
    assert(before.map(_._3).toSet == Set(3L, 25L))
    val liveInv = inventory(new java.io.File(dir, "batch=1"))
    // CRASH SIMULATION 1: a 0-byte marker (writer died right at the
    // create) inside a stage left behind — the pre-atomic writer could
    // leave exactly this; every serve entry heals, so a parse throw
    // here would make the store unserveable until manual cleanup
    val stage = new java.io.File(dir, "_purge_stage")
    assert(stage.mkdirs())
    assert(new java.io.File(stage, "_graft_purge_done").createNewFile())
    val served0 = hits(new TextIndexStore(dir, numParts = 8), q)
    assert(served0 == before, "serve must heal past a 0-byte marker")
    assert(!stage.exists(), "0-byte-marker staging must be discarded")
    // CRASH SIMULATION 2: a truncated manifest whose affected-id list
    // tore ("12" -> "1", terminator lost). Rolling it forward would
    // delete LIVE batch=1 as affected-but-unstaged — silent data loss.
    assert(stage.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(stage, "_graft_purge_done").toPath,
      "clear\n1".getBytes("UTF-8"))
    val served1 = hits(new TextIndexStore(dir, numParts = 8), q)
    assert(served1 == before, "serve must heal past a torn manifest")
    assert(!stage.exists(), "torn-manifest staging must be discarded")
    assert(inventory(new java.io.File(dir, "batch=1")) == liveInv,
      "a torn manifest must never delete a live batch dir")
    // ...and a REAL purge on the same store still commits atomically
    // (manifest rename + terminator) and completes
    store.delete(spark, Seq(25L))
    assert(store.purge(spark) == ((1, 1)))
    val after = hits(new TextIndexStore(dir, numParts = 8), q)
    assert(after.nonEmpty && !after.exists(_._3 == 25L))
  }

  test("AnnIndexStore: a torn layout marker is discarded, live dirs " +
      "survive, serving heals") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    def vec(): Array[Float] = Array.fill(16)(rnd.nextGaussian().toFloat)
    val df = (0L until 80L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val root = Files.createTempDirectory("ann-purge-torn")
      .toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root)
    store.writeLsh(df)
    val before = store.lshTopK(spark, probeId = 6L, k = 5)
      .collect().map(_.getLong(0)).toSeq
    val vecInv = inventory(new java.io.File(root, "vectors"))
    // 0-byte marker in a leftover vectors stage: the heal at the next
    // tombstone load must discard it, not throw or roll forward
    val stage = new java.io.File(root, "_purge_vectors")
    assert(stage.mkdirs())
    assert(new java.io.File(stage, "_graft_purge_done").createNewFile())
    val healed = new AnnIndexStore(root)
    healed.delete(spark, Seq(79L)) // forces the tombstone-load heal path
    val served = healed.lshTopK(spark, probeId = 6L, k = 5)
      .collect().map(_.getLong(0)).toSeq
    assert(!stage.exists(), "torn ANN staging must be discarded")
    assert(inventory(new java.io.File(root, "vectors")) == vecInv,
      "a torn layout marker must never touch live dirs")
    assert(served.nonEmpty && !served.contains(79L) &&
      served.filterNot(_ == 79L) == before.filterNot(_ == 79L)
        .take(served.size),
      s"healed serve must match pre-crash minus the delete: " +
        s"$before -> $served")
  }

  test("AnnIndexStore purge (lsh): only dirs holding dead rows rewrite; " +
      "serve parity; tombstones cleared") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(24)(rnd.nextGaussian().toFloat)
    val df = (0L until 100L).map(i => (i, vec())).toDF("vec_id", "embedding")
      .localCheckpoint(true)
    val root = Files.createTempDirectory("ann-purge")
      .toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root, serveDeadBound = 0L)
    store.writeLsh(df)
    // a LOCALIZED retraction: three ids, landed distributed
    val deadIds = Set(4L, 37L, 81L)
    // which leaf dirs actually hold the dead rows — computed from the
    // pre-purge layouts, so the untouched-dirs assertion is exact
    def leafOwners(layout: String): Set[String] = {
      val d = spark.read.parquet(s"$root/$layout")
      val cols = if (layout == "vectors") Seq("part") else Seq("band", "part")
      d.filter(col("vec_id").isin(deadIds.toSeq: _*))
        .select(cols.map(col): _*).distinct().collect()
        .map(r => cols.zipWithIndex.map { case (c, i) => s"$c=${r.get(i)}" }
          .mkString("/")).toSet
    }
    val affVec = leafOwners("vectors")
    val affLsh = leafOwners("lsh_buckets")
    val invVec = inventory(new java.io.File(root, "vectors"))
    val invLsh = inventory(new java.io.File(root, "lsh_buckets"))
    // k beyond the candidate pool: the serves below return the FULL
    // candidate ranking, so survivor-list equality is well-defined
    val before = store.lshTopK(spark, probeId = 10L, k = 200)
      .collect().map(_.getLong(0)).toSeq
    store.delete(spark, deadIds.toSeq.toDF("vec_id"))
    val servedPending = store.lshTopK(spark, probeId = 10L, k = 200)
      .collect().map(_.getLong(0)).toSeq
    val (aff, unt) = store.purge(spark)
    assert(aff == affVec.size + affLsh.size && unt > 0 && aff < aff + unt,
      s"purge must touch exactly the owning dirs: ($aff, $unt) vs " +
        s"${affVec.size}+${affLsh.size}")
    // every non-owning dir: not one byte moved
    def untouchedOk(inv: Map[String, (Long, Long)], dir: String,
                    owners: Set[String]): Unit = {
      val now = inventory(new java.io.File(root, dir))
      val ownedPrefix = (p: String) =>
        owners.exists(o => p.startsWith("/" + o + "/"))
      assert(inv.filterNot { case (p, _) => ownedPrefix(p) } ==
        now.filterNot { case (p, _) => ownedPrefix(p) },
        s"$dir: a non-owning dir was rewritten")
    }
    untouchedOk(invVec, "vectors", affVec)
    untouchedOk(invLsh, "lsh_buckets", affLsh)
    assert(!new java.io.File(s"$root/_tombstones").exists())
    assert(store.tombstoneCount(spark) == 0L)
    // dead rows physically gone from both layouts
    Seq("vectors", "lsh_buckets").foreach(l =>
      assert(spark.read.parquet(s"$root/$l")
        .filter(col("vec_id").isin(deadIds.toSeq: _*)).isEmpty,
        s"$l still holds dead rows"))
    // post-purge serve == pending-window serve == pre-delete minus dead
    val after = store.lshTopK(spark, probeId = 10L, k = 200)
      .collect().map(_.getLong(0)).toSeq
    assert(after == servedPending, "purge must not change the ranking")
    assert(after == before.filterNot(deadIds), "survivor ranking preserved")
  }

  test("AnnIndexStore purge (ivf): unaffected clusters stay " +
      "byte-identical; membership scan finds the owners") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // two well-separated blobs so cluster ownership is stable
    def vec(center: Float): Array[Float] =
      Array.fill(16)(center + 0.05f * rnd.nextGaussian().toFloat)
    val df = ((0L until 40L).map(i => (i, vec(-2f))) ++
        (40L until 80L).map(i => (i, vec(2f))))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val root = Files.createTempDirectory("ann-purge-ivf")
      .toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root, serveDeadBound = 0L)
    store.writeIvf(df, nClusters = 2, dim = 16)
    val deadIds = Set(41L, 42L, 43L) // one blob only
    val affClusters = spark.read.parquet(s"$root/ivf")
      .filter(col("vec_id").isin(deadIds.toSeq: _*))
      .select("cluster").distinct().collect().map(r => s"cluster=${r.get(0)}")
      .toSet
    val invIvf = inventory(new java.io.File(root, "ivf"))
    store.delete(spark, deadIds.toSeq.toDF("vec_id"))
    val (aff, unt) = store.purge(spark)
    assert(aff > 0 && unt > 0, s"($aff, $unt): localized purge must " +
      "leave some dirs untouched")
    val now = inventory(new java.io.File(root, "ivf"))
    val owned = (p: String) => affClusters.exists(o => p.startsWith("/" + o + "/"))
    assert(invIvf.filterNot(kv => owned(kv._1)) ==
      now.filterNot(kv => owned(kv._1)),
      "an unaffected cluster dir was rewritten")
    assert(spark.read.parquet(s"$root/ivf")
      .filter(col("vec_id").isin(deadIds.toSeq: _*)).isEmpty)
    assert(store.tombstoneCount(spark) == 0L)
    val hits = store.ivfTopK(spark, probeId = 45L, k = 10, nprobe = 2)
      .collect().map(_.getLong(0))
    assert(hits.nonEmpty && hits.forall(id => !deadIds(id)))
  }

  test("AnnIndexStore purge crash after commit: a fresh instance heals " +
      "on first tombstone load; serving exact throughout") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val df = (0L until 50L)
      .map(i => (i, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val root = Files.createTempDirectory("ann-purge-crash")
      .toFile.getAbsolutePath + "/idx"
    val store = new AnnIndexStore(root, serveDeadBound = 0L)
    store.writeLsh(df)
    store.delete(spark, Seq(5L, 6L).toDF("vec_id"))
    store.crashAfterCommit = true
    store.purge(spark) // at least one layout commits, no swap
    store.crashAfterCommit = false
    assert(new java.io.File(s"$root/_tombstones").exists(),
      "tombstones must survive the crash window")
    // fresh handle: the crash window serves exactly (layouts intact +
    // tombstone filter), and the first dead-set load rolls the
    // committed staging forward
    val reopened = new AnnIndexStore(root, serveDeadBound = 0L)
    val served = reopened.lshTopK(spark, probeId = 10L, k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(!served(5L) && !served(6L), "dead ids must not serve")
    assert(!new java.io.File(s"$root/_purge_vectors").exists(),
      "heal must retire the committed staging")
    // the re-run purge completes and clears the spent tombstones
    reopened.purge(spark)
    assert(!new java.io.File(s"$root/_tombstones").exists())
    Seq("vectors", "lsh_buckets").foreach(l =>
      assert(spark.read.parquet(s"$root/$l")
        .filter(col("vec_id").isin(5L, 6L)).isEmpty, s"$l not purged"))
  }

  test("purging tombstones that reference no indexed doc just clears " +
      "them (nothing rewritten)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("text-purge-noop")
      .toFile.getAbsolutePath + "/idx"
    val docs = (0L until 10L).map(i => (i, s"pp q$i")).toDF("doc_id", "text")
    val store = new TextIndexStore(dir, numParts = 4)
    store.addBatch(spark, docs, 0)
    val inv = inventory(new java.io.File(dir, "batch=0"))
    store.delete(spark, Seq(999L, 1000L)) // never indexed
    assert(store.purge(spark) == ((0, 1)))
    assert(inventory(new java.io.File(dir, "batch=0")) == inv)
    assert(store.tombstoneCount(spark) == 0L)
  }
}
