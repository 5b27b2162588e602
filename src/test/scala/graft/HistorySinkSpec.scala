package graft

import graft.model.{CdcColumn, CdcEvent}
import graft.sinks.HistorySink
import graft.streaming.CdcPipeline
import org.apache.spark.sql.functions._

/** SCD2 history: every change becomes an immutable version row with an
  * LSN validity interval; asOf(L) equals the replica built from the
  * event prefix ≤ L; truncate caps intervals via a marker; compact
  * preserves the served history while materializing valid_to; probes
  * prune to one hash part. */
class HistorySinkSpec extends SparkSpecBase {
  import spark.implicits._

  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def ins(lsn: Long, id: Int, v: Int) =
    CdcEvent("c", lsn, 1L, ts, "public", "t1", Nil,
      Seq(CdcColumn("id", id.toString), CdcColumn("v", v.toString)),
      keyColumns = Seq("id"))

  private def upd(lsn: Long, id: Int, ov: Int, nv: Int) =
    CdcEvent("u", lsn, 1L, ts, "public", "t1",
      Seq(CdcColumn("id", id.toString), CdcColumn("v", ov.toString)),
      Seq(CdcColumn("id", id.toString), CdcColumn("v", nv.toString)),
      keyColumns = Seq("id"))

  private def del(lsn: Long, id: Int, ov: Int) =
    CdcEvent("d", lsn, 1L, ts, "public", "t1",
      Seq(CdcColumn("id", id.toString), CdcColumn("v", ov.toString)), Nil,
      keyColumns = Seq("id"))

  private def trunc(lsn: Long) =
    CdcEvent("t", lsn, 1L, ts, "public", "t1", Nil, Nil,
      truncateTables = Seq("public.t1"))

  private val hist = Seq("public.t1")

  // a keyless ops handle: layout + keys resolve from the store meta
  // the warehouse chain wrote (a keyed handle with mismatched knobs
  // must fail fast — asserted below)
  private def sinkOf(root: String) =
    new HistorySink(s"$root/_history/public.t1", Nil)

  /** (id, op, valid_from, valid_to(-1=open), v, is_current) rows. */
  private def chains(h: HistorySink): Set[(String, String, Long, Long, String, Boolean)] =
    h.history(spark).collect().map { r =>
      def l(n: String) =
        if (r.isNullAt(r.fieldIndex(n))) -1L else r.getLong(r.fieldIndex(n))
      (r.getString(r.fieldIndex("id")), r.getString(r.fieldIndex("op")),
        l("valid_from"), l("valid_to"), r.getString(r.fieldIndex("v")),
        r.getBoolean(r.fieldIndex("is_current")))
    }.toSet

  private def stateOf(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.select(col("id"), col("v")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("version chains across batches; asOf equals every event-prefix replica") {
    val root = java.nio.file.Files.createTempDirectory("hist").toFile.getAbsolutePath
    val h = sinkOf(root)
    // batch 0: two inserts + same-batch update of id 1 (interval closed
    // at write time); batch 1: update id 2, delete id 1, insert id 3
    CdcPipeline.applyWarehouseBatch(
      Seq(ins(1, 1, 10), ins(2, 2, 20), upd(3, 1, 10, 11)).toDS(),
      root, 4, batchId = 0, historyTables = hist)
    CdcPipeline.applyWarehouseBatch(
      Seq(upd(4, 2, 20, 21), del(5, 1, 11), ins(6, 3, 30)).toDS(),
      root, 4, batchId = 1, historyTables = hist)
    assert(chains(h) == Set(
      ("1", "c", 1L, 3L, "10", false),
      ("1", "u", 3L, 5L, "11", false), // closed ACROSS batches at read
      ("1", "d", 5L, -1L, "11", false), // tombstone: open but never current
      ("2", "c", 2L, 4L, "20", false),
      ("2", "u", 4L, -1L, "21", true),
      ("3", "c", 6L, -1L, "30", true)))
    // time travel at every LSN == replica of the event prefix
    val all = Seq(ins(1, 1, 10), ins(2, 2, 20), upd(3, 1, 10, 11),
      upd(4, 2, 20, 21), del(5, 1, 11), ins(6, 3, 30))
    for (l <- 1L to 6L) {
      val pref = java.nio.file.Files.createTempDirectory(s"hist-p$l")
        .toFile.getAbsolutePath
      CdcPipeline.applyWarehouseBatch(all.filter(_.lsn <= l).toDS(),
        pref, 4, batchId = 0)
      assert(stateOf(h.asOf(spark, l)) ==
        stateOf(spark.read.parquet(s"$pref/public.t1")),
        s"asOf($l) diverges from the prefix replica")
    }
  }

  test("truncate caps spanning intervals; post-truncate rows survive") {
    val root = java.nio.file.Files.createTempDirectory("hist-t").toFile.getAbsolutePath
    val h = sinkOf(root)
    CdcPipeline.applyWarehouseBatch(
      Seq(ins(1, 1, 10), ins(2, 2, 20)).toDS(),
      root, 4, batchId = 0, historyTables = hist)
    // same-batch pre-truncate DML: replica drops it, HISTORY keeps it
    // (capped at the truncate), post-truncate insert lives on
    CdcPipeline.applyWarehouseBatch(
      Seq(upd(3, 1, 10, 11), trunc(4), ins(5, 3, 30)).toDS(),
      root, 4, batchId = 1, historyTables = hist)
    assert(chains(h) == Set(
      ("1", "c", 1L, 3L, "10", false),
      ("1", "u", 3L, 4L, "11", false), // capped BY THE MARKER, no rewrite
      ("2", "c", 2L, 4L, "20", false),
      ("3", "c", 5L, -1L, "30", true)))
    // time travel around the truncate: full state before, one row after
    assert(stateOf(h.asOf(spark, 3)) == Set(("1", "11"), ("2", "20")))
    assert(stateOf(h.asOf(spark, 4)) == Set.empty)
    assert(stateOf(h.asOf(spark, 5)) == Set(("3", "30")))
    // and the replica agrees at the tip
    assert(stateOf(h.asOf(spark, 5)) ==
      stateOf(spark.read.parquet(s"$root/public.t1")))
  }

  test("compact materializes valid_to; serving identical; replay overwrites") {
    val root = java.nio.file.Files.createTempDirectory("hist-c").toFile.getAbsolutePath
    val h = sinkOf(root)
    // 4 batches, LSNs monotone across them: id 1 updated every batch
    // (a cross-batch chain), one fresh insert per batch
    CdcPipeline.applyWarehouseBatch(
      Seq(ins(1, 1, 0), ins(2, 50, 0)).toDS(),
      root, 4, batchId = 0, historyTables = hist)
    for (b <- 1 until 4)
      CdcPipeline.applyWarehouseBatch(
        Seq(upd(10 * b, 1, b - 1, b), ins(10 * b + 1, 50 + b, b)).toDS(),
        root, 4, batchId = b, historyTables = hist)
    val before = chains(h)
    assert(h.compact(spark) > 0)
    assert(chains(h) == before, "compaction must not change served history")
    // folded base rows carry materialized valid_to across old batch
    // boundaries: id 1's chain (c@1, u@10, u@20 in the fold) is closed
    // on disk except the fold-time-open tail
    val baseDir = new java.io.File(s"$root/_history/public.t1").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .sortBy(_.getName.stripPrefix("b").toLong).head
    val stored = spark.read.parquet(baseDir.getAbsolutePath)
      .filter(col("id") === "1" && col("valid_to").isNotNull).count()
    assert(stored >= 2, s"fold must materialize cross-batch valid_to (got $stored)")
    // a replayed (overwritten) newest batch does not duplicate versions
    CdcPipeline.applyWarehouseBatch(
      Seq(upd(30, 1, 2, 3), ins(31, 53, 3)).toDS(),
      root, 4, batchId = 3, historyTables = hist) // stale gate: no-op
    sinkOf(root).applyBatch(spark,
      Seq(("u", 30L, "1", "3"), ("c", 31L, "53", "3"))
        .toDF("op", "lsn", "id", "v"), 3L)
    assert(chains(h) == before, "replay must overwrite, not append")
  }

  test("probe prunes to the key's hash part and returns the full chain") {
    val root = java.nio.file.Files.createTempDirectory("hist-p").toFile.getAbsolutePath
    val h = sinkOf(root)
    val evs = (1 to 40).map(i => ins(i, i, i)) ++
      (1 to 40).map(i => upd(40 + i, i, i, 100 + i))
    CdcPipeline.applyWarehouseBatch(evs.take(40).toDS(), root, 4,
      batchId = 0, historyTables = hist)
    CdcPipeline.applyWarehouseBatch(evs.drop(40).toDS(), root, 4,
      batchId = 1, historyTables = hist)
    val chain = h.probe(spark, Seq("7")).collect()
      .map(r => (r.getString(r.fieldIndex("op")),
        r.getLong(r.fieldIndex("valid_from")))).toSeq
    assert(chain == Seq(("c", 7L), ("u", 47L)))
    // a handle with a different hash layout fails fast instead of
    // scattering versions across two layouts
    intercept[IllegalArgumentException] {
      new HistorySink(s"$root/_history/public.t1", Seq("id"), 64)
        .history(spark)
    }
    // pruned read touches ONE part per b-dir, not the whole store
    val parts = new java.io.File(s"$root/_history/public.t1/b0").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("part="))
    assert(parts > 1, "test needs multiple parts to prove pruning")
    // ...asserted on the EXECUTED plan: the probe's scans plan strictly
    // fewer files than a full history read (partition pruning is real,
    // not an API promise)
    def plannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      def all(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: all(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          p +: all(r.child)
        case _ => (p +: p.children.flatMap(all)) ++ p.subqueries.flatMap(all)
      }
      all(plan)
        .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value }.sum
    }
    val probedFiles = plannedFiles(h.probe(spark, Seq("7")))
    val fullFiles = plannedFiles(h.history(spark))
    assert(probedFiles > 0 && probedFiles < fullFiles,
      s"probe planned $probedFiles files vs full $fullFiles — no pruning")
  }

  test("retention: compact(retainBelow) drops only pre-horizon chain prefixes") {
    val root = java.nio.file.Files.createTempDirectory("hist-r").toFile.getAbsolutePath
    val h = sinkOf(root)
    // id 1: c@1→4, u@4→6, u@6 open; id 2: c@2→5, d@5 tombstone;
    // id 3: c@3 open from the start; id 4: c@7 late insert
    CdcPipeline.applyWarehouseBatch(
      Seq(ins(1, 1, 10), ins(2, 2, 20), ins(3, 3, 30)).toDS(),
      root, 4, batchId = 0, historyTables = hist)
    CdcPipeline.applyWarehouseBatch(
      Seq(upd(4, 1, 10, 11), del(5, 2, 20)).toDS(),
      root, 4, batchId = 1, historyTables = hist)
    CdcPipeline.applyWarehouseBatch(
      Seq(upd(6, 1, 11, 12), ins(7, 4, 40)).toDS(),
      root, 4, batchId = 2, historyTables = hist)
    val tipBefore = stateOf(h.asOf(spark, 7))
    val at5 = stateOf(h.asOf(spark, 5))
    // horizon 5: drops id1 c@1 (ended 4) and id2 c@2 (ended 5); keeps
    // id1 u@4 (ends 6 > 5), the un-closed d@5 tombstone, all open rows
    assert(h.compact(spark, retainBelow = Some(5L)) > 0)
    assert(chains(h).map(t => (t._1, t._2, t._3)) == Set(
      ("1", "u", 4L), ("1", "u", 6L), ("2", "d", 5L),
      ("3", "c", 3L), ("4", "c", 7L)))
    // every state at/after the horizon is untouched
    assert(stateOf(h.asOf(spark, 7)) == tipBefore)
    assert(stateOf(h.asOf(spark, 5)) == at5)
  }

  test("bootstrap seeds open versions from a replica snapshot; changes() slices") {
    val root = java.nio.file.Files.createTempDirectory("hist-b").toFile.getAbsolutePath
    // an already-replicated table (no history yet): 3 live rows at lsn 10
    CdcPipeline.applyWarehouseBatch(
      Seq(ins(8, 1, 10), ins(9, 2, 20), ins(10, 3, 30)).toDS(),
      root, 4, batchId = 0)
    val lines = graft.streaming.GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "history-bootstrap",
      "GRAFT_WAREHOUSE_DIR" -> root,
      "GRAFT_WAREHOUSE_BUCKETS" -> "4",
      "GRAFT_HISTORY_TABLES" -> "public.t1:id",
      "GRAFT_HISTORY_BOOTSTRAP_LSN" -> "10"))
    assert(lines.contains(
      "history-bootstrap public.t1: 3 versions seeded at lsn 10"), lines)
    // the chain continues from the bootstrap point
    CdcPipeline.applyWarehouseBatch(
      Seq(upd(11, 1, 10, 11), del(12, 3, 30)).toDS(),
      root, 4, batchId = 1, historyTables = hist)
    val h = sinkOf(root)
    assert(stateOf(h.asOf(spark, 10)) ==
      Set(("1", "10"), ("2", "20"), ("3", "30")))
    assert(stateOf(h.asOf(spark, 12)) == Set(("1", "11"), ("2", "20")))
    assert(stateOf(h.asOf(spark, 12)) ==
      stateOf(spark.read.parquet(s"$root/public.t1")))
    // incremental re-fetch: only versions opened after the consumer's
    // high-water mark, with store-final intervals
    val delta = h.changes(spark, 10).collect()
      .map(r => (r.getString(r.fieldIndex("id")),
        r.getString(r.fieldIndex("op")),
        r.getLong(r.fieldIndex("valid_from")))).toSet
    assert(delta == Set(("1", "u", 11L), ("3", "d", 12L)))
    // the bootstrap row the update closed shows the closure
    val closed = h.probe(spark, Seq("1")).collect().head
    assert(closed.getLong(closed.fieldIndex("valid_to")) == 11L)
  }

  test("history verb: heal+fold, counts, asof and probe read-outs from env") {
    val root = java.nio.file.Files.createTempDirectory("hist-v").toFile.getAbsolutePath
    CdcPipeline.applyWarehouseBatch(
      Seq(ins(1, 1, 10), ins(2, 2, 20)).toDS(),
      root, 4, batchId = 0, historyTables = hist)
    CdcPipeline.applyWarehouseBatch(
      Seq(upd(3, 1, 10, 11)).toDS(),
      root, 4, batchId = 1, historyTables = hist)
    CdcPipeline.applyWarehouseBatch(
      Seq(del(4, 2, 20)).toDS(),
      root, 4, batchId = 2, historyTables = hist)
    val lines = graft.streaming.GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "history",
      "GRAFT_WAREHOUSE_DIR" -> root,
      "GRAFT_HISTORY_TABLES" -> "public.t1", // keys from the store meta
      "GRAFT_HISTORY_ASOF" -> "2",
      "GRAFT_HISTORY_PROBE" -> "1"))
    assert(lines.contains(
      "history public.t1: folded 2 dirs, 4 versions, 1 current"), lines)
    assert(lines.contains("history public.t1 asof 2: 2 rows"), lines)
    assert(lines.exists(l => l.startsWith("history public.t1 probe 1:") &&
      l.contains("c,1,10,1,3,false") && l.contains("u,1,11,3,null,true")), lines)
  }
}
