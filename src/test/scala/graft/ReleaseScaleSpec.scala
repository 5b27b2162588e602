package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import graft.streaming.GraftApp

/** Scale contracts of the `release` verb that a correctness diff cannot
  * see: the chunked intake must read the RAW corpus a constant number
  * of times (never once per chunk — a cold 100 TB release at thousands
  * of chunks must not pay thousands of corpus scans), and the
  * per-release report must derive from the SOURCES sidecar without ever
  * scanning the assembled corpus. */
class ReleaseScaleSpec extends SparkSpecBase {

  /** Executed plans that scan `path`, counted via a listener over the
    * ANALYZED plan (file scans appear there as HadoopFsRelation roots;
    * checkpointed branches hide behind LogicalRDD identically in every
    * run, so the count compares apples to apples across runs). */
  private def countScansOf(path: String)(work: => Unit): Int = {
    val scans = new AtomicInteger(0)
    val marker = new java.io.File(path).getName
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        // exhaustive inner match: a non-file LogicalRelation earlier in
        // the traversal must fall through to the file scans behind it,
        // not MatchError out of the listener
        val hit = qe.analyzed.collect {
          case lr: LogicalRelation => lr.relation match {
            case h: HadoopFsRelation =>
              h.location.rootPaths.exists(_.toString.contains(marker))
            case _ => false
          }
        }.contains(true)
        if (hit) scans.incrementAndGet()
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      work
      awaitQuiet(scans.get()) // the listener bus is async
    } finally spark.listenerManager.unregister(l)
  }

  private def en(tag: String): String =
    ("the start and more of it" +:
      (0 until 24).map(i => s"$tag$i")).mkString(" ")

  test("chunked release reads the raw corpus O(1) times — independent " +
      "of the chunk count") {
    import spark.implicits._
    val docs = (0L until 12L).map(i => (i, "web", en(s"rs$i")))
    val docsDir = Files.createTempDirectory("rsc-docs-marker")
      .toFile.getAbsolutePath
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(docsDir)
    val tok = Files.createTempDirectory("rsc-tok").toFile.getAbsolutePath + "/tok"
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "bpe-train", "GRAFT_BPE_DOCS" -> docsDir,
      "GRAFT_BPE_OUT" -> tok, "GRAFT_BPE_MERGES" -> "3"))
    def runRel(tag: String, batchDocs: Int): Int = {
      val out = Files.createTempDirectory(s"rsc-out-$tag")
        .toFile.getAbsolutePath + "/rel"
      countScansOf(docsDir) {
        GraftApp.maintenance(spark, Map(
          "GRAFT_MAINTENANCE" -> "release", "GRAFT_RELEASE_DOCS" -> docsDir,
          "GRAFT_RELEASE_OUT" -> out, "GRAFT_EMIT_TOKENIZER" -> tok,
          "GRAFT_EMIT_BUDGET" -> "64", "GRAFT_EMIT_SHARDS" -> "2",
          "GRAFT_RELEASE_BATCH_DOCS" -> batchDocs.toString))
      }
    }
    val at3 = runRel("c3", 4) // 12 docs / 4 -> 3 chunks
    val at6 = runRel("c6", 2) // 12 docs / 2 -> 6 chunks
    // doubling the chunk count must not add a single raw scan: the
    // delta payload is staged once and chunks read only their own
    // __chunk=i files
    assert(at3 == at6,
      s"raw-corpus scan count must be independent of nChunks: $at3 vs $at6")
    // ...and the constant is small: the one delta-staging join (the
    // ids-only delta-detect pass runs behind a checkpoint barrier and
    // never re-executes the scan per chunk either way)
    assert(at6 <= 3, s"chunked release must stage the delta once, " +
      s"not rescan raw: $at6 scans")
  }

  test("release report derives from the SOURCES sidecar — no job over " +
      "the assembled corpus") {
    import spark.implicits._
    val docs = Seq(
      (0L, "web", en("sa")), (1L, "web", en("sb")), (2L, "books", en("sc")))
    val docsDir = Files.createTempDirectory("rss-docs").toFile.getAbsolutePath
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(docsDir)
    val tok = Files.createTempDirectory("rss-tok").toFile.getAbsolutePath + "/tok"
    GraftApp.maintenance(spark, Map(
      "GRAFT_MAINTENANCE" -> "bpe-train", "GRAFT_BPE_DOCS" -> docsDir,
      "GRAFT_BPE_OUT" -> tok, "GRAFT_BPE_MERGES" -> "3"))
    val out = Files.createTempDirectory("rss-out").toFile.getAbsolutePath + "/rel"
    val relEnv = Map(
      "GRAFT_MAINTENANCE" -> "release", "GRAFT_RELEASE_DOCS" -> docsDir,
      "GRAFT_RELEASE_OUT" -> out, "GRAFT_EMIT_TOKENIZER" -> tok,
      "GRAFT_EMIT_BUDGET" -> "64", "GRAFT_EMIT_SHARDS" -> "2")
    GraftApp.maintenance(spark, relEnv)
    assert(!GraftApp.lastReportScan,
      "a sidecar-bearing release must not scan the corpus for its report")
    // the sidecar itself exists next to the manifest and its fold
    // equals the corpus truth
    import graft.llmops.{SegPool, VersionedDir}
    val v1 = VersionedDir.currentPath(spark, s"$out/docs").get
    val hfs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val side = SegPool.readSources(hfs, v1)
      .getOrElse(fail("SOURCES sidecar missing"))
    val bySrc = side.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    assert(bySrc == Map("web" -> 2L, "books" -> 1L), s"$bySrc")
    val rep = spark.read.parquet(s"$out/_report")
      .filter(col("source") =!= "*" && col("stage") === "final")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rep == Map("web" -> 2L, "books" -> 1L), s"report $rep")
    // incremental over the sidecar root: untouched segs carry their
    // counts forward without a scan, the fresh seg adds its own
    val docsDir2 = Files.createTempDirectory("rss-docs2").toFile.getAbsolutePath
    (docs :+ ((5L, "books", en("sd")))).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(docsDir2)
    GraftApp.maintenance(spark, relEnv + ("GRAFT_RELEASE_DOCS" -> docsDir2))
    assert(!GraftApp.lastReportScan)
    val v2 = VersionedDir.currentPath(spark, s"$out/docs").get
    val side2 = SegPool.readSources(hfs, v2).get
      .groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    assert(side2 == Map("web" -> 2L, "books" -> 2L), s"$side2")
  }
}
