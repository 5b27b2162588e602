package graft

import java.nio.file.Files
import graft.llmops.TextIndexStore
import org.apache.spark.sql.functions._

/** Position-free posting mode (`storePositions = false`) — the index
  * STORAGE knob: positions are the bulk of a positional index's bytes
  * (Lucene's IndexOptions distinction), and a BM25/sweep-only serving
  * tier never reads them. Pins: (1) the BM25 ranking chain is
  * bit-identical across modes (both serve forms), (2) the position-free
  * files physically lack the `pos` column and are smaller, (3)
  * phraseSearch fails fast with a clear message, (4) the mode is fixed
  * at the first batch — a mismatched handle fails instead of writing a
  * mixed-schema index — and survives compact and purge. */
class TextPosModeSpec extends SparkSpecBase {

  private def docs200 = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "text").limit(200)

  private def bytesUnder(dir: java.io.File): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(walk).sum
    walk(dir)
  }

  test("position-free mode: BM25 parity with the positional twin, " +
      "smaller files, no pos column on disk") {
    val all = docs200.cache()
    val pDir = Files.createTempDirectory("posmode-pos")
      .toFile.getAbsolutePath + "/idx"
    val nDir = Files.createTempDirectory("posmode-nopos")
      .toFile.getAbsolutePath + "/idx"
    val posIx = new TextIndexStore(pDir, numParts = 16)
    val noIx = new TextIndexStore(nDir, numParts = 16,
      storePositions = false)
    posIx.addBatch(spark, all, 0)
    noIx.addBatch(spark, all, 0)
    assert(!spark.read.parquet(s"$nDir/batch=0").columns.contains("pos"),
      "position-free postings must not carry a pos column")
    assert(spark.read.parquet(s"$pDir/batch=0").columns.contains("pos"))
    assert(bytesUnder(new java.io.File(nDir, "batch=0")) <
      bytesUnder(new java.io.File(pDir, "batch=0")),
      "dropping positions must shrink the postings")
    val queries = all.filter(col("doc_id").isin(1L, 5L, 9L))
      .select(col("doc_id").cast("string").as("qid"),
        explode(slice(split(col("text"), " "), 1, 5)).as("term"))
      .localCheckpoint(true)
    def rows(ix: TextIndexStore, dist: Boolean) =
      (if (dist) ix.searchDistributed(queries, k = 10, maxDfPermille = 900L)
       else ix.search(spark, queries, k = 10, maxDfPermille = 900L))
        .collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq.sorted
    val expected = rows(posIx, dist = false)
    assert(expected.nonEmpty && rows(noIx, dist = false) == expected,
      "BM25 ranking must be identical without positions")
    assert(rows(noIx, dist = true) == expected,
      "the distributed serve form too")
    // phrase search needs positions — fail fast, clear message
    val err = intercept[IllegalArgumentException] {
      noIx.phraseSearch(spark, Seq("a", "b")).collect()
    }
    assert(err.getMessage.contains("storePositions=false"), err.getMessage)
    all.unpersist()
  }

  test("the mode is fixed at the first batch and survives compact + " +
      "purge; a mismatched handle fails fast") {
    import spark.implicits._
    val dir = Files.createTempDirectory("posmode-fixed")
      .toFile.getAbsolutePath + "/idx"
    val docs = (0L until 40L).map(i => (i, s"mm k${i}x k${i}y"))
      .toDF("doc_id", "text")
    val noIx = new TextIndexStore(dir, numParts = 8, storePositions = false)
    noIx.addBatch(spark, docs.filter(col("doc_id") < 20), 0)
    // a positional handle on the same index must refuse to append
    val err = intercept[IllegalArgumentException] {
      new TextIndexStore(dir, numParts = 8)
        .addBatch(spark, docs.filter(col("doc_id") >= 20), 1)
    }
    assert(err.getMessage.contains("position mode is fixed"), err.getMessage)
    noIx.addBatch(spark, docs.filter(col("doc_id") >= 20), 1)
    // purge in position-free mode (schema-correct rewrite), then compact
    noIx.delete(spark, Seq(3L, 25L))
    assert(noIx.purge(spark) == ((2, 0))) // both batches hold dead docs
    noIx.compact(spark)
    assert(!spark.read.parquet(s"$dir/batch=0").columns.contains("pos"),
      "compact must preserve the position-free schema")
    // a FRESH default-flag handle still reads the marker's truth
    val reopened = new TextIndexStore(dir, numParts = 8)
    val q = Seq(("q", "mm")).toDF("qid", "term")
    val ids = reopened.search(spark, q, k = 50).collect().map(_.getLong(2))
    assert(ids.toSet == (0L until 40L).toSet -- Set(3L, 25L))
    val err2 = intercept[IllegalArgumentException] {
      reopened.phraseSearch(spark, Seq("mm", "k0x")).collect()
    }
    assert(err2.getMessage.contains("storePositions=false"))
  }
}
