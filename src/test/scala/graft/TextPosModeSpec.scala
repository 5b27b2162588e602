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

  test("legacy index without a _posmode marker: the mode is inferred " +
      "from the stored schema, never the handle's flag") {
    import spark.implicits._
    val dir = Files.createTempDirectory("posmode-legacy")
      .toFile.getAbsolutePath + "/idx"
    val docs = (0L until 30L).map(i => (i, s"leg a${i}p a${i}q"))
      .toDF("doc_id", "text")
    new TextIndexStore(dir, numParts = 8).addBatch(spark, docs, 0)
    // simulate a pre-marker index: the batch dirs carry positions but
    // no _posmode file exists (built before the marker was introduced)
    assert(new java.io.File(dir, "_posmode").delete())
    // a deployment that has since flipped GRAFT_TEXT_POSITIONS=0 opens
    // it with storePositions=false — the stored schema must win: the
    // index still serves phrases...
    val flipped = new TextIndexStore(dir, numParts = 8,
      storePositions = false)
    val hits = flipped.phraseSearch(spark, Seq("leg", "a4p"))
      .collect().map(_.getLong(0))
    assert(hits.toSeq == Seq(4L),
      "a positional legacy index must keep serving phrases")
    // ...and the mismatched handle must FAIL an append instead of
    // stamping _posmode=0 (which would let the next compact silently
    // drop every stored position)
    val err = intercept[IllegalArgumentException] {
      flipped.addBatch(spark, Seq((100L, "leg zz1 zz2"))
        .toDF("doc_id", "text"), 1)
    }
    assert(err.getMessage.contains("position mode is fixed"), err.getMessage)
    assert(!new java.io.File(dir, "_posmode").exists(),
      "a refused append must not stamp the marker")
    // a matching handle appends fine and re-stamps the inferred mode
    val right = new TextIndexStore(dir, numParts = 8)
    right.addBatch(spark, Seq((100L, "leg zz1 zz2")).toDF("doc_id", "text"), 1)
    val marker = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "_posmode").toPath)).trim
    assert(marker == "1", s"re-stamped marker must be positional: $marker")
    assert(right.phraseSearch(spark, Seq("zz1", "zz2")).collect()
      .map(_.getLong(0)).toSeq == Seq(100L))
  }
}
