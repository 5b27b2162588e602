package graft

import graft.llmops.TextOps
import org.apache.spark.sql.functions._

/** Parity of the native min_shingle_md5 expression against the HOF form
  * it replaced: array_min(transform(shingles(text, n), sh => md5(sh))).
  * Attacks the tokenization corners the byte-slice rewrite relies on:
  * split(text, " ") keeps empty segments (consecutive / leading /
  * trailing spaces), <n-token docs yield null, and multi-byte UTF-8
  * never aliases the 0x20 separator. */
class MinShingleMd5ParitySpec extends SparkSpecBase {

  private def hof(n: Int) =
    array_min(transform(TextOps.shingles(col("text"), n), sh => md5(sh)))

  test("native min-shingle md5 equals the HOF form on corner docs") {
    import spark.implicits._
    val docs = Seq(
      "plain three token doc with several words",
      "a b c", "a b", "a", "", " ", "  ", "a  b  c", " a b c ",
      "a b c d e f g h", "same same same same",
      "unicode éé tøkens 中文 here",
      "tab\tis not a separator b c",
      "x " * 500 + "y",
      null.asInstanceOf[String]
    ).toDF("text")
    for (n <- Seq(1, 2, 3, 5)) {
      val out = docs.select(
        hof(n).as("h"), TextOps.minShingleFingerprint(col("text"), n).as("m"))
      assert(out.schema("h").dataType === out.schema("m").dataType)
      val bad = out.collect().filter(r => r.get(0) != r.get(1))
      assert(bad.isEmpty, s"n=$n mismatch: ${bad.take(3).toSeq}")
    }
  }

  test("native min-shingle md5 equals the HOF form on random docs") {
    import spark.implicits._
    val rnd = new scala.util.Random(16L)
    val words = Vector("alpha", "beta", "g", "", "dd", "ü", "zz9")
    val docs = Seq.fill(500)(
      Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(words.size)))
        .mkString(" ")).toDF("text")
    val out = docs.select(
      hof(3).as("h"), TextOps.minShingleFingerprint(col("text")).as("m"))
    val bad = out.collect().filter(r => r.get(0) != r.get(1))
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).toSeq}")
  }
}
