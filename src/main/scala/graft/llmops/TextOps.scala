package graft.llmops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the dedup/analysis operators
  * and the oracle-checked query layer (graft.queries.LlmQueries).
  * Everything is built from codegen'd built-ins — no UDFs — so these
  * stay inside WholeStageCodegen at any scale.
  */
object TextOps {

  /** Whitespace word tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Lowercased, whitespace-collapsed canonical form. */
  def normalized(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** md5 of the canonical form — the exact-dedup key. */
  def contentHash(text: Column): Column = md5(normalized(text))

  /** Distinct word n-gram shingles (empty below n tokens). */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", (1 to n).map(j => element_at(t, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exploded (id, shingle) rows — the bulk-path shingle producer.
    *
    * Shape: posexplode the token array and build each shingle with
    * codegen'd element_at — measured 3.8× faster than exploding the
    * `shingles` array column, whose higher-order-function construction
    * is interpreted row-by-row (sf0.1: 0.92 s vs 3.46 s), and shuffle-
    * free unlike a lead()-window formulation. `dedup=false` skips the
    * per-doc distinct (an extra shuffle) for consumers like minhash
    * where min(multiset) == min(set). */
  def shingleRows(df: DataFrame, n: Int = 3, idCol: String = "doc_id",
                  textCol: String = "text", dedup: Boolean = true): DataFrame = {
    val base = df
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .select(col(idCol), col("__t"), posexplode(col("__t")))
      .filter(col("pos") <= size(col("__t")) - n)
    val parts = col("col") +: (2 to n).map(j => element_at(col("__t"), col("pos") + j))
    val rows = base.select(col(idCol), concat_ws(" ", parts: _*).as("shingle"))
    if (dedup) rows.distinct() else rows
  }

  /** BPE-ish regex token count: runs of letters, digits, or single
    * non-space symbols. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|\\S"), lit(0)))

  /** Token count of the whitespace tokenization WITHOUT materializing
    * the token array: split-by-single-space yields (#spaces + 1) parts
    * (empties kept), so the count is a replace + two length scans —
    * all codegen'd, no per-row array allocation. ≡ size(tokens(text)). */
  def tokenCount(text: Column): Column =
    length(text) - length(replace(text, lit(" "), lit(""))) + 1

  /** Count of whitespace tokens equal to one of `words` — the native
    * codegen'd form of size(filter(tokens(text), t => t.isin(words))),
    * whose higher-order filter is CodegenFallback (interpreted per
    * token per row). */
  def stopTokenCount(text: Column, words: Seq[String]): Column =
    graft.expressions.GraftFunctions.token_set_count(text, words)

  /** Count non-overlapping occurrences of a literal marker. The
    * replace + length form scans the text without allocating the split
    * array; left-to-right non-overlapping consumption is identical to
    * `size(split(text, quote(marker))) - 1`. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) /
      lit(marker.length)).cast("int")

  /** Marker-vocabulary language scores; deterministic priority argmax.
    * langs maps code → padded stopword markers (" the "). */
  def languageScores(text: Column, langs: Seq[(String, Seq[String])]): Seq[(String, Column)] =
    langs.map { case (code, markers) =>
      code -> markers.map(m => occurrences(text, m)).reduce(_ + _)
    }

  def languagePredict(scores: Seq[(String, Column)]): Column =
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((code, s), i), acc) =>
        val rest = scores.drop(i + 1).map(_._2)
        if (rest.isEmpty) acc
        else when(rest.map(r => s >= r).reduce(_ && _), code).otherwise(acc)
    }

  /** 60-bit token hash (md5 prefix) — the minhash/simhash base hash;
    * 60 bits keeps the value in signed-long range for SQL parity.
    * Native codegen'd expression (graft.expressions.Md5Prefix60),
    * semantically = conv(substring(md5(x),1,15),16,10). */
  def tokenHash60(tok: Column): Column =
    graft.expressions.GraftFunctions.md5_prefix60(tok)

  /** Rolling-window min-hash fingerprint over shingles
    * (winnowing-lite): min(md5(shingle)). */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    // native codegen'd expression — the HOF form
    // array_min(transform(shingles(text, n), sh => md5(sh))) is
    // interpreted twice over (the shingles construction AND the md5
    // map), ~10 s for a single llm_fingerprint scan at sf0.1; parity
    // (incl. empty-token and <n-token docs) pinned in LlmOpsSpec
    graft.expressions.GraftFunctions.min_shingle_md5(text, n)

  /** PII patterns — RE2-compatible subset (no backrefs/lookarounds) so
    * the same patterns run under Spark (java.util.regex) and DuckDB. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** Redact emails, IPv4s, then phone-shaped numbers (order matters:
    * an IPv4 must not be half-eaten by the phone pattern). Pure
    * codegen'd regexp_replace chain — linear scan per doc. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** (emails, ips, phones) found — the audit counts for a scrub pass. */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))),
      size(regexp_extract_all(afterEmail, lit(Ipv4Re), lit(0))),
      size(regexp_extract_all(afterIp, lit(PhoneRe), lit(0))))
  }
}
