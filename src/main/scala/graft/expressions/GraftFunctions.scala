package graft.expressions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Column + SQL surface for the engine's native expressions. */
object GraftFunctions {

  /** md5_prefix60(str) — 60-bit md5-derived hash as BIGINT. */
  def md5_prefix60(c: Column): Column =
    GraftColumnBridge.column(
      Md5Prefix60(GraftColumnBridge.expression(c.cast("string"))))

  /** minhash_agg(baseHash, k) — k affine minhashes as array<bigint>
    * in one native aggregate. */
  def minhash_agg(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())

  /** simhash_agg(baseHash) — 60-bit sign-packed simhash in one native
    * aggregate (per-bit ±1 sums in a primitive long[60] buffer). */
  def simhash_agg(c: Column): Column =
    GraftColumnBridge.column(
      SimHashAgg(GraftColumnBridge.expression(c)).toAggregateExpression())

  /** kmv_agg(hash, k) — KMV cardinality sketch: the k smallest distinct
    * hashes as an ascending array<bigint> (bounded O(k) partial state,
    * map-side combined). */
  def kmv_agg(c: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvAgg(GraftColumnBridge.expression(c), k).toAggregateExpression())

  /** count_by_key(k) — map<string,bigint> of counts per distinct
    * non-null key; built for `Dataset.observe` labeled-metric feeds
    * (bounded key cardinality, map-side combined). */
  def count_by_key(c: Column): Column =
    GraftColumnBridge.column(
      CountByKeyAgg(GraftColumnBridge.expression(c)).toAggregateExpression())

  /** token_set_count(str, words) — count of single-space-delimited
    * tokens equal to one of `words`; the codegen'd form of
    * size(filter(split(str, " "), t => t.isin(words))). */
  def token_set_count(c: Column, words: Seq[String]): Column =
    GraftColumnBridge.column(
      TokenSetCount(GraftColumnBridge.expression(c.cast("string")), words))

  /** dot_q(a, b) — exact integer dot product of two array<bigint>. */
  def dot_q(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotQ(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** hyperplane_buckets(v, seed, bands, bits) — banded sign-LSH bucket
    * ids (array<bigint>, one per band) of a quantized vector. */
  def hyperplane_buckets(v: Column, seed: Long, bands: Int, bits: Int): Column =
    GraftColumnBridge.column(
      HyperplaneBuckets(GraftColumnBridge.expression(v), seed, bands, bits))

  /** quantize8(v) — per-vector symmetric int8 quantization of an
    * array<float> embedding (array<bigint> in [-127, 127]). */
  def quantize8(v: Column): Column =
    GraftColumnBridge.column(Quantize8(GraftColumnBridge.expression(v)))

  /** quantize_milli(v, scale) — fixed-scale integer quantization of an
    * array<float> embedding; the codegen'd form of
    * transform(v, x => round(x * scale).cast("bigint")). */
  def quantize_milli(v: Column, scale: Int): Column =
    GraftColumnBridge.column(
      QuantizeMilli(GraftColumnBridge.expression(v), scale))

  /** min_shingle_md5(text, n) — minimum md5 hex over the word n-gram
    * shingles; the codegen'd form of
    * array_min(transform(shingles(text, n), sh => md5(sh))). */
  def min_shingle_md5(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      MinShingleMd5(GraftColumnBridge.expression(text.cast("string")), n))

  /** cdc_to_sql(eventStruct, dialect) — render a CDC envelope struct to
    * destination SQL (null for non-DML). */
  def cdc_to_sql(event: Column, dialect: String): Column =
    GraftColumnBridge.column(
      CdcToSql(GraftColumnBridge.expression(event), dialect))

  private[expressions] def cdcToSqlFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
    val dialect = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(s, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"cdc_to_sql dialect must be a string literal, got $other")
    }
    CdcToSql(exprs.head, dialect)
  }

  private def litLong(
      e: org.apache.spark.sql.catalyst.expressions.Expression, what: String): Long =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
        v.longValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }

  private[expressions] def hyperplaneBucketsFromExprs(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
    HyperplaneBuckets(exprs.head,
      litLong(exprs(1), "seed"),
      litLong(exprs(2), "bands").toInt,
      litLong(exprs(3), "bitsPerBand").toInt)

  /** Register SQL names on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "md5_prefix60", exprs => Md5Prefix60(exprs.head), "built-in")
    // aggregates register like any expression — the analyzer wraps the
    // AggregateFunction in an AggregateExpression at resolution
    reg.createOrReplaceTempFunction(
      "minhash_agg",
      exprs => MinHashAgg(exprs.head, litLong(exprs(1), "k").toInt), "built-in")
    reg.createOrReplaceTempFunction(
      "kmv_agg",
      exprs => KmvAgg(exprs.head, litLong(exprs(1), "k").toInt), "built-in")
    reg.createOrReplaceTempFunction(
      "cdc_to_sql", cdcToSqlFromExprs, "built-in")
    reg.createOrReplaceTempFunction(
      "dot_q", exprs => DotQ(exprs.head, exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "hyperplane_buckets", hyperplaneBucketsFromExprs, "built-in")
    reg.createOrReplaceTempFunction(
      "quantize8", exprs => Quantize8(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "quantize_milli",
      exprs => QuantizeMilli(exprs.head, litLong(exprs(1), "scale").toInt),
      "built-in")
  }
}

/** SparkSessionExtensions entry point:
  * .config("spark.sql.extensions", "graft.expressions.GraftExtensions") */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      new ExpressionInfo(classOf[Md5Prefix60].getName, "md5_prefix60"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Md5Prefix60(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("cdc_to_sql"),
      new ExpressionInfo(classOf[CdcToSql].getName, "cdc_to_sql"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.cdcToSqlFromExprs(exprs)))
    e.injectFunction((
      FunctionIdentifier("dot_q"),
      new ExpressionInfo(classOf[DotQ].getName, "dot_q"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotQ(exprs.head, exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.hyperplaneBucketsFromExprs(exprs)))
    e.injectFunction((
      FunctionIdentifier("quantize8"),
      new ExpressionInfo(classOf[Quantize8].getName, "quantize8"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Quantize8(exprs.head)))
  }
}
