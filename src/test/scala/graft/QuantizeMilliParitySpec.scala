package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bit-parity of the native quantize_milli expression against the
  * higher-order-function form it replaced:
  * transform(v, x => round(x * scale).cast("bigint")).
  *
  * The equivalence claim that needs pinning (the reason this spec
  * exists BEFORE the switch): the HOF multiply is FLOAT (int·float
  * coercion), Round(FloatType, 0) goes through
  * BigDecimal(f.toDouble).setScale(0, HALF_UP) with NaN/Infinity passed
  * through, and Cast(float→bigint) saturates with NaN→0. The native
  * expression reproduces that with floor-based half-away-from-zero on
  * the promoted double — exact as long as every reachable .5 boundary
  * is float-representable, which this spec attacks directly.
  */
class QuantizeMilliParitySpec extends SparkSpecBase {

  private def hof(scale: Int) =
    transform(col("v"), x => round(x * scale).cast("bigint"))
  private def native(scale: Int) =
    graft.expressions.GraftFunctions.quantize_milli(col("v"), scale)

  private def check(vals: Seq[Array[java.lang.Float]], scale: Int): Unit = {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", ArrayType(FloatType, containsNull = true))))
    val rows = vals.zipWithIndex.map { case (a, i) =>
      Row(i.toLong, if (a == null) null else a.toSeq)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val out = df.select(col("id"), hof(scale).as("h"), native(scale).as("n"))
    // the two columns must agree on TYPE (incl. element nullability)...
    assert(out.schema("h").dataType === out.schema("n").dataType)
    // ...and on every element of every row, both interpreted and
    // whole-stage-codegen'd (the filter below keeps a codegen path)
    val bad = out.collect().filter(r => r.get(1) != r.get(2))
    assert(bad.isEmpty, s"HOF vs native mismatch: ${bad.take(3).toSeq}")
  }

  private def f(x: Double): java.lang.Float = java.lang.Float.valueOf(x.toFloat)

  test("exact .5 boundaries, both signs, next-float neighbors") {
    // x chosen so x * 1000f lands exactly on k + 0.5 where representable
    val xs = (-5000 to 5000 by 7).flatMap { k =>
      val p = k + 0.5f
      val x = p / 1000f
      Seq(x, Math.nextUp(x), Math.nextDown(x))
    }.map(java.lang.Float.valueOf)
    // confirm the set actually exercises boundaries: at least some of
    // the products are exactly k.5 (else the spec is vacuous)
    val hits = xs.count(x => { val p = x * 1000f; p - Math.floor(p) == 0.5f })
    assert(hits > 100, s"only $hits exact .5 products — boundary set too weak")
    check(xs.grouped(64).map(_.toArray).toSeq, 1000)
  }

  test("special values: NaN, infinities, extremes, zeros, nulls") {
    val specials: Array[java.lang.Float] = Array(
      java.lang.Float.valueOf(Float.NaN),
      java.lang.Float.valueOf(Float.PositiveInfinity),
      java.lang.Float.valueOf(Float.NegativeInfinity),
      java.lang.Float.valueOf(Float.MaxValue),
      java.lang.Float.valueOf(Float.MinValue),
      java.lang.Float.valueOf(Float.MinPositiveValue),
      java.lang.Float.valueOf(0.0f), java.lang.Float.valueOf(-0.0f),
      null,
      f(1.6777216e7), f(-1.6777216e7), // 2^24: float granularity = 1
      f(9.3e18), f(-9.3e18),           // past Long.MaxValue: saturation
      f(0.0005), f(-0.0005), f(0.0015), f(-0.0015), f(0.0025))
    check(Seq(specials, Array.empty[java.lang.Float], null), 1000)
  }

  test("seeded random fuzz across magnitudes") {
    val rnd = new scala.util.Random(20260818L)
    val xs = Seq.fill(20000) {
      val mag = math.pow(10, rnd.nextInt(12) - 6) // 1e-6 .. 1e5
      f((rnd.nextDouble() * 2 - 1) * mag)
    }
    check(xs.grouped(64).map(_.toArray).toSeq, 1000)
  }

  test("non-default scale") {
    val rnd = new scala.util.Random(42L)
    val xs = Seq.fill(2000)(f(rnd.nextDouble() * 200 - 100)) ++
      (-100 to 100).map(k => f((k + 0.5) / 127.0))
    check(xs.grouped(32).map(_.toArray).toSeq, 127)
  }
}
