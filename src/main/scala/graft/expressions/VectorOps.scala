package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two `array<bigint>` columns.
  *
  * Replaces `aggregate(zip_with(a, b, _*_), 0L, _+_)`: higher-order
  * functions are interpreted (no codegen), which made the dot product
  * the hot cost of every embedding-similarity query. This is one
  * codegen'd call per row that stays inside WholeStageCodegen.
  *
  * Numeric contract matches the HOF form exactly: plain long
  * multiply-add over milli-quantized values (|v_i| ~ 5e3, 64 dims →
  * |dot| ~ 1.6e9, far inside long range).
  */
case class DotQ(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_q requires two array<bigint> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "dot_q"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorOpsUtil.dotQ(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorOpsUtil.dotQ($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotQ =
    copy(left = newLeft, right = newRight)
}

/** Banded random-hyperplane LSH buckets for a quantized embedding.
  *
  * Emits `bands` bucket ids; bucket `t` packs the sign bits of
  * `bitsPerBand` hyperplane dot products (planes `t*bitsPerBand ..`)
  * into a long. Hyperplanes are Rademacher (±1) vectors derived
  * deterministically from `seed` via a splitmix64 mix, so the exact
  * same planes are reproducible as SQL literals for the DuckDB oracle
  * (see [[Hyperplanes.coeffSqlList]]).
  *
  * Sign-random-projection LSH: P[sign match] = 1 - angle/pi, so two
  * vectors share a whole band with probability (1 - θ/π)^bits —
  * banding across `bands` independent tables recovers recall that a
  * single bucket table loses at hyperplane boundaries. ±1 entries make
  * the dot exact integer math (|dot| ≤ dim·5e3, inside long range).
  */
case class HyperplaneBuckets(child: Expression, seed: Long, bands: Int,
                             bitsPerBand: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hyperplane_buckets requires array<bigint> input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  protected override def nullSafeEval(input: Any): Any =
    VectorOpsUtil.hyperplaneBuckets(
      input.asInstanceOf[ArrayData], seed, bands, bitsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.VectorOpsUtil.hyperplaneBuckets($c, ${seed}L, $bands, $bitsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** Per-vector symmetric int8 quantization of an `array<float>` embedding:
  * `q_i = round(x_i * 127 / max|x|)`, the 4-bytes/dim → 1 compression of
  * a serving ANN index. One codegen'd pass per row (max-abs scan + scale)
  * — a higher-order-function formulation re-evaluates the interpreted
  * `array_max` lambda per ELEMENT, O(dim²) per row.
  *
  * Rounding is half-away-from-zero, bit-matching DuckDB/C `round()` for
  * the oracle (`java.lang.Math.round` half-up would differ on negative
  * .5 boundaries). An all-zero vector quantizes to zeros.
  */
case class Quantize8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize8 requires array<float> input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize8"

  protected override def nullSafeEval(input: Any): Any =
    VectorOpsUtil.quantize8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.VectorOpsUtil.quantize8($c)")

  override protected def withNewChildInternal(newChild: Expression): Quantize8 =
    copy(child = newChild)
}

/** Native milli-quantization of an `array<float>` embedding:
  * `q_i = cast(round(x_i * scale) as bigint)` — the codegen'd form of
  * `transform(v, x => round(x * scale).cast("bigint"))`, whose
  * ArrayTransform higher-order function is CodegenFallback (interpreted
  * per element per row, with a scala BigDecimal allocated per element by
  * Round). It sits under EVERY ANN query and both embedding stores.
  *
  * Bit parity with the HOF form (QuantizeMilliParitySpec pins it on the
  * .5 boundaries): the multiply is FLOAT (Spark coerces int·float to
  * float), Round(FloatType, 0) is BigDecimal(f.toDouble).setScale(0,
  * HALF_UP).toFloat with NaN/Infinity passed through (verified against
  * spark-catalyst 4.1.2's RoundBase), and Cast(float → bigint) is the
  * saturating toLong with NaN → 0. HALF_UP on a non-negative scale-0
  * BigDecimal is half-away-from-zero; every x.5 this can see is exactly
  * representable (|p| < 2^24 has exact .5 floats, |p| ≥ 2^24 floats are
  * integral), so floor-based half-away-from-zero on the promoted double
  * reproduces the BigDecimal path exactly, without the allocation.
  * Null elements stay null (transform's lambda yields null). */
case class QuantizeMilli(child: Expression, scale: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"quantize_milli requires array<float> input, got ${other.catalogString}")
    }

  // element nullability mirrors the HOF form: round(cast(...)) of a
  // nullable element is nullable, of a non-nullable element is not
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(LongType, containsNull = cn)
    case other => other
  }
  override def prettyName: String = "quantize_milli"

  protected override def nullSafeEval(input: Any): Any =
    VectorOpsUtil.quantizeMilli(input.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.VectorOpsUtil.quantizeMilli($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeMilli =
    copy(child = newChild)
}

object VectorOpsUtil {

  def quantizeMilli(v: ArrayData, scale: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    val scaleF = scale.toFloat
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val p = v.getFloat(i) * scaleF // float multiply, like the coerced HOF
        out(i) =
          if (java.lang.Float.isNaN(p)) 0L // round keeps NaN; cast → 0
          else {
            val d = p.toDouble // exact promotion
            val ad = Math.abs(d)
            val fl = Math.floor(ad)
            // half away from zero; for ±Infinity (NaN - Inf >= .5 is
            // false) this falls through to fl = ±Inf and toLong
            // saturates exactly like Cast(float → bigint)
            val r = if (ad - fl >= 0.5d) fl + 1.0d else fl
            (if (d < 0) -r else r).toLong
          }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def quantize8(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var mx = 0f
    var i = 0
    while (i < n) {
      val a = Math.abs(v.getFloat(i)); if (a > mx) mx = a; i += 1
    }
    val out = new Array[Long](n)
    if (mx > 0f) {
      // float→double promotion then one double multiply — the same IEEE
      // op sequence as the oracle's `x * (127.0 / list_max(...))`
      val scale = 127.0d / mx
      i = 0
      while (i < n) {
        val x = v.getFloat(i) * scale
        // half away from zero, exactly (no `floor(x+0.5)` ulp hazard)
        val ax = Math.abs(x)
        val fl = Math.floor(ax)
        val m = fl.toLong + (if (ax - fl >= 0.5d) 1L else 0L)
        out(i) = if (x < 0) -m else m
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  def dotQ(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Coefficient matrices are tiny (bands·bits·dim ints) and reused for
    * every row — cache per (seed, planes, dim). */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Int]]]()

  def hyperplaneBuckets(v: ArrayData, seed: Long, bands: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val planes = bands * bits
    val coeffs = coeffCache.computeIfAbsent((seed, planes, dim),
      _ => Array.tabulate(planes)(p => Hyperplanes.planeCoeffs(seed, p, dim)))
    val out = new Array[Long](bands)
    var t = 0
    while (t < bands) {
      var bucket = 0L
      var bit = 0
      while (bit < bits) {
        val c = coeffs(t * bits + bit)
        var dot = 0L
        var i = 0
        while (i < dim) { dot += c(i) * v.getLong(i); i += 1 }
        if (dot > 0) bucket |= (1L << bit)
        bit += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Deterministic Rademacher hyperplane family shared by the Spark
  * expression and the DuckDB oracle-SQL generator. */
object Hyperplanes {

  /** splitmix64 finalizer — a well-mixed 64-bit hash of its input. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Coefficient i of plane p: ±1 from the mixed bit sign. */
  def coeff(seed: Long, plane: Int, i: Int): Int =
    if (mix(seed + plane.toLong * 1000003L + i) < 0) -1 else 1

  def planeCoeffs(seed: Long, plane: Int, dim: Int): Array[Int] =
    Array.tabulate(dim)(i => coeff(seed, plane, i))

  /** The plane as a DuckDB BIGINT[] literal, e.g. `[1,-1,1,...]`. */
  def coeffSqlList(seed: Long, plane: Int, dim: Int): String =
    planeCoeffs(seed, plane, dim).mkString("[", ",", "]")

  /** DuckDB expression for one band's bucket id over column `qe`. */
  def bucketSql(seed: Long, band: Int, bitsPerBand: Int, dim: Int): String =
    (0 until bitsPerBand).map { bit =>
      val plane = band * bitsPerBand + bit
      s"(CASE WHEN list_dot_product(qe::BIGINT[], " +
        s"${coeffSqlList(seed, plane, dim)}::BIGINT[]) > 0 " +
        s"THEN ${1L << bit} ELSE 0 END)"
    }.mkString("(", " + ", ")::BIGINT")
}
