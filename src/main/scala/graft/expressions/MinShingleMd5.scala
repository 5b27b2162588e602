package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of `array_min(transform(shingles(text, n), sh => md5(sh)))`
  * (TextOps.minShingleFingerprint): the minimum md5 hex over a document's
  * word n-gram shingles, or null when the doc has fewer than n tokens.
  *
  * The HOF form is CodegenFallback twice over — `shingles` builds its
  * array through an interpreted transform-lambda per row, then the md5
  * transform runs interpreted per ELEMENT — which made llm_fingerprint
  * a ~10 s single-scan query at sf0.1. This is one codegen'd pass that
  * never materializes a shingle string: tokens are the single-space-
  * separated segments of the UTF-8 bytes (split(text, " ") semantics,
  * empty segments included), and the shingle `tok(i) ++ " " ++ … ++
  * tok(i+n-1)` is byte-for-byte the original span from tok(i)'s start to
  * tok(i+n-1)'s end, so each md5 runs over a slice of the input buffer.
  * Digests compare as unsigned bytes, which orders exactly like their
  * lowercase-hex strings (the nibble→hex map is monotone); only the
  * winner is hex-encoded. min(multiset) == min(set), so the HOF's
  * array_distinct is immaterial to the result.
  */
case class MinShingleMd5(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_shingle_md5 requires a string input, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_md5"

  protected override def nullSafeEval(input: Any): Any =
    MinShingleMd5.eval(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ev.value
    nullSafeCodeGen(ctx, ev, c => s"""
      $out = graft.expressions.MinShingleMd5.eval($c, $n);
      ${ev.isNull} = ($out == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinShingleMd5 =
    copy(child = newChild)
}

object MinShingleMd5 {

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Null when the text has fewer than n single-space-separated tokens
    * (split(text, " ") keeps empty segments, so #tokens = #spaces + 1). */
  def eval(text: UTF8String, n: Int): UTF8String = {
    val bytes = text.getBytes
    val len = bytes.length
    // token k starts after space k-1 and ends before space k
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) spaces += 1; i += 1 }
    val tokens = spaces + 1
    if (tokens < n) return null
    // starts(k) = byte offset of token k; ends(k) = exclusive end
    val starts = new Array[Int](tokens)
    val ends = new Array[Int](tokens)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) {
        ends(t) = i; t += 1; starts(t) = i + 1
      }
      i += 1
    }
    ends(t) = len
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var k = 0
    val last = tokens - n
    while (k <= last) {
      md.reset()
      md.update(bytes, starts(k), ends(k + n - 1) - starts(k))
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      k += 1
    }
    UTF8String.fromString(hex(best))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
