package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the number of single-space-delimited
  * tokens of `child` equal to one of `words` — semantically identical
  * to `size(filter(split(text, " "), t => t.isin(words)))`, but one
  * zero-allocation byte pass with codegen. The higher-order filter
  * form is CodegenFallback: the lambda is interpreted per TOKEN per
  * row, which made the stopword-ratio gate the dominant per-row cost
  * of the curation pipeline (guide §4: keep the hot path inside
  * whole-stage codegen).
  *
  * Boundary semantics mirror `split(text, " ")` exactly: tokens are
  * maximal runs between single spaces (empty tokens between adjacent
  * spaces match nothing), and the leading/trailing token counts.
  */
case class TokenSetCount(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.typeName == "string")
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"token_set_count requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_set_count"

  @transient private lazy val wordBytes: Array[Array[Byte]] =
    words.map(_.getBytes("UTF-8")).toArray

  protected override def nullSafeEval(input: Any): Any =
    TokenSetCount.count(input.asInstanceOf[UTF8String], wordBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wordsRef = ctx.addReferenceObj("tscWords", wordBytes, "byte[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.TokenSetCount.count($c, $wordsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenSetCount =
    copy(child = newChild)
}

object TokenSetCount {
  /** Single pass over the UTF-8 bytes; a token matches when its byte
    * span equals one of the word byte arrays. The word list is tiny
    * (stopword sets), so a direct length-guarded comparison beats a
    * hash set — no per-token allocation either way. */
  def count(s: UTF8String, words: Array[Array[Byte]]): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val len = i - start
        if (len > 0) {
          var w = 0
          var matched = false
          while (w < words.length && !matched) {
            val wb = words(w)
            if (wb.length == len) {
              var j = 0
              var ok = true
              while (j < len && ok) {
                if (wb(j) != bytes(start + j)) ok = false
                j += 1
              }
              matched = ok
            }
            w += 1
          }
          if (matched) cnt += 1
        }
        start = i + 1
      }
      i += 1
    }
    cnt
  }
}
