package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the top 60 bits of md5(input) as a
  * BIGINT — semantically identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` but one pass with codegen,
  * no hex-string round trip. This is the base hash under minhash and
  * simhash (graft.llmops), where it runs once per shingle/token —
  * the hottest scalar in the engine.
  *
  * 60 bits (15 hex chars) keeps the value comfortably in signed-long
  * range so the SQL-parity oracle can use the same arithmetic.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {

  // input must be STRING; the Column/SQL wrappers cast explicitly
  // (AbstractDataType is private[sql] in Spark 4, so no
  // ImplicitCastInputTypes here)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.typeName == "string")
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  protected override def nullSafeEval(input: Any): Any =
    HashUtils.md5Prefix60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashUtils.md5Prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object HashUtils {
  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of the md5 digest, big-endian — equals parsing the
    * first 15 hex chars of the hex digest. */
  def md5Prefix60(s: UTF8String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
