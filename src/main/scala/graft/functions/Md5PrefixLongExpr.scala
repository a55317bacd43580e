package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(x), 1, nHex), 16, 10)` fused into one codegen'd
  * expression returning the long directly from the digest bytes — the
  * cross-engine hash of [[graft.ops.TextAnalysis.h64]]/`baseHash`
  * without materializing the 32-char hex string or running `conv`'s
  * arbitrary-base string parse per value. Bit-identical to the
  * composed form (and to the DuckDB
  * `('0x' || substr(md5(x), 1, nHex))::BIGINT` oracle formula): the
  * first `nHex` hex characters of an md5 digest are its first
  * `nHex / 2` bytes read big-endian, nibble by nibble.
  *
  * `nHex` ≤ 15 keeps the value in 60 bits — always non-negative,
  * always a valid signed long in any engine.
  */
case class Md5PrefixLongExpr(child: Expression, nHex: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if nHex >= 1 && nHex <= 15 => TypeCheckResult.TypeCheckSuccess
    case StringType =>
      TypeCheckResult.TypeCheckFailure(s"nHex must be in [1, 15], got $nHex")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"md5_prefix_long expects a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Md5PrefixLongExpr.hashPrefix(input.asInstanceOf[UTF8String], nHex)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      s"${ev.value} = graft.functions.Md5PrefixLongExpr.hashPrefix($in, $nHex);"
    })

  override protected def withNewChildInternal(newChild: Expression): Md5PrefixLongExpr =
    copy(child = newChild)
}

object Md5PrefixLongExpr {

  // MessageDigest is stateful; one instance per thread, reset per use.
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** First `nHex` hex chars of md5(bytes) as a long (big-endian nibbles). */
  def hashPrefix(s: UTF8String, nHex: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < nHex) {
      val b = d(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      acc = (acc << 4) | nibble
      i += 1
    }
    acc
  }

  /** Driver-side twin of [[hashPrefix]] for deterministic constants
    * (e.g. LSH hyperplane components) that an external SQL oracle
    * re-derives from the same md5 formula.
    */
  def hashPrefix(s: String, nHex: Int): Long =
    hashPrefix(UTF8String.fromString(s), nHex)

  def md5PrefixLong(c: Column, nHex: Int): Column =
    GraftExpressionBridge.column(
      Md5PrefixLongExpr(GraftExpressionBridge.expression(c), nHex))
}
