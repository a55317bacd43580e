package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a 64-bit hash against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]], as a codegen'd
  * expression — the UDF-free way to push a "can this row possibly
  * match?" test into a scan/projection. The filter ships to executors
  * once as a plan reference object (same pattern as
  * [[MatVecDotsExpr]]'s constant matrix), so codegen stays tiny no
  * matter the filter size and the probe is a branch-free bit test per
  * row.
  *
  * False positives only (per Bloom contract): a `true` means "maybe",
  * so downstream must re-verify exactly; a `false` is definitive, so
  * filtering on the probe never drops a real match.
  */
case class BloomMightContainExpr(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  // Keep equals/hashCode consistent whatever BloomFilter's own
  // equality is (the sketch impl may or may not override equals, and
  // does not pair it with hashCode): delegate equality to the filter,
  // hash only what equality implies — same pattern and reason as
  // MatVecDotsExpr's value-based identity.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContainExpr => child == b.child && bloom == b.bloom
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.lang.Long.hashCode(bloom.bitSize())

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects BIGINT input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomMightContainExpr {
  def mightContain(hash: Column, bloom: BloomFilter): Column =
    GraftExpressionBridge.column(
      BloomMightContainExpr(GraftExpressionBridge.expression(hash), bloom))

  /** Base64 of the filter's standard serialized form — the literal
    * binding that lets SQL text carry a driver-built Bloom filter:
    * `graft_bloom_might_contain(hash, '<serialize(bloom)>')`. A
    * million-key filter at fpp 0.01 is ~1.6 MB base64 — large for SQL
    * text but well under plan-size limits; prefer the Column API when
    * not constrained to SQL strings.
    */
  def serialize(bloom: BloomFilter): String = {
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  /** Inverse of [[serialize]]. */
  def deserialize(b64: String): BloomFilter =
    BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(java.util.Base64.getDecoder.decode(b64)))
}
