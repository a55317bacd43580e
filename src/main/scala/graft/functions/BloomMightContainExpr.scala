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
}
