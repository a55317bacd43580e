package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
import graft.functions.Md5PrefixLongExpr

/** Optimizer rule: rewrite the composed cross-engine hash idiom
  * `CAST(conv(substring(md5(x), 1, n), 16, 10) AS BIGINT)` (n ≤ 15)
  * into the fused [[Md5PrefixLongExpr]] kernel — digest bytes → long
  * prefix in one codegen'd call, skipping the 32-char hex string and
  * the base-16 reparse.
  *
  * This is the pattern every DuckDB-replayable pipeline in this
  * library hashes with; users porting such SQL get the kernel without
  * knowing it exists. The rewrite is semantics-preserving for n ≤ 15:
  * 15 hex digits = 60 bits always fit a signed long, so the ANSI cast
  * can never overflow-throw on the composed form either
  * (`TextAnalysisSpec` pins fused ≡ composed bit-for-bit).
  *
  * Register at config time via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or at runtime with
  * `spark.experimental.extraOptimizations`.
  */
object Md5FusionRule extends Rule[LogicalPlan] {

  /** `md5(string_col)` analyzes as `Md5(Cast(string_col, BINARY))` —
    * recover the string child the kernel hashes (UTF-8 bytes either
    * way, so the digest is identical).
    */
  private def stringChild(e: Expression): Option[Expression] = e match {
    case Cast(s, BinaryType, _, _) if s.dataType.isInstanceOf[StringType] => Some(s)
    case s if s.dataType.isInstanceOf[StringType] => Some(s)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ Cast(
            Conv(
              Substring(Md5(x), Literal(1, _), Literal(n: Int, _)),
              Literal(16, _),
              Literal(10, _),
              _),
            LongType, _, _) if n >= 1 && n <= 15 =>
        stringChild(x).map(Md5PrefixLongExpr(_, n)).getOrElse(c)
    }
}
