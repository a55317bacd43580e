package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the library's custom Catalyst expressions, so
  * `spark.sql("SELECT graft_md5_long(x, 15) ...")` works alongside the
  * Column API — the (c) rung of the brief's custom-operator ladder
  * (`SparkSessionExtensions`), applied to the engine's two fused
  * kernels.
  *
  * Two entry points, same function list:
  *  - config-time: `spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `builder.withExtensions(new GraftExtensions)`), the standard
  *    library-injection route;
  *  - runtime: [[GraftFunctions.register]] on an existing session
  *    (per-session function registry, no conf needed).
  */
object GraftFunctions {

  private def md5Builder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => Md5PrefixLongExpr(c, 15)
    case Seq(c, Literal(n: Int, IntegerType)) => Md5PrefixLongExpr(c, n)
    case _ => throw new IllegalArgumentException(
      "graft_md5_long(expr[, nHex literal]) takes 1 or 2 arguments")
  }

  private def cosineBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => CosineSimilarityExpr(a, b)
    case _ => throw new IllegalArgumentException(
      "graft_cosine(array<float>, array<float>) takes 2 arguments")
  }

  /** (identifier, info, builder) triples — the exact shape both
    * `SparkSessionExtensions.injectFunction` and
    * `FunctionRegistry.registerFunction` consume.
    */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("graft_md5_long"),
      new ExpressionInfo(classOf[Md5PrefixLongExpr].getName, "graft_md5_long"),
      md5Builder _),
    (
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "graft_cosine"),
      cosineBuilder _))

  /** Register every graft function on an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  /** Install the optimizer rewrites on an existing session (idempotent). */
  def installOptimizations(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(graft.plans.Md5FusionRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.Md5FusionRule
}

/** `spark.sql.extensions` entry point: SQL functions + optimizer
  * rewrites in one injection.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.Md5FusionRule)
  }
}
