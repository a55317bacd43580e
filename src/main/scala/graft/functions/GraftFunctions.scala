package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StringType}

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

  /** Signed-zero-pinned rounding — THE library-wide way to round a
    * floating output column (VERDICT r18 #3, after the bare-round
    * signed-zero bug was re-found five times): Spark's HALF_UP
    * `round` of a tiny negative value (e.g. −1e-9 at scale 4) yields
    * **−0.0**, which hashes/prints differently from the +0.0 most SQL
    * engines (and this repo's DuckDB oracle) produce for the same
    * input. `+ 0.0` is the IEEE-754 canonicalizer: it is bit-identity
    * for EVERY double except −0.0 (−0.0 + 0.0 = +0.0), costs one
    * codegen'd add, and never changes magnitude or rounding. Bare
    * `round(` in Column code is now rejected by RoundPinSpec's static
    * scan (oracle SQL strings keep plain `round` — DuckDB's round
    * already canonicalizes, and `+ 0e0` is added there only where a
    * query proved it needs it).
    */
  def roundPinned(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.round(c, scale) + org.apache.spark.sql.functions.lit(0.0)

  /** Single-arg form (scale 0) — used by the quantize-to-long paths,
    * where the pin is a no-op after the integral cast but keeps the
    * scan rule uniform: no bare `round(` anywhere in Column code.
    */
  def roundPinned(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.round(c) + org.apache.spark.sql.functions.lit(0.0)

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

  /** `graft_matvec_dots(vec, matrix)` — the matrix argument must be a
    * FOLDABLE array<array<numeric>> (e.g. `array(array(1.0, 0.0), ...)`):
    * [[MatVecDotsExpr]] ships the matrix to executors as one constant
    * flat double[] reference object, so it is evaluated once at
    * registration-builder time (cast through array<array<double>> to
    * accept decimal/float literals), never per row.
    */
  private def matVecBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(vec, m) if m.foldable =>
      val data = Cast(m, ArrayType(ArrayType(DoubleType)))
        .eval().asInstanceOf[ArrayData]
      require(data != null && data.numElements() > 0,
        "graft_matvec_dots matrix must be a non-null, non-empty array literal")
      val matrix = Array.tabulate(data.numElements()) { i =>
        val row = data.getArray(i)
        require(row != null, s"graft_matvec_dots matrix row $i is null")
        // toDoubleArray on a row with a null element throws a bare NPE;
        // name the offending position instead.
        var j = 0
        while (j < row.numElements()) {
          require(!row.isNullAt(j),
            s"graft_matvec_dots matrix element [$i][$j] is null; " +
              "the matrix literal must be fully non-null")
          j += 1
        }
        row.toDoubleArray()
      }
      MatVecDotsExpr(vec, matrix)
    case Seq(_, _) => throw new IllegalArgumentException(
      "graft_matvec_dots(array<float>, matrix) requires a foldable matrix literal")
    case _ => throw new IllegalArgumentException(
      "graft_matvec_dots(array<float>, array<array<double>>) takes 2 arguments")
  }

  /** `graft_bloom_might_contain(hash, filter)` — the filter argument
    * must be a FOLDABLE base64 STRING literal of the standard
    * serialized [[org.apache.spark.util.sketch.BloomFilter]] form
    * ([[BloomMightContainExpr.serialize]] produces it). It is decoded
    * once at registration-builder time and ships to executors as a
    * plan reference object, never per row — the same literal-binding
    * story as graft_matvec_dots' foldable matrix.
    */
  private def bloomBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(hash, b64) if b64.foldable && b64.dataType == StringType =>
      val lit = b64.eval()
      require(lit != null,
        "graft_bloom_might_contain filter literal must be non-null")
      val bloom =
        try BloomMightContainExpr.deserialize(lit.toString)
        catch {
          case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
            "graft_bloom_might_contain filter literal is not a base64 " +
              s"serialized BloomFilter: ${e.getMessage}", e)
        }
      BloomMightContainExpr(hash, bloom)
    case Seq(_, _) => throw new IllegalArgumentException(
      "graft_bloom_might_contain(hash BIGINT, filter) requires a foldable " +
        "base64 STRING literal filter (BloomMightContainExpr.serialize)")
    case _ => throw new IllegalArgumentException(
      "graft_bloom_might_contain(hash BIGINT, filter VARCHAR) takes 2 arguments")
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
      cosineBuilder _),
    (
      FunctionIdentifier("graft_matvec_dots"),
      new ExpressionInfo(classOf[MatVecDotsExpr].getName, "graft_matvec_dots"),
      matVecBuilder _),
    (
      FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContainExpr].getName, "graft_bloom_might_contain"),
      bloomBuilder _))

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
