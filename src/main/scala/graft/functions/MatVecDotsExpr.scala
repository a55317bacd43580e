package graft.functions

import org.apache.spark.sql.{Column, GraftExpressionBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot products of one `array<float>` vector against a constant
  * matrix of row vectors, as a single codegen'd loop returning
  * `array<double>` — the kernel behind LSH hyperplane signatures and
  * IVF centroid assignment. The composed alternative (one
  * `aggregate(zip_with(...))` fold per matrix row) evaluates `rows`
  * separate higher-order-function trees and allocates an intermediate
  * array per row per input — measured as the dominant cost of the ANN
  * queries.
  *
  * The matrix ships to executors as one flat `double[]` reference
  * object (rows × dim), not as literal expressions, so codegen stays
  * tiny no matter the matrix size. Accumulation per row is
  * left-to-right over the vector — same order as
  * [[graft.ops.Similarity.dot]], so downstream sign/argmax decisions
  * are unchanged.
  */
case class MatVecDotsExpr(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  private val rows = matrix.length
  private val dim = if (rows == 0) 0 else matrix(0).length
  @transient private lazy val flat: Array[Double] = matrix.flatten

  // Case-class equality on Array is REFERENCE equality, which breaks
  // plan canonicalization: two expressions built from equal-valued but
  // separately-allocated matrices (q_semantic_dedup vs
  // q_semantic_capped, or two graft_matvec_dots SQL calls) would never
  // compare equal, so exchange reuse, CSE, and the plan-keyed persist
  // registry all miss. Compare (and hash) the matrix CONTENTS.
  override def equals(other: Any): Boolean = other match {
    case m: MatVecDotsExpr =>
      child == m.child && java.util.Arrays.deepEquals(
        matrix.asInstanceOf[Array[AnyRef]], m.matrix.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() +
      java.util.Arrays.deepHashCode(matrix.asInstanceOf[Array[AnyRef]])

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if rows > 0 && matrix.forall(_.length == dim) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure("matrix must be non-empty and rectangular")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"mat_vec_dots expects array<float> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dim, vec.numElements())
    val out = new Array[Double](rows)
    var r = 0
    while (r < rows) {
      var acc = 0.0
      var d = 0
      val base = r * dim
      while (d < n) {
        acc += flat(base + d) * vec.getFloat(d).toDouble
        d += 1
      }
      out(r) = acc
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("matrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, vec => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($dim, $vec.numElements());
         |double[] $out = new double[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += $w[$r * $dim + $d] * (double) $vec.getFloat($d);
         |  }
         |  $out[$r] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecDotsExpr =
    copy(child = newChild)
}

object MatVecDotsExpr {
  def matVecDots(vec: Column, matrix: Array[Array[Double]]): Column =
    GraftExpressionBridge.column(
      MatVecDotsExpr(GraftExpressionBridge.expression(vec), matrix))
}
