package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The ADC table-lookup sum `Σ_s luts[s][codes[s]]` as ONE codegen'd
  * loop — the per-candidate scorer of every PQ search
  * ([[graft.ops.Pq.adcTopK]]/[[graft.ops.Pq.ivfAdcTopK]] and the
  * compressed [[graft.pipeline.AnnIndex]] store).
  *
  * The composed form (`aggregate(zip_with(codes, luts, element_at))`)
  * is a higher-order function pair: Catalyst evaluates it INTERPRETED
  * — per candidate row it allocates an intermediate array and runs
  * two lambda chains — and it sits on the hottest row count of the
  * whole path (candidates ≈ corpus × nProbe/nCells per query batch).
  * Measured on q_ivfpq_topk at sf0.1: 6.1 s → sub-second once this
  * loop replaces the fold (PLANS round-15).
  *
  * Numeric contract: left-to-right accumulation over subspaces from
  * 0.0 — exactly the composed fold's order, so scores stay
  * bit-identical to it (and to the DuckDB oracle's
  * `list_sum(list(lv ORDER BY s))`). A code outside its codebook
  * (impossible from [[graft.ops.Pq.encode]], possible on corrupted
  * store rows) yields NULL — `try_element_at` semantics; plain
  * `element_at` would THROW under Spark 4 ANSI, and a whole search
  * failing on one corrupt store row is the worse contract.
  */
case class AdcSumExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"adc_sum expects (array<int>, array<array<double>>), got " +
          s"${l.catalogString} and ${r.catalogString}")
  }

  // out-of-range codes make the result NULL, so eval must run through
  // the nullable path even when both children are non-null
  override def nullable: Boolean = true

  override def nullSafeEval(codesAny: Any, lutsAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val luts = lutsAny.asInstanceOf[ArrayData]
    val n = codes.numElements()
    // a truncated codes array must NOT yield a silent partial score —
    // the composed fold zips the shorter side with nulls and returns
    // NULL, and a partial sum could rank in top-k
    if (n != luts.numElements()) return null
    var acc = 0.0
    var s = 0
    while (s < n) {
      if (codes.isNullAt(s)) return null
      val lut = luts.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= lut.numElements()) return null
      acc += lut.getDouble(c)
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, luts) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val lut = ctx.freshName("lut")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $codes.numElements();
         |double $acc = 0.0;
         |if ($n != $luts.numElements()) { ${ev.isNull} = true; }
         |else for (int $s = 0; $s < $n; $s++) {
         |  if ($codes.isNullAt($s)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $lut = $luts.getArray($s);
         |  int $c = $codes.getInt($s);
         |  if ($c < 0 || $c >= $lut.numElements()) { ${ev.isNull} = true; break; }
         |  $acc += $lut.getDouble($c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcSumExpr =
    copy(left = newLeft, right = newRight)
}

object AdcSumExpr {
  def adcSum(codes: Column, luts: Column): Column =
    GraftExpressionBridge.column(AdcSumExpr(
      GraftExpressionBridge.expression(codes),
      GraftExpressionBridge.expression(luts)))
}
