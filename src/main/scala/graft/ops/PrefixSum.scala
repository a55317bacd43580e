package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Partition-parallel exact prefix sums over a GLOBAL ordering — the
  * replacement for `Window.orderBy(...)` with no partition spec, which
  * moves the whole frame through ONE task (`WindowExec: No Partition
  * Defined` — the textbook guide-§2 scale killer: a vocabulary-wide or
  * score-wide running sum serializes a multi-million-row frame through
  * a single thread at 100 TB).
  *
  * Shape (the [[Curation.packSequences]] partition-offset idea, kept
  * fully relational and lazy):
  *
  *  1. range-shuffle by the order keys (equal keys land in ONE
  *     partition — the RangePartitioner contract — so tie semantics
  *     survive) and stamp `spark_partition_id()`;
  *  2. persist that frame once ([[graft.CachedFrames.persistOnce]],
  *     plan-keyed, released by the caller's `unpersistAll` like every
  *     other shared frame). The persist is correctness-critical, not
  *     just a double-scan saver: the partition-id column must be
  *     IDENTICAL in the per-partition-totals branch and the output
  *     branch, which only a materialized common subplan guarantees
  *     (two independent executions of a range exchange may sample
  *     different boundaries);
  *  3. per-partition running sums via a window PARTITIONED by the
  *     stamped id — parallel across partitions;
  *  4. per-partition totals collapse to ≤ numPartitions rows; each
  *     partition's offset (sum of all EARLIER partitions' totals) is
  *     an exclusive running sum over that TINY frame — bounded by
  *     cluster configuration, not data, so its one-partition window is
  *     free; no driver action anywhere;
  *  5. broadcast the offsets back onto the stamped frame:
  *     global prefix = local prefix + offset.
  *
  * Exactness: sums here are integer (long) running totals, so
  * re-association across partitions is bit-exact; range partitioning
  * preserves the global order, so offset + local prefix equals the
  * single-partition window's prefix row for row. Tie handling matches
  * the default RANGE frame (all order-key ties share one running-total
  * value) when `includeCurrent = true`; the `includeCurrent = false`
  * (ROWS ... -1) form requires the order keys to be unique per row —
  * every caller in this repo feeds a groupBy-keyed frame, which
  * guarantees that.
  */
object PrefixSum {

  private val PidCol = "__ps_pid"

  /** Append one running-total column per `(outName, valueExpr)` pair,
    * cumulating `valueExpr` (must be integral — long arithmetic) over
    * the global ascending order of `orderCols`.
    *
    * @param includeCurrent true → RANGE UNBOUNDED PRECEDING..CURRENT
    *                       ROW semantics (ties share totals); false →
    *                       ROWS UNBOUNDED PRECEDING..-1 (strictly
    *                       before; order keys must be unique).
    */
  def withRunningTotals(
      df: DataFrame,
      orderCols: Seq[Column],
      sums: Seq[(String, Column)],
      includeCurrent: Boolean = true): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    require(sums.nonEmpty, "need at least one running total")
    val outNames = sums.map(_._1)
    require(outNames.distinct.size == outNames.size, "duplicate output names")
    val clashing = df.columns.filter((outNames :+ PidCol).contains)
    require(clashing.isEmpty,
      s"withRunningTotals appends ${outNames.mkString("/")} and stages $PidCol; " +
        s"rename: ${clashing.mkString(", ")}")
    // ONE persist, load-bearing for correctness: the stamped partition
    // id must be IDENTICAL in the totals branch and the output branch,
    // which only a materialized common subplan guarantees (two
    // independent executions of a range exchange may sample different
    // boundaries). The range exchange's boundary-sampling pass does
    // re-execute the unpersisted child once more — every caller feeds
    // a small pre-aggregated frame (vocab CDF, distinct-score curve)
    // whose recompute is one cheap aggregation, measured cheaper than
    // a second InMemoryRelation build (r22 A/B; the same
    // cache-vs-recompute lesson as shingleFrame and the TfIdf streams).
    val part = graft.CachedFrames.persistOnce(
      df.repartitionByRange(orderCols: _*)
        .withColumn(PidCol, spark_partition_id()))
    val w0 = Window.partitionBy(PidCol).orderBy(orderCols: _*)
    // default frame = RANGE UNBOUNDED PRECEDING .. CURRENT ROW
    val w = if (includeCurrent) w0 else w0.rowsBetween(Window.unboundedPreceding, -1)
    val local = sums.foldLeft(part) { case (acc, (n, v)) =>
      acc.withColumn(n, coalesce(sum(v).over(w), lit(0L)))
    }
    val totalsDf = part.groupBy(col(PidCol))
      .agg(
        sum(sums.head._2).as(s"__ps_t_${sums.head._1}"),
        sums.tail.map { case (n, v) => sum(v).as(s"__ps_t_$n") }: _*)
    // Each partition's offset = sum of all EARLIER partitions' totals:
    // an exclusive running sum over totalsDf — which is ≤ numPartitions
    // ROWS (bounded by cluster configuration, not data), so a
    // single-partition window here is a microsecond stage, not a scale
    // risk, and replaces the pid-inequality join + re-aggregation that
    // cost several extra AQE stage jobs per call (r22 A/B).
    val offW = Window.orderBy(col(PidCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totalsDf.select(
      col(PidCol) +: sums.map { case (n, _) =>
        coalesce(sum(col(s"__ps_t_$n")).over(offW), lit(0L)).as(s"__ps_o_$n")
      }: _*)
    val joined = local.join(broadcast(offsets), Seq(PidCol))
    val bumped = sums.foldLeft(joined) { case (acc, (n, _)) =>
      acc.withColumn(n, col(n) + col(s"__ps_o_$n"))
    }
    bumped.drop(PidCol +: sums.map { case (n, _) => s"__ps_o_$n" }: _*)
  }

  /** The single-total crossJoin(broadcast(...)) companion: append the
    * GLOBAL sum of each value as a constant column — what
    * `sum(...).over(Window.partitionBy())` computes, without the
    * everything-into-one-task window.
    */
  def withGrandTotals(df: DataFrame, sums: Seq[(String, Column)]): DataFrame = {
    require(sums.nonEmpty, "need at least one total")
    val agg = df.agg(
      coalesce(sum(sums.head._2), lit(0L)).as(sums.head._1),
      sums.tail.map { case (n, v) => coalesce(sum(v), lit(0L)).as(n) }: _*)
    df.crossJoin(broadcast(agg))
  }
}
