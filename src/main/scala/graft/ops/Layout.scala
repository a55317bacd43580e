package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side complement
  * of the partition/bucket specs in [[graft.io.Sink]].
  *
  * A 100 TB table is read mostly through min/max file statistics
  * (parquet row-group stats, Iceberg manifest ranges): a file sorted
  * on ONE key prunes only that key's predicates. Z-ORDER interleaving
  * maps N keys onto one space-filling-curve position so that files cut
  * from the sorted curve are rectangles in key space — min/max stats
  * then prune predicates on ANY prefix-free combination of the
  * interleaved columns (the Delta/Iceberg `ZORDER BY` capability,
  * built here from plain expressions).
  *
  * Everything is exact integer arithmetic on bounded bit-widths —
  * deterministic, engine-replayable, codegen'd end to end.
  */
object Layout {

  /** Morton (Z-order) key interleaving the low `bits` bits of each
    * column: bit `i` of column `j` lands at curve position
    * `i · n + j` (LSB-first round-robin). Columns are masked to
    * `bits` first, so out-of-range values wrap rather than corrupt
    * neighbors' bit lanes; with `n · bits ≤ 62` the key fits a
    * non-negative long. Negative inputs: mask the caller-normalized
    * value (e.g. `x - min`) — Z-order locality is only meaningful on
    * non-negative normalized coordinates anyway.
    */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "interleave at least two columns")
    require(bits >= 1 && cols.size * bits <= 62,
      s"need 1 <= bits and ${cols.size} * bits <= 62, got $bits")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield (shiftright(c.cast("long"), i).bitwiseAND(lit(1L))) *
      lit(1L << (i * n + j))
    terms.reduce(_ + _)
  }

  /** Range-partition `df` into `numFiles` output slices along the
    * Z-order curve of `cols` and sort each slice by the curve
    * position — one writer task per slice then yields files whose
    * min/max stats are tight rectangles over ALL interleaved columns.
    * One range exchange (sampled bounds) + an in-partition sort: the
    * exact cost of any global layout, just pointed at a multi-column
    * curve. The staging key is dropped on the way out.
    *
    * Columns are min/max-NORMALIZED into equal `bits`-wide lanes
    * before interleaving. This is not cosmetic: with raw values, a
    * 15-bit key interleaved against a 10-bit key leaves the top five
    * interleave rounds holding ONLY the wide column's bits, so the
    * curve degenerates to a single-column sort and predicates on the
    * narrow column prune nothing (measured on lineitem: suppkey-only
    * file pruning was 32/32 files read before normalization, 7/32
    * after — `LayoutScaleProbe`). The min/max pass is one aggregate
    * action; the per-row scaling is a codegen'd projection. A
    * constant column scales to lane 0 (no bits wasted re-proving it).
    */
  def clusterByZOrder(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val reserved = "__zkey"
    require(!df.columns.contains(reserved),
      s"clusterByZOrder reserves column name $reserved; rename the existing")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val laneMax = (1L << bits) - 1L
    val lanes = cols.zipWithIndex.map { case (c, j) =>
      // min/max are NULL for an empty frame or an all-NULL column —
      // a plausible empty-increment input; degrade to the constant
      // lane instead of throwing on getDouble(null).
      if (r.isNullAt(2 * j) || r.isNullAt(2 * j + 1)) lit(0L)
      else {
      val (mn, mx) = (r.getDouble(2 * j), r.getDouble(2 * j + 1))
      if (!(mx > mn)) lit(0L)
      else least(
        greatest(
          floor((col(c).cast("double") - mn) * laneMax / (mx - mn)).cast("long"),
          lit(0L)),
        lit(laneMax))
      }
    }
    df.withColumn(reserved, zOrderKey(lanes, bits))
      .repartitionByRange(numFiles, col(reserved))
      .sortWithinPartitions(reserved)
      .drop(reserved)
  }
}
