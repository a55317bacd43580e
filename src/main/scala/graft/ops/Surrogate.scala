package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Surrogate-key generation (F4).
  *
  * The reference assigns `checkin_id` with
  * `monotonically_increasing_id()` after the explode
  * (`/root/reference/yelp_etl/pipeline/clean.py:57`). That id is
  * partition-layout-dependent — re-running with a different number of
  * input splits yields different ids — so it cannot hash-match a
  * DuckDB oracle. We expose both:
  *
  *   - [[withUniqueId]] — the faithful, scale-free variant: per-partition
  *     counter embedded in the upper bits, zero shuffle, ids unique
  *     but not dense and not reproducible across layouts.
  *   - [[withSequentialId]] — deterministic dense 0-based id by key
  *     order, computed with the partition-offset (zipWithIndex) shape:
  *     range-repartition + local sort, one small job counting rows per
  *     partition, then `offset(partition) + local index`. Every
  *     partition works independently — no single-partition global
  *     window (the naive `row_number() OVER (ORDER BY …)` funnels the
  *     entire dataset through one task and OOMs at scale).
  */
object Surrogate {

  /** Faithful `monotonically_increasing_id` (nondeterministic across
    * partitionings; unique within a job). */
  def uniqueId: Column = monotonically_increasing_id()

  def withUniqueId(df: DataFrame, name: String): DataFrame =
    df.withColumn(name, uniqueId)

  /** Deterministic dense 0-based id ordered by `keys` (which must be a
    * total order for full determinism; ties get an arbitrary but
    * stable-within-run order).
    *
    * Cost: one range-shuffle + local sort (the unavoidable price of a
    * globally ordered dense sequence) + one lightweight count job for
    * the per-partition offsets. No partition ever holds more than its
    * range share — scales to any row count.
    */
  def withSequentialId(df: DataFrame, name: String, keys: Column*): DataFrame = {
    val spark = df.sparkSession
    // zipWithIndex's internal count job and the caller's action both
    // scan the sorted frame — persist once so the range shuffle + sort
    // is paid once (plan-keyed; released by CachedFrames.unpersistAll).
    val sorted = graft.CachedFrames.persistOnce(
      df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*))
    val rdd = sorted.rdd
    // zipWithIndex = count job over all-but-last partition + broadcast
    // of the cumulative offsets; indices follow partition order, which
    // repartitionByRange makes identical to global key order.
    val withId = rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    spark.createDataFrame(withId, sorted.schema.add(name, LongType, nullable = false))
  }
}
