package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key generation (F4).
  *
  * The reference assigns `checkin_id` with
  * `monotonically_increasing_id()` after the explode
  * (`/root/reference/yelp_etl/pipeline/clean.py:57`). That id is
  * partition-layout-dependent — re-running with a different number of
  * input splits yields different ids — so it cannot hash-match a
  * DuckDB oracle. We expose both:
  *
  *   - [[uniqueId]] — the faithful, scale-free variant: per-partition
  *     counter embedded in the upper bits, zero shuffle, ids unique
  *     but not dense and not reproducible across layouts.
  *   - [[sequentialId]] — deterministic dense rank over a natural key
  *     ordering: reproducible and oracle-comparable. Costs one global
  *     sort (range partition + local sort), which is the unavoidable
  *     price of a dense deterministic sequence on a cluster; use only
  *     when determinism is required.
  */
object Surrogate {

  /** Faithful `monotonically_increasing_id` (nondeterministic across
    * partitionings; unique within a job). */
  def uniqueId: Column = monotonically_increasing_id()

  /** Deterministic 0-based id by ordering on `keys` (dense, stable
    * across partitionings as long as `keys` is a total order).
    */
  def sequentialId(keys: Column*): Column =
    row_number().over(Window.orderBy(keys: _*)).cast("long") - 1

  def withUniqueId(df: DataFrame, name: String): DataFrame =
    df.withColumn(name, uniqueId)

  def withSequentialId(df: DataFrame, name: String, keys: Column*): DataFrame =
    df.withColumn(name, sequentialId(keys: _*))
}
