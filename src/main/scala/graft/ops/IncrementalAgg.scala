package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view /
  * "stateful gold table" capability: instead of re-aggregating 100 TB
  * of history every run, a gold table stores MERGEABLE partial-agg
  * state per group, and each increment folds in with group-key
  * algebra. The algebra is exact (not approximate): count and sum
  * merge by addition, min/max by min/max — so merge(partials(A),
  * partials(B)) ≡ partials(A ∪ B) for any split, which is the
  * invariant the spec and the oracle both pin.
  *
  * `avg` is deliberately NOT stored — a stored average cannot merge;
  * [[finalize]] derives it (and exposes the count) from the mergeable
  * state at read time. This is the same partial/final split Spark's
  * own HashAggregate performs within a query, lifted to on-disk state
  * between runs (reference analogue: the gold-layer rollups the
  * medallion DAG rebuilds from silver each run —
  * /root/reference/run-all-pipelines.sh:3-239 — made incremental).
  *
  * Scale shape: [[partials]] is one map-side-combined hash aggregate
  * over the increment only; [[merge]] unions two group-keyed frames
  * (store: group-cardinality-sized, NOT history-sized) and
  * re-aggregates — one shuffle of group-grained rows. History is
  * never re-read.
  */
object IncrementalAgg {

  val stateCols: Seq[String] = Seq("n", "sum", "min", "max")

  /** Mergeable per-group state for one measure:
    * `(groupCols..., n, sum, min, max)`. NULL measures count in no
    * accumulator (SQL aggregate semantics), so a group of only-NULL
    * rows carries `n = 0` and NULL sum/min/max — and still merges.
    */
  def partials(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    val clash = groupCols.filter(stateCols.contains)
    require(clash.isEmpty,
      s"group columns may not collide with state columns ${stateCols.mkString("/")}: " +
        clash.mkString(", "))
    val v = col(valueCol)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(v).as("n"), sum(v).as("sum"), min(v).as("min"), max(v).as("max"))
  }

  /** Fold increments into stored state: any number of partial frames
    * (same schema) merge into one — `merge(partials(A), partials(B))`
    * is exactly `partials(A ∪ B)`.
    */
  def merge(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state frame")
    val groupCols = states.head.columns.filterNot(stateCols.contains).toSeq
    states.foreach { s =>
      val missing = stateCols.filterNot(s.columns.contains)
      require(missing.isEmpty,
        s"state frame missing ${missing.mkString(", ")}: ${s.columns.mkString(", ")}")
    }
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))
  }

  /** Read-time view over mergeable state: the stored accumulators
    * plus the derived `avg` (NULL for all-NULL groups, never a
    * divide-by-zero).
    */
  def finalize(state: DataFrame): DataFrame =
    state.withColumn("avg",
      when(col("n") > 0, col("sum") / col("n")))

  private def multiStateCols(valueCols: Seq[String]): Seq[String] =
    valueCols.flatMap(v => Seq(s"${v}_n", s"${v}_sum", s"${v}_min", s"${v}_max"))

  /** Multi-measure mergeable state: per group, `<v>_n/_sum/_min/_max`
    * for EVERY measure from ONE map-side-combined aggregation pass —
    * a real gold table tracks dozens of measures, and maintaining
    * them must not multiply scans ([[Expectations.profile]]'s
    * zero-extra-scans shape, with on-disk merge algebra).
    */
  def partialsMulti(
      df: DataFrame,
      groupCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(valueCols.nonEmpty, "need at least one measure")
    val clash = groupCols.filter(multiStateCols(valueCols).contains)
    require(clash.isEmpty,
      s"group columns collide with state columns: ${clash.mkString(", ")}")
    val aggs = valueCols.flatMap { v =>
      val c = col(v)
      Seq(count(c).as(s"${v}_n"), sum(c).as(s"${v}_sum"),
        min(c).as(s"${v}_min"), max(c).as(s"${v}_max"))
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold multi-measure states: same algebra as [[merge]], applied
    * per measure — `mergeMulti(partialsMulti(A), partialsMulti(B)) ≡
    * partialsMulti(A ∪ B)`.
    */
  def mergeMulti(
      groupCols: Seq[String],
      valueCols: Seq[String],
      states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state frame")
    val needed = multiStateCols(valueCols)
    states.foreach { s =>
      val missing = (groupCols ++ needed).filterNot(s.columns.contains)
      require(missing.isEmpty,
        s"state frame missing ${missing.mkString(", ")}: ${s.columns.mkString(", ")}")
    }
    val aggs = valueCols.flatMap { v =>
      Seq(
        sum(col(s"${v}_n")).as(s"${v}_n"),
        sum(col(s"${v}_sum")).as(s"${v}_sum"),
        min(col(s"${v}_min")).as(s"${v}_min"),
        max(col(s"${v}_max")).as(s"${v}_max"))
    }
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time view over multi-measure state: adds `<v>_avg` per
    * measure, NULL-safe for all-NULL groups.
    */
  def finalizeMulti(state: DataFrame, valueCols: Seq[String]): DataFrame =
    valueCols.foldLeft(state) { (acc, v) =>
      acc.withColumn(s"${v}_avg",
        when(col(s"${v}_n") > 0, col(s"${v}_sum") / col(s"${v}_n")))
    }
}
