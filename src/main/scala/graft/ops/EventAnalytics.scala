package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Ordered-event analytics over a keyed event log: funnel completion
  * and cohort retention — the `windowFunnel`/`retention` capabilities
  * of OLAP event stores, re-expressed as single-exchange Spark plans.
  *
  * Both operators hinge on the same scale property: everything an
  * entity needs is computable inside ONE `Window.partitionBy(entity)`
  * pass, so the only wide operation is the initial hash exchange on
  * the entity key. Successive windows over the same partitioning add
  * WindowExec nodes, never exchanges, and the follow-up per-entity
  * reduction reuses the partitioning outright (pinned by
  * PlanAuditSpec). No self-joins, no per-step shuffles — at 100 TB
  * the cost is one shuffle of the projected event columns.
  */
object EventAnalytics {

  /** One row per entity with the first-completion time of each funnel
    * step: `step_i_ts` = the earliest event of `steps(i-1)` strictly
    * after `step_(i-1)_ts` (earliest-chain semantics: each step
    * matches the first qualifying event after the previous step's
    * match; NULL from the first unreached step onward). With
    * `maxGapSeconds`, a step must also land within that many seconds
    * of the previous step — the conversion-window variant.
    *
    * Earliest-chain is deliberately greedy-minimal: it never misses a
    * completion that ANY assignment of events would satisfy when no
    * gap cap is set, and under a gap cap it is the standard
    * first-touch reading (an entity abandoning and restarting later
    * is counted from its first attempt).
    */
  def funnelStepTimes(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // Same reserved-name stance as sessionizeBatch: a step_i_ts input
    // column would be silently shadowed by the staging windows.
    val reserved = steps.indices.map(i => s"step_${i + 1}_ts").toSet
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"funnelStepTimes reserves step_<i>_ts; rename: ${shadowing.mkString(", ")}")
    val w = Window.partitionBy(entityCol)
    val stepped = steps.zipWithIndex.foldLeft(df) { case (acc, (step, i)) =>
      val matches =
        if (i == 0) col(typeCol) === step
        else {
          val prev = col(s"step_${i}_ts")
          val after = col(typeCol) === step && col(tsCol) > prev
          maxGapSeconds.fold(after)(g =>
            after && col(tsCol) <= prev + expr(s"INTERVAL '$g' SECOND"))
        }
      acc.withColumn(s"step_${i + 1}_ts", min(when(matches, col(tsCol))).over(w))
    }
    // The window columns are constant within an entity: this groupBy
    // reuses the window's hashpartitioning — no second exchange.
    val stepCols = steps.indices.map(i => s"step_${i + 1}_ts")
    stepped.groupBy(col(entityCol))
      .agg(min(stepCols.head).as(stepCols.head),
        stepCols.tail.map(c => min(c).as(c)): _*)
  }

  /** Per-entity feed-health audit — the ingestion-monitoring pass a
    * streaming pipeline runs over each batch of an event log:
    * `(entity, n_events, n_out_of_order, max_gap_seconds,
    * span_seconds)` where `n_out_of_order` counts events whose
    * timestamp regresses against the delivery order (`orderCol` — an
    * offset/sequence id), `max_gap_seconds` is the largest
    * between-event silence, and `span_seconds` is last-minus-first.
    * Out-of-order counts size the watermark a streaming consumer
    * needs; gap spikes flag dead producers.
    *
    * Same single-exchange contract as the rest of this module: one
    * hash exchange on the entity, a lag window, and a reduction that
    * reuses the window's partitioning. Gaps are exact integer
    * microsecond differences (timezone-free), divided out to whole
    * seconds so external engines replay them exactly.
    */
  def feedAudit(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      orderCol: String): DataFrame = {
    val reserved = Set("__prev_us", "__us", "n_events", "n_out_of_order",
      "max_gap_seconds", "span_seconds")
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"feedAudit reserves ${reserved.mkString("/")}; " +
        s"rename: ${shadowing.mkString(", ")}")
    val w = Window.partitionBy(entityCol).orderBy(col(orderCol))
    val us = unix_micros(col(tsCol).cast("timestamp"))
    df.withColumn("__us", us)
      .withColumn("__prev_us", lag(col("__us"), 1).over(w))
      .groupBy(col(entityCol))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("__us") < col("__prev_us"), 1)).as("n_out_of_order"),
        coalesce(max((col("__us") - col("__prev_us")) / lit(1000000L)
          .cast("double")), lit(0.0)).as("max_gap_seconds"),
        ((max(col("__us")) - min(col("__us"))) / lit(1000000L).cast("double"))
          .as("span_seconds"))
  }

  /** Time-series resampling with forward fill — the pandas
    * `resample().ffill()` / SQL gap-filling capability over a keyed
    * event log: a dense per-entity spine of `stepSeconds` periods
    * from each entity's first to last event, per-period event counts
    * (zero where silent), the last in-period value (ties broken by
    * `orderCol`), and `filled_value` carrying the last observation
    * forward across empty periods. Output: `(entity,
    * period_start [timestamp_ntz], n_events, last_value,
    * filled_value)`.
    *
    * Period arithmetic is exact integer-microsecond floor division —
    * engine-replayable, timezone-free. The spine is generated
    * relationally (per-entity bounds agg → `sequence` → explode), so
    * entities' spines densify in parallel; an entity's spine length
    * is span/step — size `stepSeconds` to the data's span (a year of
    * 1-second periods per entity is 31M rows each, and Spark's
    * `sequence` caps elements per call; that limit fires loudly, not
    * silently).
    *
    * Scale shape: bounds agg + per-period agg both hash on the
    * entity(+period) key; the spine⋈periods join is keyed; the ffill
    * window repartitions by entity alone. Three exchanges of
    * period-grained (not event-grained) rows — the unavoidable shape
    * of densification without a sorted table format.
    */
  def resample(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      valueCol: String,
      orderCol: String,
      stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive: $stepSeconds")
    val reserved = Set("__us", "__period_us", "period_start", "n_events",
      "last_value", "filled_value")
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"resample reserves ${reserved.mkString("/")}; " +
        s"rename: ${shadowing.mkString(", ")}")
    val stepUs = stepSeconds * 1000000L
    val rows = df.select(
      col(entityCol),
      unix_micros(col(tsCol).cast("timestamp")).as("__us"),
      col(valueCol), col(orderCol))
      .withColumn("__period_us", expr(s"(__us div ${stepUs}L) * ${stepUs}L"))
    val perPeriod = rows
      .groupBy(col(entityCol), col("__period_us"))
      .agg(
        count(lit(1)).as("n_events"),
        max_by(col(valueCol), struct(col("__us"), col(orderCol)))
          .as("last_value"))
    val spine = rows
      .groupBy(col(entityCol))
      .agg(min("__period_us").as("__lo"), max("__period_us").as("__hi"))
      .select(col(entityCol),
        explode(sequence(col("__lo"), col("__hi"), lit(stepUs)))
          .as("__period_us"))
    val w = Window.partitionBy(entityCol).orderBy(col("__period_us"))
    spine
      .join(perPeriod, Seq(entityCol, "__period_us"), "left")
      .withColumn("filled_value",
        last(col("last_value"), ignoreNulls = true).over(w))
      .select(
        col(entityCol),
        timestamp_micros(col("__period_us")).cast("timestamp_ntz")
          .as("period_start"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("last_value"), col("filled_value"))
  }

  /** Trailing-window z-score anomaly detection over a keyed series —
    * the metrics-monitoring pass run on [[resample]]'s dense output
    * (dense matters: a silent period is a zero, and zeros are exactly
    * the anomalies a sparse groupBy never shows). Each point scores
    * against the `trailing` points strictly BEFORE it (`ROWS BETWEEN
    * trailing PRECEDING AND 1 PRECEDING` — the current point must not
    * contaminate its own baseline): `z = (value − mean) / stddev`,
    * NULL while the baseline has fewer than two points or zero
    * variance; `is_anomaly` = |z| > threshold on the ROUNDED z (both
    * engines threshold the same 4-decimal value, so the flag is
    * engine-stable even when stddev differs in the last ulp).
    *
    * One hash exchange on the entity; the trailing frame is a single
    * WindowExec — no self-joins, the same single-exchange contract as
    * the rest of this module.
    */
  def anomalies(
      series: DataFrame,
      entityCol: String,
      orderCol: String,
      valueCol: String,
      trailing: Int,
      zThreshold: Double): DataFrame = {
    require(trailing >= 2, s"need a trailing baseline of >= 2 points: $trailing")
    require(zThreshold > 0, s"zThreshold must be positive: $zThreshold")
    val reserved = Set("trailing_mean", "z", "is_anomaly")
    val shadowing = series.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"anomalies reserves ${reserved.mkString("/")}; " +
        s"rename: ${shadowing.mkString(", ")}")
    val w = Window.partitionBy(entityCol).orderBy(col(orderCol))
      .rowsBetween(-trailing.toLong, -1L)
    val v = col(valueCol).cast("double")
    val mean = avg(v).over(w)
    val sd = stddev_samp(v).over(w)
    series
      .withColumn("trailing_mean", roundPinned(mean, 4))
      .withColumn("z",
        roundPinned((v - mean) / when(sd =!= 0, sd), 4))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThreshold, lit(false)))
  }

  /** Funnel summary: `(step, step_name, entities)` — how many
    * entities reached each step (monotonically non-increasing).
    */
  def funnel(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      maxGapSeconds: Option[Long] = None): DataFrame = {
    val times = funnelStepTimes(df, entityCol, tsCol, typeCol, steps, maxGapSeconds)
    times.select(explode(array(steps.zipWithIndex.map { case (s, i) =>
        struct(lit(i + 1).as("step"), lit(s).as("step_name"),
          col(s"step_${i + 1}_ts").as("__ts"))
      }: _*)).as("x"))
      .select(col("x.step").as("step"), col("x.step_name").as("step_name"),
        col("x.__ts").as("__ts"))
      .filter(col("__ts").isNotNull)
      .groupBy("step", "step_name")
      .agg(count(lit(1)).as("entities"))
  }

  /** Per-session ordered event-type paths:
    * `(entityCol, session_idx, path)` with `path` = the session's
    * event types joined by `>` in (ts, orderCol) order. Sessions are
    * gap-based, the same lag + running-sum assignment as
    * `EventStreams.sessionizeBatch` (kept separate because that
    * operator aggregates the events away while paths need the
    * per-event rows).
    *
    * Determinism: `collect_list` has no ordering guarantee, so the
    * path is built by `array_sort` over `(ts, order, type)` structs —
    * a total order because `orderCol` is unique per event. Plan
    * shape: one hash exchange on the entity; the lag and running-sum
    * windows and the session groupBy all reuse it (grouping keys
    * extend the partition key).
    */
  def sessionPaths(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      orderCol: String,
      gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    val reserved = Set("__new_sess", "session_idx", "path")
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"sessionPaths reserves ${reserved.mkString("/")}; rename: ${shadowing.mkString(", ")}")
    val w = Window.partitionBy(entityCol).orderBy(col(tsCol), col(orderCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val isNew = when(
      prevTs.isNull || col(tsCol) - prevTs > expr(s"INTERVAL '$gapSeconds' SECOND"), 1L)
      .otherwise(0L)
    df.withColumn("__new_sess", isNew)
      .withColumn("session_idx", sum(col("__new_sess")).over(w))
      .groupBy(col(entityCol), col("session_idx"))
      .agg(concat_ws(">",
        transform(
          array_sort(collect_list(struct(
            col(tsCol).as("t"), col(orderCol).as("o"), col(typeCol).as("e")))),
          x => x.getField("e"))).as("path"))
  }

  /** The `k` most frequent session paths: `(path, sessions)`, count
    * desc then path asc (total order → deterministic cut), lowered to
    * TakeOrderedAndProject — no global sort.
    */
  def topPaths(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      orderCol: String,
      gapSeconds: Long = 1800L,
      k: Int = 10): DataFrame =
    sessionPaths(df, entityCol, tsCol, typeCol, orderCol, gapSeconds)
      .groupBy("path")
      .agg(count(lit(1)).as("sessions"))
      .orderBy(col("sessions").desc, col("path"))
      .limit(k)

  /** Weekly cohort retention: `(cohort_week, week_offset, users)` —
    * of the entities whose FIRST event falls in `cohort_week` (Monday
    * truncation), how many were active `week_offset` weeks later.
    * `week_offset` 0 is the cohort week itself, so each cohort's
    * offset-0 row is its size.
    *
    * Shape: first-event window over the entity partition → project to
    * distinct (entity, cohort, active-week) — the distinct's keys
    * extend the partition key, so it reuses the exchange — → count
    * per (cohort, offset). The final aggregate is the only second
    * shuffle, over one row per entity-week.
    */
  def retentionCohorts(
      df: DataFrame,
      entityCol: String,
      tsCol: String): DataFrame = {
    val reserved = Set("__first_ts", "cohort_week", "event_week", "week_offset", "users")
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"retentionCohorts reserves ${reserved.mkString("/")}; rename: ${shadowing.mkString(", ")}")
    val w = Window.partitionBy(entityCol)
    df.withColumn("__first_ts", min(col(tsCol)).over(w))
      .select(
        col(entityCol),
        date_trunc("week", col("__first_ts")).cast("date").as("cohort_week"),
        date_trunc("week", col(tsCol)).cast("date").as("event_week"))
      .distinct()
      .withColumn("week_offset",
        (datediff(col("event_week"), col("cohort_week")) / 7).cast("int"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("users"))
  }

  /** Freshness-decayed aggregates: per group, value totals weighted by
    * a STEPPED half-life decay `w = 2^(−⌊age_days / halfLifeDays⌋)` —
    * the recency weighting a training-data mix applies to crawls
    * (last week's snapshot counts full, month-old half, ...). The
    * stepped (integer-exponent) form is chosen over smooth
    * `exp(−λ·age)` deliberately: `2^(−k)` is a DYADIC rational —
    * exactly representable, computed by an integer shift — so the
    * weights carry no transcendental 1-ulp cross-engine risk, and the
    * weighted sums quantize to longs (`round(v·w·1e6)`) making the
    * reduction order-free and bit-replayable. `freshness` =
    * decayed/raw — 1.0 means all weight in the newest half-life
    * bucket, → 0 means the group's mass is stale.
    *
    * One scan: the as-of anchor (max ts) rides back as a broadcast
    * 1-row frame; weights are a codegen'd projection; ONE map-side
    * combined aggregation. NULL values/timestamps contribute to `n`
    * but to NEITHER sum: a NULL value is skipped by SUM in both
    * engines, and a NULL timestamp is explicitly gated out of the raw
    * sum too (its weight is NULL, so the row can't enter the decayed
    * sum — letting it into the raw sum alone would bias freshness_r
    * downward on dirty data).
    *
    * @return (group cols..., n, decayed_value_r, raw_value_r,
    *         freshness_r)
    */
  def decayedAgg(
      df: DataFrame,
      groupCols: Seq[String],
      tsCol: String,
      valueCol: String,
      halfLifeDays: Int = 7): DataFrame = {
    require(halfLifeDays >= 1, s"halfLifeDays must be >= 1: $halfLifeDays")
    require(groupCols.nonEmpty, "decayedAgg needs at least one group column")
    val base = df.select(
      groupCols.map(col) :+
        col(tsCol).cast("date").as("__d") :+
        col(valueCol).cast("double").as("__v"): _*)
    val asof = base.agg(max(col("__d")).as("__asof"))
    // calendar-day age (date subtraction — exact integers in any
    // engine), bucketed into half-life steps by integer division
    val k = expr(s"datediff(__asof, __d) div $halfLifeDays")
    val wt = when(col("__k") >= 63, lit(0.0)).otherwise(
      lit(1.0) / expr(
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(__k AS INT)) AS DOUBLE)"))
    base.crossJoin(broadcast(asof))
      .withColumn("__k", k)
      .withColumn("__w", wt)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(roundPinned(col("__v") * col("__w") * lit(1e6)).cast("long")).as("__dq"),
        // Gated on a non-NULL timestamp: a row with NULL ts has NULL
        // weight and is skipped by the decayed sum, so letting its
        // value into the raw sum would silently bias freshness_r
        // downward on dirty data. NULL ts rows count in `n` only.
        sum(when(col("__d").isNotNull,
          roundPinned(col("__v") * lit(1e6)).cast("long"))).as("__rq"))
      // + 0.0: pin zero's sign across engines for near-zero totals
      .withColumn("decayed_value_r",
        roundPinned(col("__dq").cast("double") / lit(1e6), 4))
      .withColumn("raw_value_r",
        roundPinned(col("__rq").cast("double") / lit(1e6), 4))
      .withColumn("freshness_r",
        roundPinned(try_divide(col("__dq").cast("double"), col("__rq").cast("double")), 4))
      .drop("__dq", "__rq")
  }
}
