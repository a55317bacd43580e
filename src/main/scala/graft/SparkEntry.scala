package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{DateFeatures, SchemaOps}
import graft.functions.GraftFunctions.roundPinned

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` has a matching DuckDB oracle in `oracleSql`
  * (same column names, same ORDER BY) unless the operator is not
  * SQL-expressible in DuckDB, in which case the driver records a
  * weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * Exercises the SURVEY §7.3 end-to-end slice: parquet scan (S2) →
    * struct flatten of a JSON-parsed column (P5) → date-feature bundle
    * (F11–F14) → aggregation over the derived calendar columns — the
    * "gold layer" the reference's silver stage was built to serve.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sfDir)
      .withColumn("props_struct", from_json(col("props"), lit("k INT")))
    val flat = SchemaOps.flatten(ev, Seq("props_struct"))
    val withDates = DateFeatures.withDateFeatures(flat, "ts")
    withDates
      .groupBy(col("ts_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"),
        sum(col("props_struct_k")).as("total_k"))
      .orderBy(col("ts_date"), col("event_type"))
  }

  /** One entry per implemented operator from SURVEY.md §2, merged from
    * the per-area query modules plus the two wired here. */
  /** Insertion-ordered (ListMap) so Verify/Bench run queries in a
    * stable order: cheap parity queries first warm the JVM/codegen,
    * and per-query bench attribution is comparable across rounds.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    scala.collection.immutable.ListMap.empty[String, (SparkSession, String) => DataFrame] ++
    graft.queries.ParityQueries.queries ++
    graft.queries.LlmQueries.queries ++
    graft.queries.CurationQueries.queries ++
    graft.queries.AnalyticsQueries.queries ++
    graft.queries.PipelineQueries.queries ++
    graft.queries.MiningQueries.queries ++ Map(
    // F11–F14 + P2/P3: the reference's most reused compound operator
    // (create_date_features, clean.py:213-233) over the events table.
    "q_date_features" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "ts")
      DateFeatures.withDateFeatures(ev, "ts").orderBy("event_id")
    }),
    // P5: struct flattening (flatten_stuct_schema, clean.py:161-179).
    // events.props is a JSON string — parse to a struct, then flatten
    // to prefixed top-level columns exactly like the clean stage does
    // with Yelp `attributes`/`hours`.
    "q_flatten_struct" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("props_struct", from_json(col("props"), lit("k INT")))
        .select("event_id", "props_struct")
      SchemaOps.flatten(ev, Seq("props_struct")).orderBy("event_id")
    }),
    // The streaming module's tumbling-window plan, run in batch mode —
    // the same windowedAgg powers the watermarked stream
    // (EventStreamsSpec drives that path via MemoryStream).
    "q_windowed_agg" -> ((s, dir) => {
      graft.streaming.EventStreams.windowedAgg(Tables.events(s, dir))
        .select(
          col("window_start"), col("event_type"), col("n_events"),
          roundPinned(col("total_value"), 2).as("total_value_r"))
        .orderBy("window_start", "event_type")
    }),
    // The NATIVE session-window operator (Spark's built-in
    // session_window generator) over the same event log — the
    // built-in-first counterpart to q_sessionize's relational twin.
    // Semantics differ at the exact-gap boundary (built-in closes at
    // diff >= gap; the relational twin at diff > gap) and in the end
    // bound (last event + gap, not last event) — the oracle replays
    // the BUILT-IN's contract exactly.
    "q_session_window" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"),
          roundPinned(sum("value"), 2).as("total_value_r"))
        .select(col("user_id"),
          col("w.start").as("session_start"),
          col("w.end").as("session_end"),
          col("n_events"), col("total_value_r"))
        .orderBy("user_id", "session_start")
    }),

    // Batch gap-sessionization — the relational twin of the streaming
    // flatMapGroupsWithState sessionize (EventStreamsSpec pins their
    // agreement on closed sessions); integer-microsecond gap compare
    // makes the oracle replay exact.
    "q_sessionize" -> ((s, dir) => {
      graft.streaming.EventStreams.sessionizeBatch(
          Tables.events(s, dir), gapSeconds = 1800L)
        .select(
          col("user_id"), col("session_idx"), col("n_events"),
          roundPinned(col("total_value"), 2).as("total_value_r"),
          col("session_start"), col("session_end"))
        .orderBy("user_id", "session_idx")
    }),

    // The STREAMING sessionizer's cross-batch contract (foldBatch),
    // replayed deterministically in batch: events split into two
    // arrival batches by event_id parity (deliberately out of time
    // order), folded through the real foldBatch, final open session
    // flushed. Pins the deep-late semantics — a late disconnected
    // segment emits as its OWN session and never re-opens a closed
    // one — in CORRECTNESS, not just in EventStreamsSpec.
    "q_sessionize_replay" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[graft.streaming.EventStreams.Event]
      graft.streaming.EventStreams
        .sessionizeReplay(ev, gapSeconds = 1800L, nBatches = 2)
        .select(
          col("user_id"), col("n_events"),
          roundPinned(col("total_value"), 2).as("total_value_r"),
          col("first_ts").as("session_start"),
          col("last_ts").as("session_end"))
        .orderBy("user_id", "session_start", "session_end")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * DuckDB deviations handled here: `dayofweek` is 0-based
    * Sunday-start in DuckDB vs 1-based in Spark (+1); nanosecond
    * parquet timestamps are cast to microsecond TIMESTAMP to match
    * our Tables.events repair.
    */
  def oracleSql: Map[String, String] =
    graft.queries.ParityQueries.oracleSql ++
    graft.queries.LlmQueries.oracleSql ++
    graft.queries.CurationQueries.oracleSql ++
    graft.queries.AnalyticsQueries.oracleSql ++
    graft.queries.PipelineQueries.oracleSql ++
    graft.queries.MiningQueries.oracleSql ++ Map(
    "q_date_features" ->
      """SELECT event_id,
        |  ts::TIMESTAMP AS ts_ts,
        |  ts::DATE AS ts_date,
        |  date_trunc('week', ts::TIMESTAMP)::DATE AS ts_week_start_date,
        |  CAST(weekofyear(ts::TIMESTAMP) AS INTEGER) AS ts_week,
        |  CAST(quarter(ts::TIMESTAMP) AS INTEGER) AS ts_quarter,
        |  CAST(dayofweek(ts::TIMESTAMP) + 1 AS INTEGER) AS ts_dayofweek,
        |  CAST(month(ts::TIMESTAMP) AS INTEGER) AS ts_month,
        |  CAST(year(ts::TIMESTAMP) AS INTEGER) AS ts_year
        |FROM events ORDER BY event_id""".stripMargin,
    "q_flatten_struct" ->
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INTEGER) AS props_struct_k
        |FROM events ORDER BY event_id""".stripMargin,
    "q_windowed_agg" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value_r
        |FROM events GROUP BY 1, 2
        |ORDER BY window_start, event_type""".stripMargin,
    "q_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events
        |), f AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), g AS (
        |  SELECT user_id, ts, value,
        |    sum(new_sess) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS session_idx
        |  FROM f
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS total_value_r
        |FROM g GROUP BY user_id, session_idx
        |ORDER BY user_id, session_start""".stripMargin,
    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts::TIMESTAMP AS ts, value FROM events
        |), f AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), g AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(new_sess) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_idx
        |  FROM f
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  round(sum(value), 2) AS total_value_r,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM g GROUP BY 1, 2
        |ORDER BY user_id, session_idx""".stripMargin,
    // Unrolled two-batch replay of the foldBatch contract: per-batch
    // gap chains; the batch-0 segment with the greatest start is the
    // carried open session; a batch-1 segment joins it only when the
    // spans sit within the gap of each other; everything else is its
    // own session. LEFT JOIN: a user whose events are all odd-id has
    // no batch-0 state. All arithmetic in integer MILLISECONDS —
    // SessionState carries Timestamp.getTime (floor-to-ms), so both
    // the gap compares and the dumped bounds replicate that exactly.
    "q_sessionize_replay" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) // 1000 AS ms,
        |    value, event_id % 2 AS b
        |  FROM events
        |), f AS (
        |  SELECT *, CASE WHEN lag(ms) OVER w IS NULL
        |         OR ms - lag(ms) OVER w > 1800000
        |       THEN 1 ELSE 0 END AS new_seg
        |  FROM e WINDOW w AS (PARTITION BY user_id, b ORDER BY ms, event_id)
        |), g AS (
        |  SELECT *, sum(new_seg) OVER (
        |    PARTITION BY user_id, b ORDER BY ms, event_id) AS seg
        |  FROM f
        |), sp AS (
        |  SELECT user_id, b, seg,
        |    min(ms) AS first_ms, max(ms) AS last_ms,
        |    count(*) AS n, sum(value) AS total
        |  FROM g GROUP BY 1, 2, 3
        |), open0 AS (
        |  SELECT user_id, seg AS open_seg, first_ms, last_ms FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY user_id ORDER BY first_ms DESC) AS rn
        |    FROM sp WHERE b = 0) WHERE rn = 1
        |), assigned AS (
        |  SELECT s.user_id, s.n, s.total, s.first_ms, s.last_ms,
        |    CASE
        |      WHEN s.b = 0 AND s.seg = o.open_seg THEN 'open'
        |      WHEN s.b = 1 AND o.open_seg IS NOT NULL
        |           AND s.last_ms >= o.first_ms - 1800000
        |           AND o.last_ms >= s.first_ms - 1800000 THEN 'open'
        |      ELSE s.b || '_' || s.seg
        |    END AS grp
        |  FROM sp s LEFT JOIN open0 o USING (user_id)
        |)
        |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
        |  round(sum(total), 2) AS total_value_r,
        |  make_timestamp(min(first_ms) * 1000) AS session_start,
        |  make_timestamp(max(last_ms) * 1000) AS session_end
        |FROM assigned GROUP BY user_id, grp
        |ORDER BY user_id, session_start, session_end""".stripMargin
  )
}
