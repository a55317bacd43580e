package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Curation, EventAnalytics, FeatureEncode, Joins, Sketches, TextAnalysis, TfIdf}
import graft.pipeline.HllStore
import graft.functions.GraftFunctions.roundPinned

/** Oracle-checked queries for the temporal-join and sketch operators
  * ([[graft.ops.Joins]], [[graft.ops.Sketches]]) — engine capabilities
  * beyond the reference's batch-ETL surface, same driver contract as
  * every other query family: identical column names/ORDER BY in the
  * Spark plan and the DuckDB SQL.
  */
object AnalyticsQueries {

  private val hllB = 6 // HLL register-index bits: m = 64 buckets
  private val overlapK = 64 // per-source KMV size for the overlap matrix
  private val decayHalfLifeDays = 7
  private val robustSigmas = 3.5
  private val winsorLow = 0.05
  private val winsorHigh = 0.95

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // As-of join: each purchase event picks up the most recent view
    // by the same user (inclusive backward match). The right side is
    // pre-deduped to one row per (user_id, ts) with max_by/arg_max so
    // tie resolution is engine-independent.
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts")
        .agg(
          max("event_id").as("view_event_id"),
          max_by(col("value"), col("event_id")).as("view_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      Joins.asofJoin(purchases, views, Seq("user_id"), "ts", "ts",
          inclusive = true, rightPrefix = "last_")
        .orderBy("event_id")
    }),

    // Forward as-of: each purchase picks up the NEXT view at-or-after
    // it (same plan, descending traversal).
    "q_asof_forward" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts")
        .agg(max("event_id").as("view_event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      Joins.asofJoin(purchases, views, Seq("user_id"), "ts", "ts",
          inclusive = true, rightPrefix = "next_", forward = true)
        .orderBy("event_id")
    }),

    // The stream-stream attribution join run in batch mode (identical
    // plan minus watermarks): every view by the same user within the
    // 30-minute lookback BEFORE each purchase, left-outer so
    // unattributed purchases survive with nulls. The streaming
    // execution of the same operator is covered by EventStreamsSpec.
    "q_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.filter(col("event_type") === "view")
        .select("event_id", "user_id", "ts", "value")
      graft.streaming.EventStreams.attributionJoin(
          purchases, views, lookback = "30 minutes")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("matched_event_id"), col("matched_ts"), col("matched_value"))
        .orderBy("event_id", "matched_event_id")
    }),

    // Funnel completion (X51): earliest-chain signup → view → click →
    // purchase per user, entities-reaching-each-step summary. One
    // exchange: every step is a window over the same user partition.
    "q_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "ts", "event_type")
      graft.ops.EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
          Seq("signup", "view", "click", "purchase"))
        .orderBy("step")
    }),

    // The conversion-window variant: each step must land within 3 days
    // of the previous step's match.
    "q_funnel_gated" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "ts", "event_type")
      graft.ops.EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
          Seq("signup", "view", "click", "purchase"),
          maxGapSeconds = Some(3L * 86400))
        .orderBy("step")
    }),

    // In-session funnel (X51 ∘ X53): conversion within a single
    // gap-session, via a composite user#session entity — the
    // composition needs no new operator code.
    "q_funnel_sessions" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "ts", "event_id", "event_type")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val sess = ev
        .withColumn("__new", when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) > expr("INTERVAL '1800' SECOND"), 1L)
          .otherwise(0L))
        .withColumn("session_key",
          concat_ws("#", col("user_id"), sum(col("__new")).over(w)))
        .select("session_key", "ts", "event_id", "event_type")
      graft.ops.EventAnalytics.funnel(sess, "session_key", "ts", "event_type",
          Seq("view", "click", "purchase"))
        .orderBy("step")
    }),

    // Weekly cohort retention (X52): users active N weeks after their
    // first-event week.
    "q_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "ts")
      graft.ops.EventAnalytics.retentionCohorts(ev, "user_id", "ts")
        .orderBy("cohort_week", "week_offset")
    }),

    // Top event-type paths per gap-session (X53): the most common
    // ordered journeys, deterministic cut (count desc, path asc).
    "q_event_paths" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "ts", "event_id", "event_type")
      graft.ops.EventAnalytics.topPaths(
          ev, "user_id", "ts", "event_type", "event_id",
          gapSeconds = 1800L, k = 15)
        .orderBy(col("sessions").desc, col("path"))
    }),

    // CDC merge (X54): two change waves (v2 overriding v1, some keys
    // deleted) compacted latest-wins and merged into a base snapshot.
    "q_cdc_apply" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      val base = o.filter(col("o_orderkey") % 3 =!= 0)
      val c1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2).as("o_totalprice"), col("o_orderstatus"),
          lit(1L).as("version"), lit("U").as("op"))
      val c2 = o.filter(col("o_orderkey") % 4 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 3).as("o_totalprice"), col("o_orderstatus"),
          lit(2L).as("version"),
          when(col("o_orderkey") % 8 === 0, "D").otherwise("U").as("op"))
      graft.ops.Cdc.applyChanges(
          base, c1.unionByName(c2), Seq("o_orderkey"), "version", "op")
        .orderBy("o_orderkey")
    }),

    // SCD2 dimension build (X55): each user's event-type episodes with
    // validity ranges; consecutive identical states collapse.
    "q_scd2" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select("user_id", "ts", "event_id", "event_type")
      // valid_to completes the total order: same-microsecond events
      // can yield two episodes tied on (user, valid_from, type), and
      // engine-arbitrary tie order would flake the hash compare.
      // NULLS FIRST pinned explicitly (DuckDB defaults NULLS LAST).
      graft.ops.Cdc.scd2FromLog(ev, "user_id", "ts", "event_id", Seq("event_type"))
        .orderBy(col("user_id"), col("valid_from"), col("event_type"),
          asc_nulls_first("valid_to"))
    }),

    // Sliding-window aggregation (X17's overlapping counterpart):
    // 2-hour windows every 30 minutes — each event lands in exactly 4
    // epoch-aligned windows. Identical code runs on readStream (the
    // built-in window() is the streaming-window operator).
    "q_sliding_agg" -> ((s, dir) => {
      Tables.events(s, dir).select(col("ts"), col("value"))
        .groupBy(window(col("ts"), "2 hours", "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          roundPinned(sum(col("value")), 2).as("total_value"))
        .select(col("window.start").as("w_start"),
          col("window.end").as("w_end"),
          col("n_events"), col("total_value"))
        .orderBy("w_start")
    }),

    // Explicit GROUPING SETS with grouping() flags — the arbitrary
    // multi-granularity form of which q_rollup/q_cube are the fixed
    // shapes; one shuffle for all three granularities.
    "q_grouping_sets" -> ((s, dir) => {
      Tables.lineitem(s, dir).createOrReplaceTempView("graft_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
          |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
          |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
          |FROM graft_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
          |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin)
    }),

    // Event-time RANGE window frame: per-row trailing-1-hour sum by
    // type — the interval-bounded frame (peers included) beside
    // q_sliding_agg's bucketed window() generator.
    "q_range_frame" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("graft_events")
      s.sql(
        """SELECT event_id,
          |  round(sum(value) OVER (PARTITION BY event_type ORDER BY ts
          |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
          |    AS trailing_1h
          |FROM graft_events ORDER BY event_id""".stripMargin)
    }),

    // Data-quality expectations (X56): four row-level rules audited in
    // ONE aggregation pass; NULL predicates count as violations.
    "q_expectations" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.ops.Expectations.check(li, Seq(
          graft.ops.Expectations.Rule("quantity_1_50",
            col("l_quantity") >= 1 && col("l_quantity") <= 50),
          graft.ops.Expectations.Rule("discount_0_008",
            col("l_discount") >= 0 && col("l_discount") <= 0.08),
          graft.ops.Expectations.Rule("shipdate_not_null",
            col("l_shipdate").isNotNull),
          graft.ops.Expectations.Rule("price_positive",
            col("l_extendedprice") > 0)))
        .orderBy("rule")
    }),

    // One-pass numeric profile of four lineitem measures: count/nulls/
    // min/max/mean/stddev per column from a single aggregation.
    // Mean/stddev round to 4 decimals for cross-engine hash equality
    // (the repo-wide float-rounding convention; double-sum ordering
    // differences live ~8 digits below the cut at these magnitudes).
    "q_profile" -> ((s, dir) => {
      graft.ops.Expectations.profile(
          Tables.lineitem(s, dir),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .select(col("column"), col("n"), col("n_null"), col("min"), col("max"),
          roundPinned(col("mean"), 4).as("mean"), roundPinned(col("stddev"), 4).as("stddev"))
        .orderBy("column")
    }),

    // Inverted-index build over the corpus: per-term exact df and
    // total tf, plus a bounded posting list (5 lowest doc ids).
    "q_inverted_index" -> ((s, dir) => {
      graft.ops.TfIdf.invertedIndex(
          Tables.documents(s, dir), "text", "doc_id", maxPostings = 5)
        .orderBy("term")
    }),

    // Referential-integrity audit: lineitems whose supplier vanished
    // (parent filtered to s_suppkey % 7 != 0) — per-key orphan counts.
    "q_orphans" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val sup = Tables.supplier(s, dir).filter(col("s_suppkey") % 7 =!= 0)
      graft.ops.Expectations.orphans(li, "l_suppkey", sup, "s_suppkey")
        .groupBy("l_suppkey")
        .agg(count(lit(1)).as("n"))
        .orderBy("l_suppkey")
    }),

    // Candidate-key audit: (l_partkey, l_suppkey) is NOT unique in
    // lineitem — the violation report carries each repeated pair.
    "q_unique_key" -> ((s, dir) => {
      graft.ops.Expectations.uniquenessViolations(
          Tables.lineitem(s, dir), Seq("l_partkey", "l_suppkey"))
        .orderBy("l_partkey", "l_suppkey")
    }),

    // VARIANT ingestion (Spark 4): semi-structured props parsed once
    // to VARIANT, typed field extraction downstream — the
    // shred-on-read path for schema-fluid columns (vs the fixed
    // from_json schema q_flatten_struct pins).
    "q_variant_extract" -> ((s, dir) => {
      Tables.events(s, dir).select("event_type", "props")
        .withColumn("__v", try_parse_json(col("props")))
        .select(col("event_type"),
          try_variant_get(col("__v"), "$.k", "int").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // Equi-depth user-value segmentation: per-user purchase spend
    // bucketed by the dataset's own spend tertiles — the data-driven
    // tier assignment beside q_histogram's fixed grid.
    "q_user_segments" -> ((s, dir) => {
      val spend = Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(roundPinned(sum("value"), 2).as("spend"),
          count(lit(1)).as("n_purchases"))
      Sketches.segmentByQuantiles(
          spend, col("spend"), Seq(1.0 / 3, 2.0 / 3),
          Seq("low", "mid", "high"))
        .orderBy("user_id")
    }),

    // Join-skew diagnostics: the 25 heaviest prospective keys of a
    // lineitem⋈orders join with per-side counts and exact inner-join
    // output estimates — the pre-join report that sizes salting.
    "q_join_skew" -> ((s, dir) => {
      graft.ops.Skew.joinKeyProfile(
          Tables.lineitem(s, dir), Tables.orders(s, dir),
          "l_orderkey", "o_orderkey", topK = 25)
        .orderBy(col("est_pairs").desc, col("key"))
    }),

    // Trailing-window anomaly detection over the dense 6-hour
    // per-type event series (X72 ∘ X77): each period scored against
    // the 28 periods before it; silent periods are zeros, which is
    // why the dense resample feeds it.
    "q_anomaly" -> ((s, dir) => {
      val series = graft.ops.EventAnalytics.resample(
          Tables.events(s, dir), "event_type", "ts", "value", "event_id",
          stepSeconds = 21600L)
        .select("event_type", "period_start", "n_events")
      graft.ops.EventAnalytics.anomalies(
          series, "event_type", "period_start", "n_events",
          trailing = 28, zThreshold = 3.0)
        .orderBy("event_type", "period_start")
    }),

    // Incremental aggregate maintenance: two disjoint halves of
    // lineitem fold into one gold state via mergeable partials —
    // merge(partials(A), partials(B)) ≡ partials(A ∪ B), which is
    // exactly what the full-recompute oracle checks.
    "q_incremental_agg" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val store = graft.ops.IncrementalAgg.partials(
        li.filter(col("l_orderkey") % 2 === 0),
        Seq("l_returnflag", "l_linestatus"), "l_quantity")
      val inc = graft.ops.IncrementalAgg.partials(
        li.filter(col("l_orderkey") % 2 === 1),
        Seq("l_returnflag", "l_linestatus"), "l_quantity")
      graft.ops.IncrementalAgg.finalize(
          graft.ops.IncrementalAgg.merge(store, inc))
        .select(col("l_returnflag"), col("l_linestatus"), col("n"),
          roundPinned(col("sum"), 2).as("sum_qty"), col("min").as("min_qty"),
          col("max").as("max_qty"), roundPinned(col("avg"), 4).as("avg_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // The multi-measure variant: quantity AND price maintained from
    // one pass per increment — gold tables track many measures
    // without multiplying scans.
    "q_incremental_agg_multi" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val measures = Seq("l_quantity", "l_extendedprice")
      val keys = Seq("l_returnflag", "l_linestatus")
      val store = graft.ops.IncrementalAgg.partialsMulti(
        li.filter(col("l_orderkey") % 2 === 0), keys, measures)
      val inc = graft.ops.IncrementalAgg.partialsMulti(
        li.filter(col("l_orderkey") % 2 === 1), keys, measures)
      graft.ops.IncrementalAgg.finalizeMulti(
          graft.ops.IncrementalAgg.mergeMulti(keys, measures, store, inc),
          measures)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity_n").as("qty_n"),
          roundPinned(col("l_quantity_sum"), 2).as("qty_sum"),
          roundPinned(col("l_quantity_avg"), 4).as("qty_avg"),
          col("l_extendedprice_n").as("price_n"),
          roundPinned(col("l_extendedprice_sum"), 2).as("price_sum"),
          col("l_extendedprice_min").as("price_min"),
          col("l_extendedprice_max").as("price_max"),
          roundPinned(col("l_extendedprice_avg"), 4).as("price_avg"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Semi-structured key census: which JSON keys appear in
    // events.props, per event_type — the shred-planning audit run
    // before declaring a VARIANT extraction schema.
    "q_props_keys" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"),
          explode(json_object_keys(col("props"))).as("key"))
        .groupBy("event_type", "key")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type", "key")
    }),

    // Deterministic k-per-group sample over documents by language.
    "q_sample_group" -> ((s, dir) => {
      Curation.samplePerGroup(
          Tables.documents(s, dir).select("doc_id", "lang"),
          "doc_id", "lang", k = 5, seed = 11L,
          hasher = TextAnalysis.h64)
        .orderBy("lang", "doc_id")
    }),

    // Range join: lineitem ship dates against 7-day promo windows
    // derived from a keyed subset of orders; per-promo aggregate.
    // Bin width = interval width, so each interval covers ≤ 2 bins.
    "q_range_join" -> ((s, dir) => {
      val promos = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 500 === 0)
        .select(
          col("o_orderkey").as("promo_id"),
          col("o_orderdate").as("promo_start"),
          (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("promo_end"))
      val pts = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_shipdate", "l_extendedprice")
      Joins.pointInIntervalJoin(
          pts, "l_shipdate", promos, "promo_start", "promo_end",
          Joins.timeBin(7L * 86400 * 1000000L))
        .groupBy("promo_id")
        .agg(
          count(lit(1)).as("n_ship"),
          roundPinned(sum("l_extendedprice"), 2).as("sum_price_r"))
        .orderBy("promo_id")
    }),

    // Z-order (Morton) layout key: the 10-bit lanes of two normalized
    // part/supplier coordinates interleaved into one curve position —
    // the multi-column clustering key a data-skipping write sorts by
    // (clusterByZOrder's range+sort is the write path; the key
    // arithmetic is what the oracle can replay).
    "q_zorder" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_partkey") % 1024).as("px"),
        (col("l_suppkey") % 1024).as("sx"))
      li.withColumn("zkey",
          graft.ops.Layout.zOrderKey(Seq(col("px"), col("sx")), bits = 10))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // PageRank (3 fixed iterations, d=0.85) over the customer↔supplier
    // trade graph (edges from lineitem⋈orders, suppliers offset into
    // a disjoint key space, reverse edges added so the walk is
    // recurrent). Ranks scale to parts-per-million before the
    // 4-decimal rounding so the cut sits ~7 digits above double-sum
    // noise.
    "q_pagerank" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val fwd = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("src"), (col("l_suppkey") + 1000000L).as("dst"))
      val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      // truncateEvery = 0: three fixed iterations plan as ONE job —
      // per-iteration materialization is pure scheduling overhead at
      // this depth (the 50-iteration cluster case keeps the default)
      graft.ops.Graph.pageRank(edges, "src", "dst", iterations = 3,
        truncateEvery = 0)
        .select(col("node"), roundPinned(col("rank") * 1000000, 4).as("rank_ppm"))
        .orderBy("node")
    }),

    // Interval-overlap join (per-user): each click opens a 2h window,
    // each purchase a 1h window; pairs whose windows overlap for the
    // same user. Bin width = the longer window, so either side covers
    // <= 2 bins; the same-user equi-key rides the bin join.
    "q_interval_overlap" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click").select(
        col("user_id"),
        col("event_id").as("click_id"),
        col("ts").as("c_lo"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("c_hi"))
      val purchases = ev.filter(col("event_type") === "purchase").select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("p_lo"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("p_hi"))
      Joins.intervalOverlapJoin(
          clicks, "c_lo", "c_hi", purchases, "p_lo", "p_hi",
          Joins.timeBin(2L * 3600 * 1000000L), extraKeys = Seq("user_id"))
        .select("user_id", "click_id", "purchase_id")
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    // Equi-width histogram of lineitem extended price: 22 buckets of
    // 5000 over [0, 110000) from one map-side-combined aggregation —
    // the distribution-shape profile beside q_profile's moments.
    "q_histogram" -> ((s, dir) => {
      graft.ops.Expectations.histogram(
          Tables.lineitem(s, dir), col("l_extendedprice"),
          lo = 0.0, hi = 110000.0, nBuckets = 22)
        .orderBy("bucket")
    }),

    // Corpus length distribution: X65's histogram pointed at per-doc
    // token counts — the "what sequence lengths will training see"
    // profile every data pipeline publishes.
    "q_length_histogram" -> ((s, dir) => {
      graft.ops.Expectations.histogram(
          Tables.documents(s, dir)
            .select(size(TextAnalysis.tokens(col("text"))).as("n_tokens")),
          col("n_tokens"), lo = 0.0, hi = 60.0, nBuckets = 12)
        .orderBy("bucket")
    }),

    // Feed-health audit of the event log: per-user event counts,
    // timestamp regressions against delivery order, largest
    // inter-event silence, and total span — the watermark-sizing
    // report a streaming consumer derives per batch.
    "q_feed_audit" -> ((s, dir) => {
      graft.ops.EventAnalytics.feedAudit(
          Tables.events(s, dir), "user_id", "ts", "event_id")
        .orderBy("user_id")
    }),

    // Time-series resample + forward fill: dense 6-hour spine per
    // user from first to last event, zero-filled counts, last
    // observation carried across silent periods.
    "q_resample" -> ((s, dir) => {
      graft.ops.EventAnalytics.resample(
          Tables.events(s, dir), "user_id", "ts", "value", "event_id",
          stepSeconds = 21600L)
        .orderBy("user_id", "period_start")
    }),

    // Vocabulary encoding: every doc's ordered token-id sequence
    // under the corpus top-50 vocab (X27), OOV as -1 — the
    // materialization step a training run consumes.
    "q_encode_tokens" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.encodeTokens(docs, "text", "doc_id",
          Curation.vocabulary(docs, "text", k = 50))
        .orderBy("doc_id")
    }),

    // Materialization composition (X68 ∘ X82): cap each source at its
    // token budget, then encode the surviving docs to ordered id
    // sequences under the FULL corpus's vocabulary (fixed before
    // budgeting, as a real pipeline freezes its tokenizer) — the
    // corpus → training-tensors endgame as ONE lazy plan.
    "q_materialize" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val kept = Curation.tokenBudget(
          docs.select("doc_id", "source", "text"),
          "text", "source", budgetTokens = 800L, orderCol = col("doc_id"))
        .filter(col("kept"))
        .select("doc_id", "text")
      TextAnalysis.encodeTokens(kept, "text", "doc_id",
          Curation.vocabulary(docs, "text", k = 50))
        .orderBy("doc_id")
    }),

    // Vocabulary-coverage audit: per-doc OOV rate against the
    // corpus's own top-50 vocabulary (X27) — the tokenizer-fit check.
    "q_oov_rate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TextAnalysis.oovRate(docs, "text", "doc_id",
          Curation.vocabulary(docs, "text", k = 50).select("token"))
        .orderBy("doc_id")
    }),

    // Benford first-digit audit over lineitem prices — the forensic
    // organic-data check (digit extracted from the integer's decimal
    // string, never via log10 on the data).
    "q_benford" -> ((s, dir) => {
      graft.ops.Expectations.benfordReport(
          Tables.lineitem(s, dir), col("l_extendedprice"))
        .orderBy("digit")
    }),

    // PSI drift report: full lineitem price distribution vs the
    // low-quantity slice, 22 buckets, Laplace-smoothed contributions
    // (sum(psi_contrib) is the PSI) — the retrain-gate drift check.
    "q_drift_psi" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      graft.ops.Expectations.psiReport(
          li, li.filter(col("l_quantity") <= 10), col("l_extendedprice"),
          lo = 0.0, hi = 110000.0, nBuckets = 22)
        .orderBy("bucket")
    }),

    // Bigram LM self-scoring: per-doc mean ln P(w2|w1) under the
    // corpus's own bigram model — the CCNet-class perplexity filter,
    // one order above q_unigram_logprob.
    "q_bigram_logprob" -> ((s, dir) => {
      TfIdf.bigramLogProb(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // X107 interpolated Kneser-Ney bigram scoring — the serious form
    // of q_bigram_logprob: absolute discount D=0.75 with the
    // continuation-count backoff, exactly normalized per context
    // (spec-pinned), so formulaic adjacency and one-off co-occurrence
    // separate where raw count ratios conflate them.
    "q_kn_logprob" -> ((s, dir) => {
      TfIdf.kneserNeyLogProb(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // DSIR-style importance weights: corpus docs scored by mean
    // unigram log-likelihood ratio against a target domain (source
    // src0), add-1 smoothed — the data-selection signal for
    // target-matched corpus sampling.
    "q_importance_weights" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TfIdf.importanceWeights(
          docs, docs.filter(col("source") === "src0"), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // KMV set-overlap estimation: how much of src1's token vocabulary
    // duplicates src0's, from two k=16 sketches — no distinct-join of
    // either corpus (the "does crawl B duplicate crawl A" question).
    "q_kmv_overlap" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      def sk(src: String) = Sketches.kmvSketch(
        d.filter(col("source") === src)
          .select(lit(1).as("g"),
            explode(TextAnalysis.tokens(col("text"))).as("tok")),
        Seq("g"), col("tok"), k = 16)
      Sketches.kmvOverlap(sk("src0"), sk("src1"), Seq("g"), k = 16)
        .drop("g")
    }),

    // KMV distinct-count sketch: estimated distinct users per
    // event_type from the 64 smallest md5-derived hashes.
    "q_kmv_distinct" -> ((s, dir) => {
      Sketches.kmvDistinct(
          Tables.events(s, dir), Seq("event_type"),
          col("user_id").cast("string"), k = 64)
        .orderBy("event_type")
    }),

    // X122 all-pairs source overlap matrix: one corpus pass builds a
    // per-source KMV token sketch; the 190 source pairs compare on
    // the broadcast k-hash rows only. The dedup-planning audit run
    // before deciding which sources to cross-dedup.
    "q_source_overlap" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      Sketches.kmvOverlapMatrix(tok, "source", col("tok"), k = overlapK)
        .orderBy("left_source", "right_source")
    }),

    // X114 HyperLogLog distinct tokens per language, with the exact
    // count beside it for an auditable error ratio. Registers come
    // from the md5-derived 60-bit hash (bucket = low 6 bits, ρ =
    // leading-zero rank of the top 54), so DuckDB replays sketch AND
    // estimate bit-exactly. No distinct pass anywhere in the sketch —
    // the shape that beats KMV when the value stream is huge.
    "q_hll_distinct" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val est = Sketches.hllDistinct(tok, Seq("lang"), col("tok"), b = hllB)
      val exact = tok.groupBy("lang")
        .agg(countDistinct(col("tok")).as("n_exact"))
      est.join(exact, Seq("lang"))
        .withColumn("err_ratio", roundPinned(col("est_distinct") / col("n_exact"), 4))
        .orderBy("lang")
    }),

    // X114 mergeability: sketches of the two doc_id-parity halves fold
    // via per-bucket max into EXACTLY the whole-corpus sketch — the
    // property that lets daily partials estimate the union without a
    // rescan. `lossless` replays the equality in both engines.
    "q_hll_merge" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      def tok(f: DataFrame) =
        f.select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val ska = Sketches.hllSketch(
        tok(d.filter(col("doc_id") % 2 === 0)), Seq("lang"), col("tok"), b = hllB)
      val skb = Sketches.hllSketch(
        tok(d.filter(col("doc_id") % 2 === 1)), Seq("lang"), col("tok"), b = hllB)
      val merged = Sketches.hllEstimate(
        Sketches.hllMerge(ska, skb, Seq("lang")), Seq("lang"), b = hllB)
      val whole = Sketches
        .hllDistinct(tok(d), Seq("lang"), col("tok"), b = hllB)
        .select(col("lang"), col("est_distinct").as("est_whole"))
      merged.join(whole, Seq("lang"))
        .withColumn("lossless", col("est_distinct") === col("est_whole"))
        .orderBy("lang")
    }),

    // X114 store lifecycle end-to-end (VERDICT r18 #6): build the
    // register base from one doc_id-residue third of the corpus, fold
    // the other two thirds in as committed increment GENERATIONS
    // (HllStore.append — cost ∝ increment, history never re-read),
    // then estimate FROM THE STORE. Per-register max makes the folded
    // store registers identical to a single whole-corpus sketch, so
    // DuckDB's one-pass HLL replay is the exact oracle for the whole
    // build → append → append → estimate composition. The store lives
    // in per-run scratch; the ≤ |langs| estimate rows are collected
    // (bounded by construction) so the scratch dir can be deleted
    // before the frame leaves this function.
    "q_hll_store" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      def tok(f: DataFrame) =
        f.select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      val scratch =
        java.nio.file.Files.createTempDirectory("graft_hll_store_").toString
      try {
        HllStore.build(s, tok(d.filter(col("doc_id") % 3 === 0)),
          Seq("lang"), col("tok"), scratch, b = hllB)
        HllStore.append(s, scratch,
          tok(d.filter(col("doc_id") % 3 === 1)), Seq("lang"), col("tok"))
        HllStore.append(s, scratch,
          tok(d.filter(col("doc_id") % 3 === 2)), Seq("lang"), col("tok"))
        val est = HllStore.estimate(s, scratch, Seq("lang")).orderBy("lang")
        val rows = est.collect()
        s.createDataFrame(
          new java.util.ArrayList(java.util.Arrays.asList(rows: _*)), est.schema)
          .orderBy("lang")
      } finally {
        val p = new org.apache.hadoop.fs.Path(scratch)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
        ()
      }
    }),

    // X119 freshness-decayed aggregates: per event type, value totals
    // under a stepped 7-day half-life (2^-k weights — dyadic-exact,
    // no transcendental cross-engine risk; quantized order-free sums).
    "q_decayed_agg" -> ((s, dir) => {
      EventAnalytics.decayedAgg(
          Tables.events(s, dir), Seq("event_type"), "ts", "value",
          halfLifeDays = decayHalfLifeDays)
        .orderBy("event_type")
    }),

    // X133 WOE/IV scorecard audit: how much purchase-signal the event
    // value carries, over 5 equi-depth buckets — smoothed shares, ln
    // replay, quantized-integer IV sum. The feature-screen every
    // quality-classifier training set should publish.
    "q_woe_iv" -> ((s, dir) => {
      FeatureEncode.woeIv(
          Tables.events(s, dir),
          col("value"), col("event_type") === "purchase",
          nBuckets = 5)
        .orderBy("segment")
    }),

    // X133 smoothed target-mean encoding (m-estimate, m=20): the
    // event-type → expected-value encoding table, rare categories
    // pulled toward the global mean. Quantized order-free sums.
    "q_target_encode" -> ((s, dir) => {
      FeatureEncode.targetEncode(
          Tables.events(s, dir), col("event_type"), col("value"))
        .orderBy("category")
    }),

    // X131 mergeable log-histogram quantiles: per event type, p50/p95/
    // p99 read back from the HDR-style integer-binned sketch, with the
    // exact percentile and relative error beside them for an auditable
    // accuracy row. Binning is bit-length arithmetic on the quantized
    // value (the HLL-rank trick) — no transcendental, every boundary
    // engine-exact.
    "q_hist_quantiles" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val qv = roundPinned(col("value").cast("double") * lit(1e6)).cast("long")
      val base = ev.filter(qv.isNotNull && qv >= 0)
      val hist = Sketches.logHistogram(base, Seq("event_type"), col("value"))
      val est = Sketches.histQuantiles(
        hist, Seq("event_type"), Seq(0.5, 0.95, 0.99))
      val v = col("value").cast("double")
      val ex = base.groupBy("event_type").agg(
        percentile(v, lit(0.5)).as("e1"),
        percentile(v, lit(0.95)).as("e2"),
        percentile(v, lit(0.99)).as("e3"))
      val exl = Seq((0.5, "e1"), (0.95, "e2"), (0.99, "e3")).map { case (p, c) =>
        ex.select(col("event_type"), lit(p).as("q"), col(c).as("exact"))
      }.reduce(_ unionByName _)
      est.join(exl, Seq("event_type", "q"))
        .select(col("event_type"), col("q"),
          roundPinned(col("est"), 6).as("est_r"),
          // + 0.0: a value in (-5e-7, 0) passes the quantized >= 0
          // filter as qv = 0 but keeps its negative raw x — the exact
          // percentile could then round to a signed zero that differs
          // across engines (the q_pca_whiten hazard class)
          (roundPinned(col("exact"), 4)).as("exact_r"),
          roundPinned(when(col("exact") === 0.0, lit(null))
            .otherwise(abs(col("est") - col("exact")) / col("exact")), 4)
            .as("rel_err_r"))
        .orderBy("event_type", "q")
    }),

    // X118 robust stats: per event type, median / MAD / robust-z
    // outlier count over the value column — the feature-QA audit a
    // unit-change bug trips where classical stddev absorbs it.
    "q_robust_stats" -> ((s, dir) => {
      Sketches.robustStats(
          Tables.events(s, dir), Seq("event_type"), col("value"),
          nSigmas = robustSigmas)
        .orderBy("event_type")
    }),

    // X118 winsorization: customer balances clipped to their nation's
    // own [5%, 95%] exact quantiles — row-count-preserving tail
    // taming for features/scores (unlike trimming).
    "q_winsorize" -> ((s, dir) => {
      Sketches.winsorize(
          Tables.customer(s, dir)
            .select("c_custkey", "c_nationkey", "c_acctbal"),
          Seq("c_nationkey"), col("c_acctbal"),
          pLow = winsorLow, pHigh = winsorHigh, outCol = "bal_w")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          roundPinned(col("bal_w"), 4).as("bal_w"))
        .orderBy("c_custkey")
    }),

    // CountMin heavy hitters over document tokens (d=3 rows × w=256
    // buckets), top 20 by estimated count.
    "q_cms_topk" -> ((s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      Sketches.countMinTopK(
        tok, col("tok"), tok.select(col("tok").as("item")), k = 20)
    }),

    // Exact interpolated quantiles of event value per type (the
    // oracle-reproducible path; approx_percentile is the scale path).
    "q_quantiles" -> ((s, dir) => {
      Sketches.quantiles(
          Tables.events(s, dir), Seq("event_type"), col("value"),
          Seq(0.5, 0.9, 0.99))
        .orderBy("event_type")
    }),

    // Per-doc top-3 TF-IDF terms (scores rounded before ranking so
    // the cut is reproducible across engines).
    "q_tfidf_topk" -> ((s, dir) => {
      TfIdf.topTerms(Tables.documents(s, dir), "text", "doc_id", topK = 3)
        .orderBy("doc_id", "rk")
    }),

    // Mean unigram log-probability of each doc under the corpus's own
    // unigram model.
    "q_unigram_logprob" -> ((s, dir) => {
      TfIdf.unigramLogProb(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("doc_id")
    }),

    // Per-label embedding centroids (mean pooling) in long form.
    "q_embedding_centroids" -> ((s, dir) => {
      graft.ops.Similarity.labelCentroids(
          Tables.embeddings(s, dir), "vec_id", "label", "embedding")
        .orderBy("label", "dim")
    }),

    // The custom Catalyst kernels through the SQL surface: register
    // via GraftFunctions (same triples SparkSessionExtensions
    // injects) and call them from spark.sql — proving the
    // FunctionRegistry path end-to-end against the composed-form
    // oracle.
    "q_sql_kernels" -> ((s, dir) => {
      graft.functions.GraftFunctions.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("graft_documents")
      Tables.embeddings(s, dir).createOrReplaceTempView("graft_embeddings")
      // graft_matvec_dots takes a foldable matrix literal (here 2×3 —
      // the kernel dots against the first 3 vector dims); decimal SQL
      // literals are cast to double by the registration builder.
      s.sql(
        """SELECT d.doc_id,
          |  graft_md5_long(d.text, 15) AS text_h,
          |  round(graft_cosine(e.embedding, e2.embedding), 4) AS cos_next,
          |  round(element_at(graft_matvec_dots(e.embedding,
          |    array(array(1.0, -2.0, 0.5), array(0.25, 0.0, -1.0))), 1), 4) AS mv1,
          |  round(element_at(graft_matvec_dots(e.embedding,
          |    array(array(1.0, -2.0, 0.5), array(0.25, 0.0, -1.0))), 2), 4) AS mv2
          |FROM graft_documents d
          |JOIN graft_embeddings e ON e.vec_id = d.doc_id
          |JOIN graft_embeddings e2 ON e2.vec_id = d.doc_id + 1
          |ORDER BY d.doc_id""".stripMargin)
    })
  )

  /** Unrolled fixed-iteration PageRank oracle over the same
    * customer↔supplier edge construction as q_pagerank: r0 = 1/N,
    * each r_{i+1} one join+sum over r_i — DuckDB replays the exact
    * synchronous-update arithmetic.
    */
  private def pageRankOracle(iterations: Int, damping: Double): String = {
    val base =
      s"""WITH e0 AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + 1000000 AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |), e AS (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)
         |), nodes AS (
         |  SELECT src AS node FROM e UNION SELECT dst FROM e
         |), nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)""".stripMargin
    val iters = (1 to iterations).map { i =>
      s""", r$i AS (
         |  SELECT nd.node,
         |    ${1.0 - damping} / (SELECT n FROM nn)
         |      + $damping * coalesce(s.m, 0) AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / d.deg) AS m
         |    FROM e JOIN r${i - 1} r ON r.node = e.src
         |    JOIN deg d ON d.node = e.src
         |    GROUP BY 1) s ON s.node = nd.node
         |)""".stripMargin
    }.mkString
    base + iters +
      s"""
         |SELECT node, round(rank * 1000000, 4) AS rank_ppm
         |FROM r$iterations ORDER BY node""".stripMargin
  }

  /** A double literal DuckDB parses directly AS DOUBLE (bare decimals
    * route through DECIMAL and can land 1 ulp off the JVM value —
    * see the PCA oracle's discovery in MiningQueries.sqlDouble). */
  private def hllLit(x: Double): String = {
    val r = x.toString
    if (r.contains("E") || r.contains("e")) r else r + "e0"
  }

  /** X114 oracle pieces — each mirrors one stage of
    * [[graft.ops.Sketches.hllSketch]]/[[graft.ops.Sketches.hllEstimate]]
    * with the identical operation order. `m = 2^hllB` buckets,
    * `W = 60 − hllB` rank bits, `unit = 2^(W+1)` (the ρ=0 register
    * contribution, so the register sum stays in exact integer space).
    */
  private def hllRegSql(tokCte: String): String = {
    val m = 1 << hllB
    val wp1 = 60 - hllB + 1
    s"""
       |  SELECT lang, (h % $m)::INTEGER AS bucket,
       |    max(CASE WHEN h // $m = 0 THEN $wp1
       |             ELSE $wp1 - length(bin(h // $m)) END)::INTEGER AS r
       |  FROM (SELECT lang, ('0x' || substr(md5('hll|' || tok), 1, 15))::BIGINT AS h
       |        FROM $tokCte)
       |  GROUP BY 1, 2""".stripMargin
  }

  private def hllSumSql(regCte: String): String = {
    val unit = 1L << (60 - hllB + 1)
    s"""
       |  SELECT lang, count(*)::INTEGER AS n_present,
       |    sum(CAST($unit AS BIGINT) >> r)::BIGINT AS qsum
       |  FROM $regCte GROUP BY 1""".stripMargin
  }

  private def hllFinSql(estCte: String): String = {
    val m = 1 << hllB
    val unit = 1L << (60 - hllB + 1)
    val alpha = hllLit(Sketches.hllAlpha(m))
    s"""
       |  SELECT lang, n_present,
       |    round(CASE WHEN raw <= ${hllLit(2.5 * m)} AND v > 0
       |               THEN $m * ln(${hllLit(m.toDouble)} / v) ELSE raw END, 4) AS est_distinct
       |  FROM (SELECT lang, n_present,
       |          $alpha * $m * $m
       |            / (($m - n_present)::DOUBLE + qsum::DOUBLE / ${hllLit(unit.toDouble)}) AS raw,
       |          $m - n_present AS v
       |        FROM $estCte)""".stripMargin
  }

  private def hllOracleCtes(tokSelect: String): String =
    s"""WITH tok AS (
       |  $tokSelect
       |), reg AS (${hllRegSql("tok")}
       |), est AS (${hllSumSql("reg")}
       |), ed AS (${hllFinSql("est")}
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH v AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts,
        |         max(event_id) AS view_event_id,
        |         arg_max(value, event_id) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |), p AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |       v.ts AS last_ts, v.view_event_id AS last_view_event_id,
        |       v.view_value AS last_view_value
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_asof_forward" ->
      """WITH v AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts,
        |         max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2
        |), p AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, p.ts,
        |       v.ts AS next_ts, v.view_event_id AS next_view_event_id
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts <= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_attribution" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
        |  FROM events WHERE event_type = 'purchase'
        |), v AS (
        |  SELECT event_id, user_id, ts::TIMESTAMP AS ts, value
        |  FROM events WHERE event_type = 'view'
        |)
        |SELECT p.event_id, p.user_id, p.ts,
        |       v.event_id AS matched_event_id, v.ts AS matched_ts,
        |       v.value AS matched_value
        |FROM p LEFT JOIN v
        |  ON v.user_id = p.user_id
        | AND v.ts <= p.ts
        | AND v.ts >= p.ts - INTERVAL 30 MINUTE
        |ORDER BY p.event_id, matched_event_id NULLS FIRST""".stripMargin,
    "q_funnel" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2
        |), s4 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3 THEN ts END)
        |    OVER (PARTITION BY user_id) AS t4 FROM s3
        |), u AS (
        |  SELECT user_id, min(t1) AS t1, min(t2) AS t2,
        |         min(t3) AS t3, min(t4) AS t4
        |  FROM s4 GROUP BY 1
        |)
        |SELECT step, step_name, count(*) AS entities FROM (
        |  SELECT 1 AS step, 'signup' AS step_name, t1 AS t FROM u
        |  UNION ALL SELECT 2, 'view', t2 FROM u
        |  UNION ALL SELECT 3, 'click', t3 FROM u
        |  UNION ALL SELECT 4, 'purchase', t4 FROM u
        |) WHERE t IS NOT NULL
        |GROUP BY step, step_name ORDER BY step""".stripMargin,
    "q_funnel_gated" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'signup' THEN ts END)
        |    OVER (PARTITION BY user_id) AS t1 FROM e
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' AND ts > t1
        |      AND ts <= t1 + INTERVAL 259200 SECOND THEN ts END)
        |    OVER (PARTITION BY user_id) AS t2 FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t2
        |      AND ts <= t2 + INTERVAL 259200 SECOND THEN ts END)
        |    OVER (PARTITION BY user_id) AS t3 FROM s2
        |), s4 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t3
        |      AND ts <= t3 + INTERVAL 259200 SECOND THEN ts END)
        |    OVER (PARTITION BY user_id) AS t4 FROM s3
        |), u AS (
        |  SELECT user_id, min(t1) AS t1, min(t2) AS t2,
        |         min(t3) AS t3, min(t4) AS t4
        |  FROM s4 GROUP BY 1
        |)
        |SELECT step, step_name, count(*) AS entities FROM (
        |  SELECT 1 AS step, 'signup' AS step_name, t1 AS t FROM u
        |  UNION ALL SELECT 2, 'view', t2 FROM u
        |  UNION ALL SELECT 3, 'click', t3 FROM u
        |  UNION ALL SELECT 4, 'purchase', t4 FROM u
        |) WHERE t IS NOT NULL
        |GROUP BY step, step_name ORDER BY step""".stripMargin,
    "q_funnel_sessions" ->
      """WITH o AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |         lag(ts::TIMESTAMP) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev
        |  FROM events
        |), sess AS (
        |  SELECT user_id || '#' || sum(CASE WHEN prev IS NULL
        |        OR ts - prev > INTERVAL 1800 SECOND THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_key,
        |    ts, event_id, event_type
        |  FROM o
        |), s1 AS (
        |  SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
        |    OVER (PARTITION BY session_key) AS t1 FROM sess
        |), s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1 THEN ts END)
        |    OVER (PARTITION BY session_key) AS t2 FROM s1
        |), s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2 THEN ts END)
        |    OVER (PARTITION BY session_key) AS t3 FROM s2
        |), u AS (
        |  SELECT session_key, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
        |  FROM s3 GROUP BY 1
        |)
        |SELECT step, step_name, count(*) AS entities FROM (
        |  SELECT 1 AS step, 'view' AS step_name, t1 AS t FROM u
        |  UNION ALL SELECT 2, 'click', t2 FROM u
        |  UNION ALL SELECT 3, 'purchase', t3 FROM u
        |) WHERE t IS NOT NULL
        |GROUP BY step, step_name ORDER BY step""".stripMargin,
    "q_retention" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts FROM events
        |), f AS (
        |  SELECT *, min(ts) OVER (PARTITION BY user_id) AS first_ts FROM e
        |), d AS (
        |  SELECT DISTINCT user_id,
        |         date_trunc('week', first_ts)::DATE AS cohort_week,
        |         date_trunc('week', ts)::DATE AS event_week
        |  FROM f
        |)
        |SELECT cohort_week,
        |       (datediff('day', cohort_week, event_week) / 7)::INT AS week_offset,
        |       count(*) AS users
        |FROM d GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q_event_paths" ->
      """WITH o AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type,
        |         lag(ts::TIMESTAMP) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev
        |  FROM events
        |), s AS (
        |  SELECT *, sum(CASE WHEN prev IS NULL
        |        OR ts - prev > INTERVAL 1800 SECOND THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_idx
        |  FROM o
        |), p AS (
        |  SELECT user_id, session_idx,
        |         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM s GROUP BY 1, 2
        |)
        |SELECT path, count(*) AS sessions FROM p GROUP BY 1
        |ORDER BY sessions DESC, path LIMIT 15""".stripMargin,
    "q_cdc_apply" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |), base AS (
        |  SELECT * FROM o WHERE o_orderkey % 3 <> 0
        |), c1 AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice,
        |         o_orderstatus, 1 AS version, 'U' AS op
        |  FROM o WHERE o_orderkey % 2 = 0
        |), c2 AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 3 AS o_totalprice,
        |         o_orderstatus, 2 AS version,
        |         CASE WHEN o_orderkey % 8 = 0 THEN 'D' ELSE 'U' END AS op
        |  FROM o WHERE o_orderkey % 4 = 0
        |), ch AS (
        |  SELECT * FROM c1 UNION ALL SELECT * FROM c2
        |), latest AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |      ORDER BY version DESC) AS rn FROM ch
        |  ) WHERE rn = 1
        |)
        |SELECT b.o_orderkey, b.o_custkey, b.o_totalprice, b.o_orderstatus
        |FROM base b WHERE NOT EXISTS (
        |  SELECT 1 FROM latest l WHERE l.o_orderkey = b.o_orderkey)
        |UNION ALL
        |SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        |FROM latest WHERE op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    "q_scd2" ->
      """WITH e AS (
        |  SELECT user_id, ts::TIMESTAMP AS ts, event_id, event_type FROM events
        |), c AS (
        |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev
        |  FROM e
        |), ep AS (
        |  SELECT user_id, event_type, event_id, ts AS valid_from
        |  FROM c WHERE prev IS NULL OR prev <> event_type
        |), ranged AS (
        |  SELECT user_id, event_type, valid_from,
        |         lead(valid_from) OVER (PARTITION BY user_id
        |           ORDER BY valid_from, event_id) AS valid_to
        |  FROM ep
        |)
        |SELECT user_id, event_type, valid_from, valid_to,
        |       valid_to IS NULL AS is_current
        |FROM ranged
        |ORDER BY user_id, valid_from, event_type, valid_to NULLS FIRST""".stripMargin,
    "q_sliding_agg" ->
      """WITH e AS (
        |  SELECT ts::TIMESTAMP AS ts, value,
        |         CAST(floor(epoch(ts::TIMESTAMP) / 1800) AS BIGINT) * 1800 AS slide0
        |  FROM events
        |), x AS (
        |  SELECT ts, value,
        |         TIMESTAMP '1970-01-01'
        |           + (slide0 - k.k * 1800) * INTERVAL 1 SECOND AS w_start
        |  FROM e, (SELECT unnest([0, 1, 2, 3]) AS k) k
        |)
        |SELECT w_start, w_start + INTERVAL 7200 SECOND AS w_end,
        |       count(*) AS n_events,
        |       round(sum(value), 2) AS total_value
        |FROM x GROUP BY 1
        |ORDER BY w_start""".stripMargin,
    "q_expectations" ->
      """WITH t AS (SELECT count(*) AS total FROM lineitem)
        |SELECT 'quantity_1_50' AS rule,
        |  (SELECT count(*) FROM lineitem
        |   WHERE NOT coalesce(l_quantity >= 1 AND l_quantity <= 50, FALSE)) AS violations,
        |  total FROM t
        |UNION ALL
        |SELECT 'discount_0_008',
        |  (SELECT count(*) FROM lineitem
        |   WHERE NOT coalesce(l_discount >= 0 AND l_discount <= 0.08, FALSE)),
        |  total FROM t
        |UNION ALL
        |SELECT 'shipdate_not_null',
        |  (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL),
        |  total FROM t
        |UNION ALL
        |SELECT 'price_positive',
        |  (SELECT count(*) FROM lineitem
        |   WHERE NOT coalesce(l_extendedprice > 0, FALSE)),
        |  total FROM t
        |ORDER BY rule""".stripMargin,
    "q_orphans" ->
      """SELECT l_suppkey, count(*) AS n
        |FROM lineitem
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM supplier
        |  WHERE s_suppkey % 7 <> 0 AND s_suppkey = l_suppkey)
        |GROUP BY 1 ORDER BY l_suppkey""".stripMargin,
    "q_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS "column", count($c)::BIGINT AS n,
           |  (count(*) - count($c))::BIGINT AS n_null,
           |  min($c)::DOUBLE AS min, max($c)::DOUBLE AS max,
           |  round(avg($c), 4) AS mean,
           |  round(stddev_samp($c), 4) AS stddev
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    },
    "q_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents
        |), perdoc AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
        |), stats AS (
        |  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS tf_total
        |  FROM perdoc GROUP BY 1
        |), ranked AS (
        |  SELECT doc_id, term,
        |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rk
        |  FROM perdoc
        |), posts AS (
        |  SELECT term,
        |    string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
        |  FROM ranked WHERE rk <= 5 GROUP BY term
        |)
        |SELECT term, df, tf_total, postings
        |FROM stats JOIN posts USING (term) ORDER BY term""".stripMargin,
    "q_unique_key" ->
      """SELECT l_partkey, l_suppkey, count(*) AS n
        |FROM lineitem GROUP BY 1, 2 HAVING count(*) > 1
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q_variant_extract" ->
      """SELECT event_type,
        |  count(CAST(props::JSON ->> 'k' AS INTEGER)) AS n_k,
        |  CAST(sum(CAST(props::JSON ->> 'k' AS INTEGER)) AS BIGINT) AS sum_k,
        |  CAST(max(CAST(props::JSON ->> 'k' AS INTEGER)) AS INTEGER) AS max_k
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_sample_group" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      ('0x' || substr(md5('11|' || doc_id::VARCHAR), 1, 15))::BIGINT,
        |      doc_id) AS rk
        |  FROM documents
        |)
        |SELECT doc_id, lang FROM r WHERE rk <= 5
        |ORDER BY lang, doc_id""".stripMargin,
    "q_range_join" ->
      """WITH promo AS (
        |  SELECT o_orderkey AS promo_id, o_orderdate AS promo_start,
        |         o_orderdate + INTERVAL 7 DAY AS promo_end
        |  FROM orders WHERE o_orderkey % 500 = 0
        |)
        |SELECT promo_id, count(*) AS n_ship,
        |       round(sum(l_extendedprice), 2) AS sum_price_r
        |FROM lineitem l JOIN promo p
        |  ON l.l_shipdate >= p.promo_start AND l.l_shipdate < p.promo_end
        |GROUP BY 1 ORDER BY promo_id""".stripMargin,
    "q_pagerank" -> pageRankOracle(iterations = 3, damping = 0.85),
    "q_zorder" -> {
      // bit i of column j lands at curve position i*2 + j (LSB-first)
      val terms = for {
        (c, j) <- Seq("px", "sx").zipWithIndex
        i <- 0 until 10
      } yield s"((($c >> $i) & 1) * ${1L << (i * 2 + j)})"
      s"""WITH t AS (
         |  SELECT l_orderkey, l_linenumber,
         |    l_partkey % 1024 AS px, l_suppkey % 1024 AS sx
         |  FROM lineitem
         |)
         |SELECT l_orderkey, l_linenumber, px, sx,
         |  ${terms.mkString(" + ")} AS zkey
         |FROM t ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "q_interval_overlap" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, ts AS c_lo,
        |         ts + INTERVAL 2 HOUR AS c_hi
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, event_id AS purchase_id, ts AS p_lo,
        |         ts + INTERVAL 1 HOUR AS p_hi
        |  FROM events WHERE event_type = 'purchase'
        |)
        |SELECT c.user_id, click_id, purchase_id
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND c.c_lo < p.p_hi AND p.p_lo < c.c_hi
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "q_length_histogram" ->
      """WITH t AS (
        |  SELECT len(string_split(lower(text), ' '))::BIGINT AS n_tokens FROM documents
        |), b AS (
        |  SELECT least(greatest(CAST(floor((n_tokens::DOUBLE - 0.0) * 12 / 60.0) AS BIGINT), 0), 11) AS bucket
        |  FROM t WHERE n_tokens IS NOT NULL
        |)
        |SELECT bucket,
        |  round(0.0 + (bucket * 60.0) / 12, 6) AS bucket_lo,
        |  round(0.0 + ((bucket + 1) * 60.0) / 12, 6) AS bucket_hi,
        |  count(*) AS n
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_histogram" ->
      """WITH b AS (
        |  SELECT least(greatest(CAST(floor((l_extendedprice::DOUBLE - 0.0) * 22 / 110000.0) AS BIGINT), 0), 21) AS bucket
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |)
        |SELECT bucket,
        |  round(0.0 + (bucket * 110000.0) / 22, 6) AS bucket_lo,
        |  round(0.0 + ((bucket + 1) * 110000.0) / 22, 6) AS bucket_hi,
        |  count(*) AS n
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_feed_audit" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us FROM events
        |), f AS (
        |  SELECT user_id, us,
        |         lag(us) OVER (PARTITION BY user_id ORDER BY event_id) AS pus
        |  FROM e
        |)
        |SELECT user_id, count(*) AS n_events,
        |  count(*) FILTER (WHERE us < pus) AS n_out_of_order,
        |  coalesce(max((us - pus)::DOUBLE / 1000000), 0.0) AS max_gap_seconds,
        |  (max(us) - min(us))::DOUBLE / 1000000 AS span_seconds
        |FROM f GROUP BY 1 ORDER BY user_id""".stripMargin,
    "q_user_segments" ->
      """WITH spend AS (
        |  SELECT user_id, round(sum(value), 2) AS spend, count(*) AS n_purchases
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), cuts AS (
        |  SELECT round(quantile_cont(spend, 1.0/3), 4) AS q_0,
        |         round(quantile_cont(spend, 2.0/3), 4) AS q_1
        |  FROM spend
        |)
        |SELECT user_id, spend, n_purchases,
        |  CASE WHEN spend <= q_0 THEN 'low'
        |       WHEN spend <= q_1 THEN 'mid'
        |       ELSE 'high' END AS segment
        |FROM spend CROSS JOIN cuts ORDER BY user_id""".stripMargin,
    "q_join_skew" ->
      """WITH lc AS (
        |  SELECT l_orderkey AS key, count(*) AS n_left FROM lineitem GROUP BY 1
        |), rc AS (
        |  SELECT o_orderkey AS key, count(*) AS n_right FROM orders GROUP BY 1
        |)
        |SELECT coalesce(lc.key, rc.key) AS key,
        |  coalesce(n_left, 0) AS n_left, coalesce(n_right, 0) AS n_right,
        |  coalesce(n_left, 0) * coalesce(n_right, 0) AS est_pairs
        |FROM lc FULL JOIN rc ON lc.key = rc.key
        |ORDER BY est_pairs DESC, key LIMIT 25""".stripMargin,
    "q_anomaly" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts::TIMESTAMP) AS us FROM events
        |), p AS (
        |  SELECT event_type, (us // 21600000000) * 21600000000 AS period_us FROM e
        |), agg AS (
        |  SELECT event_type, period_us, count(*) AS n FROM p GROUP BY 1, 2
        |), bounds AS (
        |  SELECT event_type, min(period_us) AS lo, max(period_us) AS hi FROM p GROUP BY 1
        |), spine AS (
        |  SELECT event_type, unnest(generate_series(lo, hi, 21600000000)) AS period_us
        |  FROM bounds
        |), s AS (
        |  SELECT sp.event_type, sp.period_us, coalesce(a.n, 0) AS n_events
        |  FROM spine sp
        |  LEFT JOIN agg a ON sp.event_type = a.event_type AND sp.period_us = a.period_us
        |), z AS (
        |  SELECT event_type, period_us, n_events,
        |    round(avg(n_events::DOUBLE) OVER w, 4) AS trailing_mean,
        |    round((n_events::DOUBLE - avg(n_events::DOUBLE) OVER w)
        |          / nullif(stddev_samp(n_events::DOUBLE) OVER w, 0), 4) AS z
        |  FROM s
        |  WINDOW w AS (PARTITION BY event_type ORDER BY period_us
        |               ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT event_type, make_timestamp(period_us) AS period_start, n_events,
        |  trailing_mean, z, coalesce(abs(z) > 3.0, false) AS is_anomaly
        |FROM z ORDER BY event_type, period_start""".stripMargin,
    "q_incremental_agg" ->
      """SELECT l_returnflag, l_linestatus, count(l_quantity) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  round(sum(l_quantity) / count(l_quantity), 4) AS avg_qty
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_incremental_agg_multi" ->
      """SELECT l_returnflag, l_linestatus,
        |  count(l_quantity) AS qty_n,
        |  round(sum(l_quantity), 2) AS qty_sum,
        |  round(sum(l_quantity) / count(l_quantity), 4) AS qty_avg,
        |  count(l_extendedprice) AS price_n,
        |  round(sum(l_extendedprice), 2) AS price_sum,
        |  min(l_extendedprice) AS price_min,
        |  max(l_extendedprice) AS price_max,
        |  round(sum(l_extendedprice) / count(l_extendedprice), 4) AS price_avg
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_props_keys" ->
      """WITH k AS (
        |  SELECT event_type, unnest(json_keys(props)) AS key FROM events
        |)
        |SELECT event_type, key, count(*) AS n
        |FROM k GROUP BY 1, 2 ORDER BY event_type, key""".stripMargin,
    "q_resample" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts::TIMESTAMP) AS us, value, event_id FROM events
        |), p AS (
        |  SELECT user_id, (us // 21600000000) * 21600000000 AS period_us,
        |         us, value, event_id
        |  FROM e
        |), agg AS (
        |  SELECT user_id, period_us, count(*) AS n_events FROM p GROUP BY 1, 2
        |), rk AS (
        |  SELECT user_id, period_us, value,
        |         row_number() OVER (PARTITION BY user_id, period_us
        |                            ORDER BY us DESC, event_id DESC) AS r
        |  FROM p
        |), lastv AS (
        |  SELECT user_id, period_us, value AS lv FROM rk WHERE r = 1
        |), bounds AS (
        |  SELECT user_id, min(period_us) AS lo, max(period_us) AS hi FROM p GROUP BY 1
        |), spine AS (
        |  SELECT user_id, unnest(generate_series(lo, hi, 21600000000)) AS period_us
        |  FROM bounds
        |), j AS (
        |  SELECT s.user_id, s.period_us, coalesce(a.n_events, 0) AS n_events, l.lv
        |  FROM spine s
        |  LEFT JOIN agg a ON s.user_id = a.user_id AND s.period_us = a.period_us
        |  LEFT JOIN lastv l ON s.user_id = l.user_id AND s.period_us = l.period_us
        |)
        |SELECT user_id, make_timestamp(period_us) AS period_start, n_events,
        |  lv AS last_value,
        |  last_value(lv IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY period_us) AS filled_value
        |FROM j ORDER BY user_id, period_start""".stripMargin,
    "q_materialize" ->
      """WITH t AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS toks FROM documents
        |), cum AS (
        |  SELECT doc_id, toks,
        |    CAST(sum(len(toks)) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t
        |), kept AS (
        |  SELECT doc_id, toks FROM cum WHERE cum_tokens <= 800
        |), tok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
        |), freq AS (
        |  SELECT token, count(*) AS freq FROM tok WHERE token <> '' GROUP BY 1
        |), vocab AS (
        |  SELECT token, row_number() OVER (ORDER BY freq DESC, token) AS rank
        |  FROM freq ORDER BY freq DESC, token LIMIT 50
        |), x AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM kept
        |), j AS (
        |  SELECT x.doc_id, x.i, coalesce(v.rank, -1)::BIGINT AS tid
        |  FROM x LEFT JOIN vocab v ON v.token = x.toks[x.i]
        |)
        |SELECT doc_id,
        |  string_agg(tid::VARCHAR, ',' ORDER BY i) AS ids,
        |  count(*) AS n_tokens,
        |  count(*) FILTER (WHERE tid = -1) AS n_oov
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q_encode_tokens" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
        |), freq AS (
        |  SELECT token, count(*) AS freq FROM tok WHERE token <> '' GROUP BY 1
        |), vocab AS (
        |  SELECT token, row_number() OVER (ORDER BY freq DESC, token) AS rank
        |  FROM freq ORDER BY freq DESC, token LIMIT 50
        |), t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), x AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks))) AS i, toks FROM t
        |), j AS (
        |  SELECT x.doc_id, x.i, coalesce(v.rank, -1)::BIGINT AS tid
        |  FROM x LEFT JOIN vocab v ON v.token = x.toks[x.i]
        |)
        |SELECT doc_id,
        |  string_agg(tid::VARCHAR, ',' ORDER BY i) AS ids,
        |  count(*) AS n_tokens,
        |  count(*) FILTER (WHERE tid = -1) AS n_oov
        |FROM j GROUP BY 1 ORDER BY doc_id""".stripMargin,
    "q_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
        |), freq AS (
        |  SELECT token, count(*) AS freq FROM tok WHERE token <> '' GROUP BY 1
        |), vocab AS (
        |  SELECT token FROM freq ORDER BY freq DESC, token LIMIT 50
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        |  count(*) FILTER (WHERE v.token IS NULL) AS n_oov,
        |  round(count(*) FILTER (WHERE v.token IS NULL)::DOUBLE / count(*), 4) AS oov_rate
        |FROM tok LEFT JOIN vocab v ON tok.token = v.token
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin,
    "q_range_frame" ->
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 2)
        |    AS trailing_1h
        |FROM events ORDER BY event_id""".stripMargin,
    "q_benford" ->
      """WITH d AS (
        |  SELECT CAST(substr(CAST(CAST(floor(abs(l_extendedprice::DOUBLE)) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
        |  FROM lineitem
        |  WHERE CAST(floor(abs(l_extendedprice::DOUBLE)) AS BIGINT) >= 1
        |), c AS (
        |  SELECT digit, count(*) AS n FROM d GROUP BY 1
        |), t AS (
        |  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS tt FROM c
        |)
        |SELECT digit, n,
        |  round(n::DOUBLE / tt, 4) AS actual_frac,
        |  round(log10(1.0 + 1.0 / digit), 4) AS expected_frac,
        |  round(abs(round(n::DOUBLE / tt, 4) - round(log10(1.0 + 1.0 / digit), 4)), 4) AS deviation
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,
    "q_drift_psi" ->
      """WITH he AS (
        |  SELECT least(greatest(CAST(floor((l_extendedprice::DOUBLE - 0.0) * 22 / 110000.0) AS BIGINT), 0), 21) AS bucket,
        |         count(*) AS ne
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
        |), ha AS (
        |  SELECT least(greatest(CAST(floor((l_extendedprice::DOUBLE - 0.0) * 22 / 110000.0) AS BIGINT), 0), 21) AS bucket,
        |         count(*) AS na
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL AND l_quantity <= 10 GROUP BY 1
        |), spine AS (
        |  SELECT unnest(generate_series(0, 21))::BIGINT AS bucket
        |), tot AS (
        |  SELECT (SELECT count(l_extendedprice) FROM lineitem) AS te,
        |         (SELECT count(l_extendedprice) FROM lineitem WHERE l_quantity <= 10) AS ta
        |)
        |SELECT bucket, coalesce(ne, 0) AS n_expected, coalesce(na, 0) AS n_actual,
        |  round(((coalesce(ne, 0) + 1)::DOUBLE / (te + 22) - (coalesce(na, 0) + 1)::DOUBLE / (ta + 22))
        |        * ln(((coalesce(ne, 0) + 1)::DOUBLE / (te + 22))
        |             / ((coalesce(na, 0) + 1)::DOUBLE / (ta + 22))), 6) AS psi_contrib
        |FROM spine LEFT JOIN he USING (bucket) LEFT JOIN ha USING (bucket) CROSS JOIN tot
        |ORDER BY bucket""".stripMargin,
    "q_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), x AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i, toks FROM t
        |), bg AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i] || ' ' || toks[i + 1] AS bigram FROM x
        |), c2 AS (
        |  SELECT bigram, count(*) AS c2 FROM bg GROUP BY 1
        |), c1 AS (
        |  SELECT w1, count(*) AS c1 FROM bg GROUP BY 1
        |)
        |SELECT doc_id, round(avg(ln(c2.c2::DOUBLE / c1.c1)), 4) AS avg_logprob,
        |       count(*) AS n_bigrams
        |FROM bg JOIN c2 USING (bigram) JOIN c1 USING (w1)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_kn_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
        |), x AS (
        |  SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i, toks FROM t
        |), bg AS (
        |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM x
        |), pc AS (
        |  SELECT w1, w2, count(*)::BIGINT AS c2 FROM bg GROUP BY 1, 2
        |), pre AS (
        |  SELECT w1, sum(c2)::BIGINT AS c1, count(*)::BIGINT AS n1f FROM pc GROUP BY 1
        |), cont AS (
        |  SELECT w2, count(*)::BIGINT AS n1r FROM pc GROUP BY 1
        |), tot AS (
        |  SELECT count(*)::BIGINT AS t FROM pc
        |)
        |SELECT doc_id,
        |  round(avg(ln((greatest(c2::DOUBLE - 0.75, 0.0)
        |    + 0.75 * n1f::DOUBLE * (n1r::DOUBLE / t::DOUBLE)) / c1::DOUBLE)), 4) AS avg_logprob,
        |  count(*) AS n_bigrams
        |FROM bg JOIN pc USING (w1, w2) JOIN pre USING (w1) JOIN cont USING (w2) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_importance_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
        |), ttok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE source = 'src0'
        |), cc AS (
        |  SELECT term, count(*) AS cc FROM tok GROUP BY 1
        |), tc AS (
        |  SELECT term, count(*) AS tc FROM ttok GROUP BY 1
        |), v AS (
        |  SELECT count(*) AS v FROM (SELECT term FROM cc UNION SELECT term FROM tc)
        |), tot AS (
        |  SELECT (SELECT count(*) FROM tok) AS ct, (SELECT count(*) FROM ttok) AS tt
        |)
        |SELECT tok.doc_id,
        |  round(avg(ln((coalesce(tc.tc, 0) + 1)::DOUBLE / (tot.tt + v.v))
        |          - ln((cc.cc + 1)::DOUBLE / (tot.ct + v.v))), 4) AS avg_logratio,
        |  count(*) AS n_tokens
        |FROM tok JOIN cc USING (term) LEFT JOIN tc USING (term)
        |CROSS JOIN tot CROSS JOIN v
        |GROUP BY tok.doc_id ORDER BY tok.doc_id""".stripMargin,
    "q_kmv_overlap" ->
      """WITH ta AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv|' || tok), 1, 15))::BIGINT AS h
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
        |        FROM documents WHERE source = 'src0')
        |), ka AS (
        |  SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM ta)
        |  WHERE rk <= 16
        |), tb AS (
        |  SELECT DISTINCT ('0x' || substr(md5('kmv|' || tok), 1, 15))::BIGINT AS h
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
        |        FROM documents WHERE source = 'src1')
        |), kb AS (
        |  SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM tb)
        |  WHERE rk <= 16
        |), u AS (
        |  SELECT h FROM (
        |    SELECT h, row_number() OVER (ORDER BY h) AS rk
        |    FROM (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb))
        |  ) WHERE rk <= 16
        |), m AS (
        |  SELECT count(*) AS n_union_kept, max(h) AS kth FROM u
        |), nb AS (
        |  SELECT count(*) AS n_both FROM u
        |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
        |)
        |, ea AS (
        |  SELECT count(*) AS na, max(h) AS ka_kth FROM ka
        |), eb AS (
        |  SELECT count(*) AS nb2, max(h) AS kb_kth FROM kb
        |)
        |SELECT m.n_union_kept, nb.n_both,
        |  round(CASE WHEN m.n_union_kept < 16 THEN m.n_union_kept::DOUBLE
        |             ELSE 15.0 * 1152921504606846976.0 / m.kth END, 4) AS est_union,
        |  round(nb.n_both::DOUBLE / m.n_union_kept, 4) AS est_jaccard,
        |  round(round(nb.n_both::DOUBLE / m.n_union_kept, 4)
        |        * round(CASE WHEN m.n_union_kept < 16 THEN m.n_union_kept::DOUBLE
        |                     ELSE 15.0 * 1152921504606846976.0 / m.kth END, 4), 4)
        |    AS est_intersection,
        |  round(least(
        |    round(round(nb.n_both::DOUBLE / m.n_union_kept, 4)
        |          * round(CASE WHEN m.n_union_kept < 16 THEN m.n_union_kept::DOUBLE
        |                       ELSE 15.0 * 1152921504606846976.0 / m.kth END, 4), 4)
        |    / round(CASE WHEN ea.na < 16 THEN ea.na::DOUBLE
        |                 ELSE 15.0 * 1152921504606846976.0 / ea.ka_kth END, 4),
        |    1.0), 4) AS est_containment_left,
        |  round(least(
        |    round(round(nb.n_both::DOUBLE / m.n_union_kept, 4)
        |          * round(CASE WHEN m.n_union_kept < 16 THEN m.n_union_kept::DOUBLE
        |                       ELSE 15.0 * 1152921504606846976.0 / m.kth END, 4), 4)
        |    / round(CASE WHEN eb.nb2 < 16 THEN eb.nb2::DOUBLE
        |                 ELSE 15.0 * 1152921504606846976.0 / eb.kb_kth END, 4),
        |    1.0), 4) AS est_containment_right
        |FROM m CROSS JOIN nb CROSS JOIN ea CROSS JOIN eb""".stripMargin,
    "q_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type,
        |    ('0x' || substr(md5('kmv|' || user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events
        |), r AS (
        |  SELECT event_type, h,
        |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        |  FROM h
        |)
        |SELECT event_type, count(*) AS n_kept, max(h) AS kth_hash,
        |  round(CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
        |             ELSE 63.0 * 1152921504606846976.0 / max(h) END, 4) AS est_distinct
        |FROM r WHERE rk <= 64 GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_source_overlap" -> {
      val k = overlapK
      val est = (n: String, kth: String) =>
        s"CASE WHEN $n < $k THEN $n::DOUBLE ELSE ${(k - 1).toDouble} * 1152921504606846976.0 / $kth END"
      val estInt =
        s"round(round(n_both::DOUBLE / n_union_kept, 4) * round(${est("n_union_kept", "u_kth")}, 4), 4)"
      s"""WITH h AS (
         |  SELECT DISTINCT source, ('0x' || substr(md5('kmv|' || tok), 1, 15))::BIGINT AS h
         |  FROM (SELECT source, unnest(string_split(lower(text), ' ')) AS tok FROM documents)
         |), kk AS (
         |  SELECT source, h FROM (
         |    SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rk FROM h
         |  ) WHERE rk <= $k
         |), sk AS (
         |  SELECT source, list(h ORDER BY h) AS kmv FROM kk GROUP BY 1
         |), pairs AS (
         |  SELECT a.source AS left_source, b.source AS right_source,
         |    a.kmv AS ka, b.kmv AS kb,
         |    list_sort(list_distinct(a.kmv || b.kmv))[1:$k] AS uu
         |  FROM sk a JOIN sk b ON a.source < b.source
         |), base AS (
         |  SELECT left_source, right_source,
         |    len(uu)::BIGINT AS n_union_kept,
         |    len(list_filter(uu, x -> list_contains(ka, x) AND list_contains(kb, x)))::BIGINT AS n_both,
         |    uu[-1] AS u_kth,
         |    len(ka)::BIGINT AS na, ka[-1] AS ka_kth,
         |    len(kb)::BIGINT AS nb, kb[-1] AS kb_kth
         |  FROM pairs
         |)
         |SELECT left_source, right_source, n_union_kept, n_both,
         |  round(${est("n_union_kept", "u_kth")}, 4) AS est_union,
         |  round(n_both::DOUBLE / n_union_kept, 4) AS est_jaccard,
         |  $estInt AS est_intersection,
         |  round(least($estInt / round(${est("na", "ka_kth")}, 4), 1.0), 4) AS est_containment_left,
         |  round(least($estInt / round(${est("nb", "kb_kth")}, 4), 1.0), 4) AS est_containment_right
         |FROM base ORDER BY left_source, right_source""".stripMargin
    },
    "q_decayed_agg" ->
      s"""WITH s AS (
         |  SELECT event_type, ts::DATE AS d, value::DOUBLE AS v FROM events
         |), a AS (SELECT max(d) AS asof FROM s),
         |w AS (
         |  SELECT event_type, v, d,
         |    CASE WHEN k >= 63 THEN 0e0
         |         ELSE 1e0 / ((CAST(1 AS BIGINT) << CAST(k AS INTEGER))::DOUBLE) END AS wt
         |  FROM (SELECT event_type, v, d,
         |          CAST(a.asof - d AS BIGINT) // $decayHalfLifeDays AS k FROM s, a)
         |), g AS (
         |  SELECT event_type, count(*)::BIGINT AS n,
         |    CAST(sum(CAST(round(v * wt * 1e6) AS BIGINT)) AS BIGINT) AS dq,
         |    CAST(sum(CASE WHEN d IS NOT NULL
         |                  THEN CAST(round(v * 1e6) AS BIGINT) END) AS BIGINT) AS rq
         |  FROM w GROUP BY 1
         |)
         |SELECT event_type, n,
         |  round(dq::DOUBLE / 1e6, 4) + 0e0 AS decayed_value_r,
         |  round(rq::DOUBLE / 1e6, 4) + 0e0 AS raw_value_r,
         |  round(CASE WHEN rq::DOUBLE = 0e0 THEN NULL
         |             ELSE dq::DOUBLE / rq::DOUBLE END, 4) + 0e0 AS freshness_r
         |FROM g ORDER BY event_type""".stripMargin,
    // X133: rounded equi-depth cutpoints, smoothed-share WOE with the
    // same 0.5/2.5 literals, quantized IV sum.
    "q_woe_iv" ->
      """WITH b AS (
        |  SELECT value::DOUBLE AS f, (event_type = 'purchase') AS y FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value::DOUBLE)
        |    AND event_type IS NOT NULL
        |), c AS (
        |  SELECT round(quantile_cont(f, 0.2), 4) AS q0,
        |         round(quantile_cont(f, 0.4), 4) AS q1,
        |         round(quantile_cont(f, 0.6), 4) AS q2,
        |         round(quantile_cont(f, 0.8), 4) AS q3
        |  FROM b
        |), s AS (
        |  SELECT CASE WHEN f <= q0 THEN 'b01' WHEN f <= q1 THEN 'b02'
        |              WHEN f <= q2 THEN 'b03' WHEN f <= q3 THEN 'b04'
        |              ELSE 'b05' END AS segment, y
        |  FROM b, c
        |), a AS (
        |  SELECT segment, count(*)::BIGINT AS n,
        |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM s GROUP BY 1
        |), a2 AS (SELECT segment, n, n_pos, n - n_pos AS n_neg FROM a),
        |t AS (
        |  SELECT CAST(sum(n_pos) AS BIGINT) AS tp, CAST(sum(n_neg) AS BIGINT) AS tn
        |  FROM a2
        |), w AS (
        |  SELECT segment, n, n_pos, n_neg,
        |    (n_pos + 0.5e0) / (tp + 2.5e0) AS num,
        |    (n_neg + 0.5e0) / (tn + 2.5e0) AS den
        |  FROM a2, t
        |), w2 AS (
        |  SELECT *, ln(num / den) AS woe, (num - den) * ln(num / den) AS ivt FROM w
        |)
        |SELECT segment, n, n_pos, n_neg,
        |  round(woe, 4) + 0e0 AS woe_r,
        |  round(ivt, 4) + 0e0 AS iv_term_r,
        |  round(CAST(sum(CAST(round(ivt * 1e9) AS BIGINT)) OVER () AS BIGINT)::DOUBLE / 1e9, 4) + 0e0 AS iv_r
        |FROM w2 ORDER BY segment""".stripMargin,
    // X133: m-estimate encoding with quantized sums (m = 20).
    "q_target_encode" ->
      """WITH b AS (
        |  SELECT event_type AS c, value::DOUBLE AS t FROM events
        |  WHERE event_type IS NOT NULL AND value IS NOT NULL
        |    AND NOT isnan(value::DOUBLE)
        |), a AS (
        |  SELECT c, count(*)::BIGINT AS n,
        |    CAST(sum(CAST(round(t * 1e6) AS BIGINT)) AS BIGINT) AS sq
        |  FROM b GROUP BY 1
        |), g AS (
        |  SELECT CAST(sum(sq) AS BIGINT) AS gq, CAST(sum(n) AS BIGINT) AS gn FROM a
        |)
        |SELECT a.c AS category, a.n,
        |  round(a.sq::DOUBLE / 1e6 / a.n, 4) + 0e0 AS mean_r,
        |  round((a.sq::DOUBLE / 1e6 + 20e0 * (g.gq::DOUBLE / 1e6 / g.gn)) / (a.n + 20e0), 4) + 0e0 AS te_r
        |FROM a, g ORDER BY category""".stripMargin,

    // X131: bit-length binning replayed with bin()/shifts; window
    // cumulative per group; exact percentile beside the estimate.
    "q_hist_quantiles" ->
      """WITH v AS (
        |  SELECT event_type, CAST(round(value::DOUBLE * 1e6) AS BIGINT) AS qv,
        |    value::DOUBLE AS x
        |  FROM events
        |  WHERE value IS NOT NULL AND CAST(round(value::DOUBLE * 1e6) AS BIGINT) >= 0
        |), bb AS (
        |  SELECT event_type, qv, m,
        |    CASE WHEN m <= 4 THEN qv ELSE (qv >> (m - 1 - 3)) & 7 END AS sub
        |  FROM (SELECT event_type, qv, length(bin(qv))::INTEGER AS m FROM v)
        |), h AS (
        |  SELECT event_type, m, sub,
        |    CAST(min(CASE WHEN m <= 4 THEN sub
        |             ELSE (CAST(1 AS BIGINT) << (m - 1)) + (sub << (m - 1 - 3)) END) AS BIGINT) AS lbq,
        |    count(*)::BIGINT AS n
        |  FROM bb GROUP BY 1, 2, 3
        |), c AS (
        |  SELECT event_type, m, sub, lbq::DOUBLE / 1e6 AS lb, n,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY m, sub) AS BIGINT) AS cum,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot
        |  FROM h
        |), qq AS (SELECT unnest([0.5e0, 0.95e0, 0.99e0]) AS q),
        |est AS (
        |  SELECT event_type, q, lb AS est FROM (
        |    SELECT c.event_type, qq.q, c.lb,
        |      row_number() OVER (PARTITION BY c.event_type, qq.q ORDER BY c.m, c.sub) AS rk
        |    FROM c, qq WHERE c.cum >= ceil(qq.q * c.tot)
        |  ) WHERE rk = 1
        |), ex AS (
        |  SELECT event_type,
        |    quantile_cont(x, 0.5) AS e1, quantile_cont(x, 0.95) AS e2,
        |    quantile_cont(x, 0.99) AS e3
        |  FROM v GROUP BY 1
        |), exl AS (
        |  SELECT event_type, 0.5e0 AS q, e1 AS exact FROM ex
        |  UNION ALL SELECT event_type, 0.95e0 AS q, e2 AS exact FROM ex
        |  UNION ALL SELECT event_type, 0.99e0 AS q, e3 AS exact FROM ex
        |)
        |SELECT e.event_type, e.q, round(e.est, 6) AS est_r,
        |  round(x.exact, 4) + 0e0 AS exact_r,
        |  round(CASE WHEN x.exact = 0e0 THEN NULL
        |             ELSE abs(e.est - x.exact) / x.exact END, 4) AS rel_err_r
        |FROM est e JOIN exl x ON x.event_type = e.event_type AND x.q = e.q
        |ORDER BY e.event_type, e.q""".stripMargin,
    "q_robust_stats" ->
      s"""WITH med AS (
         |  SELECT event_type, round(quantile_cont(value::DOUBLE, 0.5), 4) + 0e0 AS med
         |  FROM events GROUP BY 1
         |), mad AS (
         |  SELECT e.event_type, count(*)::BIGINT AS n, max(m.med) AS med,
         |    round(quantile_cont(abs(e.value::DOUBLE - m.med), 0.5), 4) + 0e0 AS mad
         |  FROM events e JOIN med m ON m.event_type = e.event_type GROUP BY 1
         |)
         |SELECT a.event_type, a.n, a.med, a.mad,
         |  sum(CASE WHEN abs(e.value::DOUBLE - a.med) > round(${hllLit(3.5 * 1.4826)} * a.mad, 4)
         |           THEN 1 ELSE 0 END)::BIGINT AS n_outliers
         |FROM events e JOIN mad a ON a.event_type = e.event_type
         |GROUP BY 1, 2, 3, 4 ORDER BY a.event_type""".stripMargin,
    "q_winsorize" ->
      """WITH b AS (
        |  SELECT c_nationkey,
        |    round(quantile_cont(c_acctbal::DOUBLE, 0.05), 4) AS ql,
        |    round(quantile_cont(c_acctbal::DOUBLE, 0.95), 4) AS qh
        |  FROM customer GROUP BY 1
        |)
        |SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
        |  round(least(greatest(c.c_acctbal::DOUBLE, b.ql), b.qh), 4) AS bal_w
        |FROM customer c JOIN b ON b.c_nationkey = c.c_nationkey
        |ORDER BY c_custkey""".stripMargin,
    "q_hll_distinct" -> (hllOracleCtes(
      "SELECT lang, unnest(string_split(lower(text), ' ')) AS tok FROM documents") +
      s""", ex AS (
         |  SELECT lang, count(DISTINCT tok)::BIGINT AS n_exact FROM tok GROUP BY 1
         |)
         |SELECT e.lang, ${1 << hllB} AS m_buckets, e.n_present, e.est_distinct,
         |  x.n_exact, round(e.est_distinct / x.n_exact, 4) AS err_ratio
         |FROM ed e JOIN ex x ON x.lang = e.lang ORDER BY e.lang""".stripMargin),
    "q_hll_merge" -> (hllOracleCtes(
      "SELECT lang, unnest(string_split(lower(text), ' ')) AS tok FROM documents") +
      s""", toka AS (
         |  SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents WHERE doc_id % 2 = 0
         |), tokb AS (
         |  SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
         |  FROM documents WHERE doc_id % 2 = 1
         |), rega AS (${hllRegSql("toka")}
         |), regb AS (${hllRegSql("tokb")}
         |), regm AS (
         |  SELECT lang, bucket, max(r) AS r
         |  FROM (SELECT * FROM rega UNION ALL SELECT * FROM regb)
         |  GROUP BY 1, 2
         |), estm AS (${hllSumSql("regm")}
         |), edm AS (${hllFinSql("estm")}
         |)
         |SELECT m.lang, ${1 << hllB} AS m_buckets, m.n_present, m.est_distinct,
         |  w.est_distinct AS est_whole,
         |  m.est_distinct = w.est_distinct AS lossless
         |FROM edm m JOIN ed w ON w.lang = m.lang ORDER BY m.lang""".stripMargin),
    // the store's folded registers ARE the whole-corpus sketch (max is
    // idempotent across the three disjoint generations), so the
    // one-pass replay oracles the build→append→append→estimate path
    "q_hll_store" -> (hllOracleCtes(
      "SELECT lang, unnest(string_split(lower(text), ' ')) AS tok FROM documents") +
      s"""
         |SELECT lang, ${1 << hllB} AS m_buckets, n_present, est_distinct
         |FROM ed ORDER BY lang""".stripMargin),
    "q_cms_topk" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
        |), cell AS (
        |  SELECT t.r AS row,
        |         ('0x' || substr(md5('cm' || t.r::VARCHAR || '|' || tok), 1, 15))::BIGINT % 256 AS bucket
        |  FROM tok CROSS JOIN range(3) t(r)
        |), sk AS (
        |  SELECT row, bucket, count(*) AS cnt FROM cell GROUP BY 1, 2
        |), cand AS (
        |  SELECT DISTINCT tok AS item FROM tok
        |), est AS (
        |  SELECT c.item, min(COALESCE(s.cnt, 0)) AS est_count
        |  FROM cand c CROSS JOIN range(3) t(r)
        |  LEFT JOIN sk s ON s.row = t.r
        |    AND s.bucket = ('0x' || substr(md5('cm' || t.r::VARCHAR || '|' || c.item), 1, 15))::BIGINT % 256
        |  GROUP BY 1
        |)
        |SELECT item, est_count FROM est
        |ORDER BY est_count DESC, item LIMIT 20""".stripMargin,
    "q_quantiles" ->
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS q_0,
        |  round(quantile_cont(value, 0.9), 4) AS q_1,
        |  round(quantile_cont(value, 0.99), 4) AS q_2
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q_tfidf_topk" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
        |), nd AS (
        |  SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM documents
        |), dfreq AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        |), tc AS (
        |  SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, count(*) AS len FROM tok GROUP BY 1
        |), scored AS (
        |  SELECT tc.doc_id, tc.term,
        |    round((tc.c::DOUBLE / dl.len) * (ln((nd.n + 1) / (dfreq.df + 1)) + 1), 4) AS tfidf
        |  FROM tc JOIN dl USING (doc_id) JOIN dfreq USING (term) CROSS JOIN nd
        |), ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
        |  FROM scored
        |)
        |SELECT doc_id, term, tfidf, rk FROM ranked
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "q_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents
        |), c AS (
        |  SELECT term, count(*) AS tc FROM tok GROUP BY 1
        |), t AS (
        |  SELECT count(*) AS total FROM tok
        |)
        |SELECT doc_id, round(avg(ln(tc::DOUBLE / total)), 4) AS avg_logprob,
        |       count(*) AS n_tokens
        |FROM tok JOIN c USING (term) CROSS JOIN t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_embedding_centroids" ->
      """WITH d AS (
        |  SELECT label, unnest(generate_series(1, len(embedding))) AS i, embedding
        |  FROM embeddings
        |)
        |SELECT label, CAST(i - 1 AS INTEGER) AS dim, count(*) AS n,
        |       round(avg(embedding[i]::DOUBLE), 6) AS centroid
        |FROM d GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,
    "q_sql_kernels" ->
      """SELECT d.doc_id,
        |  ('0x' || substr(md5(d.text), 1, 15))::BIGINT AS text_h,
        |  round(
        |    list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> e.embedding[i]::DOUBLE * e2.embedding[i]::DOUBLE)) /
        |    (sqrt(list_sum(list_transform(range(1, len(e.embedding)+1),
        |      i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) *
        |     sqrt(list_sum(list_transform(range(1, len(e2.embedding)+1),
        |      i -> e2.embedding[i]::DOUBLE * e2.embedding[i]::DOUBLE)))), 4) AS cos_next,
        |  round(e.embedding[1]::DOUBLE * 1.0 + e.embedding[2]::DOUBLE * -2.0
        |        + e.embedding[3]::DOUBLE * 0.5, 4) AS mv1,
        |  round(e.embedding[1]::DOUBLE * 0.25 + e.embedding[2]::DOUBLE * 0.0
        |        + e.embedding[3]::DOUBLE * -1.0, 4) AS mv2
        |FROM documents d
        |JOIN embeddings e ON e.vec_id = d.doc_id
        |JOIN embeddings e2 ON e2.vec_id = d.doc_id + 1
        |ORDER BY d.doc_id""".stripMargin
  )
}
