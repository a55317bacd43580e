package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1 completes a→b→c in order; user 2 does b before a (b must
  // not count pre-a); user 3 only reaches a; user 4 never starts but
  // has other events.
  private lazy val events = Seq(
    (1L, ts("2024-01-01 10:00:00"), "a"),
    (1L, ts("2024-01-01 11:00:00"), "b"),
    (1L, ts("2024-01-01 12:00:00"), "c"),
    (2L, ts("2024-01-01 09:00:00"), "b"),
    (2L, ts("2024-01-01 10:00:00"), "a"),
    (2L, ts("2024-01-01 11:30:00"), "b"),
    (3L, ts("2024-01-02 10:00:00"), "a"),
    (4L, ts("2024-01-02 10:00:00"), "x")
  ).toDF("user_id", "ts", "event_type")

  test("funnelStepTimes: earliest-chain, order-sensitive, NULL tail") {
    val t = EventAnalytics.funnelStepTimes(
        events, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("user_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getTimestamp(3)))
    assert(t(0) == ((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00"))))
    // user 2: the 09:00 b is BEFORE a and must not match; 11:30 does
    assert(t(1) == ((2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:30:00"), null)))
    assert(t(2) == ((3L, ts("2024-01-02 10:00:00"), null, null)))
    assert(t(3) == ((4L, null, null, null)))
  }

  test("funnel summary is monotonically non-increasing") {
    val f = EventAnalytics.funnel(
        events, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .orderBy("step")
      .as[(Int, String, Long)].collect().toSeq
    assert(f == Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
  }

  test("maxGap gates a slow step but not a fast one") {
    val f = EventAnalytics.funnel(
        events, "user_id", "ts", "event_type", Seq("a", "b"),
        maxGapSeconds = Some(3600))
      .orderBy("step")
      .as[(Int, String, Long)].collect().toSeq
    // user 1's b is exactly 3600s after a (inclusive bound: counts);
    // user 2's post-a b is 5400s after a (gated out)
    assert(f == Seq((1, "a", 3L), (2, "b", 1L)))
  }

  test("feedAudit: out-of-order regressions, max gap, span, one-event entity") {
    val d = Seq(
      // user 1: delivered in order 1,2,3 but event 2's ts regresses
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 09:00:00")),
      (1L, 3L, ts("2024-01-01 12:00:00")),
      // user 2: clean, gaps 60s then 600s
      (2L, 4L, ts("2024-01-01 10:00:00")),
      (2L, 5L, ts("2024-01-01 10:01:00")),
      (2L, 6L, ts("2024-01-01 10:11:00")),
      // user 3: single event — no gaps, zero span
      (3L, 7L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val got = EventAnalytics.feedAudit(d, "user_id", "ts", "event_id")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // user 1: one regression; max gap is 09:00→12:00 = 10800s, and the
    // span is min-to-max ts (also 10800s), not delivery-order endpoints
    assert(got(1L) == ((3L, 1L, 10800.0, 10800.0)))
    assert(got(2L) == ((3L, 0L, 600.0, 660.0)))
    assert(got(3L) == ((1L, 0L, 0.0, 0.0)))
  }

  test("resample: dense spine, zero-filled counts, forward-filled values") {
    val d = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 11L, ts("2024-01-01 10:30:00"), 2.0),
      (1L, 12L, ts("2024-01-01 13:05:00"), 9.0),
      (2L, 20L, ts("2024-01-01 08:00:00"), 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = EventAnalytics.resample(d, "user_id", "ts", "value", "event_id", 3600L)
      .orderBy("user_id", "period_start")
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).getHour, r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      // user 1: busy hour, two silent hours carried forward, then 13:00
      (1L, 10, 2L, Some(2.0), Some(2.0)),
      (1L, 11, 0L, None, Some(2.0)),
      (1L, 12, 0L, None, Some(2.0)),
      (1L, 13, 1L, Some(9.0), Some(9.0)),
      // user 2: single-period spine
      (2L, 8, 1L, Some(5.0), Some(5.0))))
  }

  test("resample: same-timestamp tie resolves by orderCol, step validated") {
    val d = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 10:00:00"), 7.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val got = EventAnalytics.resample(d, "user_id", "ts", "value", "event_id", 3600L)
      .select("last_value").as[Double].collect().toSeq
    assert(got == Seq(7.0))
    intercept[IllegalArgumentException] {
      EventAnalytics.resample(d, "user_id", "ts", "value", "event_id", 0L)
    }
  }

  test("anomalies: spike flagged against a trailing-only baseline") {
    // 10 flat periods then a spike; the spike must not contaminate
    // its own baseline (strictly-preceding frame)
    val series = ((1 to 10).map(i => ("m", i, 5.0)) :+ (("m", 11, 50.0)))
      .toDF("entity", "period", "v")
    val got = EventAnalytics.anomalies(series, "entity", "period", "v",
        trailing = 5, zThreshold = 3.0)
      .orderBy("period")
      .select("period", "z", "is_anomaly")
      .collect()
      .map(r => (r.getInt(0), Option(r.get(1)).map(_.asInstanceOf[Double]), r.getBoolean(2)))
    // period 1: no baseline; periods 2-10: zero-variance baseline → NULL z
    assert(got.take(10).forall { case (_, z, a) => z.isEmpty && !a })
    // the spike scores against five 5.0s — sd 0 → NULL? no: baseline
    // all-5.0 has zero variance, z stays NULL even for the spike
    assert(got(10)._2.isEmpty && !got(10)._3)
    // a noisy baseline gives the spike a finite large z
    val noisy = (Seq(("m", 1, 4.0), ("m", 2, 6.0), ("m", 3, 5.0),
      ("m", 4, 4.0), ("m", 5, 6.0)) :+ (("m", 6, 50.0))).toDF("entity", "period", "v")
    val z6 = EventAnalytics.anomalies(noisy, "entity", "period", "v", 5, 3.0)
      .filter(col("period") === 6).select("z", "is_anomaly").head()
    assert(z6.getDouble(0) > 3.0 && z6.getBoolean(1))
    intercept[IllegalArgumentException] {
      EventAnalytics.anomalies(noisy, "entity", "period", "v", 1, 3.0)
    }
  }

  test("feedAudit plan: one exchange on the entity key") {
    val d = Seq((1L, 1L, ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_id", "ts")
    val plan = EventAnalytics.feedAudit(d, "user_id", "ts", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected one exchange:\n$plan")
  }

  test("retentionCohorts: offset-0 row is cohort size; later weeks counted") {
    // cohort week of 2024-01-01 (Mon): users 10, 11; user 10 returns
    // in the next week; user 12 starts the following week.
    val ev = Seq(
      (10L, ts("2024-01-02 10:00:00")),
      (10L, ts("2024-01-09 10:00:00")),
      (11L, ts("2024-01-03 10:00:00")),
      (12L, ts("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val r = EventAnalytics.retentionCohorts(ev, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .collect()
      .map(x => (x.getDate(0).toString, x.getInt(1), x.getLong(2))).toSeq
    assert(r == Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L), ("2024-01-08", 0, 1L)))
  }

  test("sessionPaths: gap splits sessions, order within session is (ts, order)") {
    val ev = Seq(
      // user 1, one session: b at same minute as a but later event —
      // path order must follow ts then event_id
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "c"),
      // 40-minute gap (> 1800s): new session
      (1L, ts("2024-01-01 10:50:00"), 4L, "a"),
      // user 2, one singleton session
      (2L, ts("2024-01-01 09:00:00"), 5L, "a")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val paths = EventAnalytics.sessionPaths(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "session_idx")
      .as[(Long, Long, String)].collect().toSeq
    assert(paths == Seq((1L, 1L, "a>b>c"), (1L, 2L, "a"), (2L, 1L, "a")))

    val top = EventAnalytics.topPaths(ev, "user_id", "ts", "event_type", "event_id", k = 2)
      .as[(String, Long)].collect().toSeq
    assert(top == Seq(("a", 2L), ("a>b>c", 1L)))
  }

  test("sessionPaths plan: one exchange on the entity key") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val plan = EventAnalytics.sessionPaths(ev, "user_id", "ts", "event_type", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("reserved staging/output columns are refused, not shadowed") {
    val bad1 = events.withColumn("step_1_ts", col("ts"))
    val e1 = intercept[IllegalArgumentException] {
      EventAnalytics.funnelStepTimes(bad1, "user_id", "ts", "event_type", Seq("a"))
    }
    assert(e1.getMessage.contains("step_1_ts"))
    val bad2 = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "a", "x"))
      .toDF("user_id", "ts", "event_id", "event_type", "path")
    val e2 = intercept[IllegalArgumentException] {
      EventAnalytics.sessionPaths(bad2, "user_id", "ts", "event_type", "event_id")
    }
    assert(e2.getMessage.contains("path"))
  }

  test("funnel plan: one exchange for all step windows, reduction reuses it") {
    val plan = EventAnalytics.funnelStepTimes(
        events, "user_id", "ts", "event_type", Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("decayedAgg: hand-computed stepped half-life weights; NULLs count in n only") {
    import java.sql.Timestamp
    // anchor 2024-02-01; ages 0, 7, 14 days → weights 1, 1/2, 1/4
    val rows = Seq(
      ("a", Timestamp.valueOf("2024-02-01 10:00:00"), 100.0),
      ("a", Timestamp.valueOf("2024-01-25 09:00:00"), 100.0),
      ("a", Timestamp.valueOf("2024-01-18 08:00:00"), 100.0),
      ("b", Timestamp.valueOf("2024-02-01 01:00:00"), 10.0))
      .toDF("g", "ts", "v")
      .unionByName(Seq(Tuple1("b")).toDF("g")
        .withColumn("ts", lit(null).cast("timestamp"))
        .withColumn("v", lit(null).cast("double")))
    val out = EventAnalytics.decayedAgg(rows, Seq("g"), "ts", "v", halfLifeDays = 7)
      .orderBy("g")
      .select("g", "n", "decayed_value_r", "raw_value_r", "freshness_r")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    // a: 100·1 + 100·(1/2) + 100·(1/4) = 175 of 300 raw
    assert(out.head == (("a", 3L, 175.0, 300.0, 0.5833)), out.toString)
    // b: one real row at age 0 (weight 1) + one NULL row (n only)
    assert(out.last == (("b", 2L, 10.0, 10.0, 1.0)), out.toString)
  }

  test("decayedAgg validates knobs and degrades freshness to NULL on zero raw mass") {
    import java.sql.Timestamp
    val zero = Seq(("g", Timestamp.valueOf("2024-02-01 10:00:00"), 0.0))
      .toDF("g", "ts", "v")
    val row = EventAnalytics.decayedAgg(zero, Seq("g"), "ts", "v").head()
    assert(row.isNullAt(row.fieldIndex("freshness_r")))
    intercept[IllegalArgumentException] {
      EventAnalytics.decayedAgg(zero, Seq("g"), "ts", "v", halfLifeDays = 0)
    }
    intercept[IllegalArgumentException] {
      EventAnalytics.decayedAgg(zero, Seq.empty, "ts", "v")
    }
  }
}
