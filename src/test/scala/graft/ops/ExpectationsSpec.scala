package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(10.0)), (2L, Some(-5.0)), (3L, None), (4L, Some(3.0))
  ).toDF("id", "v")

  test("check: one row per rule, NULL predicate counts as violation") {
    val got = Expectations.check(df, Seq(
        Expectations.Rule("v_positive", col("v") > 0),
        Expectations.Rule("v_not_null", col("v").isNotNull),
        Expectations.Rule("id_small", col("id") <= 100)))
      .as[(String, Long, Long)].collect().toSeq
    // v_positive: -5 fails, NULL fails (unevaluable = not met)
    assert(got == Seq(
      ("v_positive", 2L, 4L), ("v_not_null", 1L, 4L), ("id_small", 0L, 4L)))
  }

  test("check runs all rules in one aggregation pass — no extra scans") {
    val plan = Expectations.check(df, Seq(
        Expectations.Rule("a", col("v") > 0),
        Expectations.Rule("b", col("id") > 0),
        Expectations.Rule("c", col("v").isNotNull)))
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan"))
    assert(scans == 1, s"expected a single scan, got $scans:\n$plan")
  }

  test("uniquenessViolations reports only repeated keys with multiplicity") {
    val d = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "c"))
      .toDF("k1", "k2")
    val got = Expectations.uniquenessViolations(d, Seq("k1", "k2"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 2L)))
    assert(Expectations.uniquenessViolations(d, Seq("k1", "k2")).filter(col("n") > 2).isEmpty)
  }

  test("CLI check pipeline: report written, violations fail the job after the write") {
    val dir = java.nio.file.Files.createTempDirectory("check").toString
    Seq((1L, 5.0), (2L, -1.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/in")
    val rules = "v_positive: v > 0; id_known: id <= 100"
    val e = intercept[RuntimeException] {
      graft.Main.run(spark, Map("pipeline" -> "check",
        "input" -> s"$dir/in", "output" -> s"$dir/report", "rules" -> rules))
    }
    assert(e.getMessage.contains("v_positive=1"))
    // the report landed BEFORE the failure — gate semantics
    val rep = spark.read.parquet(s"$dir/report")
      .orderBy("rule").as[(String, Long, Long)].collect().toSeq
    assert(rep == Seq(("id_known", 0L, 2L), ("v_positive", 1L, 2L)))
    // non-failing mode returns the report
    val ok = graft.Main.run(spark, Map("pipeline" -> "check",
      "input" -> s"$dir/in", "output" -> s"$dir/report2", "rules" -> rules,
      "fail_on_violation" -> "false"))
    assert(ok.count() == 2)
  }

  test("profile: one row per column with exact counts and sample stats") {
    val d = Seq(
      (Option(1.0), Option(10.0)),
      (Option(2.0), None),
      (Option(3.0), Option(30.0)),
      (None, Option(50.0))
    ).toDF("a", "b")
    val p = Expectations.profile(d, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = p("a")
    assert(a.getLong(1) == 3 && a.getLong(2) == 1) // n, n_null
    assert(a.getDouble(3) == 1.0 && a.getDouble(4) == 3.0)
    assert(a.getDouble(5) == 2.0)                  // mean
    assert(math.abs(a.getDouble(6) - 1.0) < 1e-12) // stddev_samp of 1,2,3
    val b = p("b")
    assert(b.getLong(1) == 3 && b.getLong(2) == 1)
    assert(b.getDouble(5) == 30.0)
    // single-value / empty degenerate: stddev NULL, not NaN or crash
    val one = Seq(Tuple1(Option(5.0)), Tuple1(None: Option[Double])).toDF("x")
    val r1 = Expectations.profile(one, Seq("x")).collect().head
    assert(r1.getLong(1) == 1 && r1.isNullAt(6))
  }

  test("histogram: bucket assignment, edge clamping, NULL exclusion") {
    val d = Seq(Option(-5.0), Option(0.0), Option(9.99), Option(10.0),
      Option(55.0), Option(99.9), Option(100.0), Option(250.0), None)
      .toDF("v")
    val got = Expectations.histogram(d, col("v"), lo = 0.0, hi = 100.0, nBuckets = 10)
      .orderBy("bucket")
      .as[(Long, Double, Double, Long)].collect().toSeq
    // -5 clamps into bucket 0; 100 and 250 clamp into bucket 9; NULL dropped
    assert(got == Seq(
      (0L, 0.0, 10.0, 3L), (1L, 10.0, 20.0, 1L),
      (5L, 50.0, 60.0, 1L), (9L, 90.0, 100.0, 3L)))
    // counts conserve the non-NULL row count under clamping
    assert(got.map(_._4).sum == 8L)
  }

  test("histogram is one aggregation pass over one scan") {
    val d = Seq(1.0, 2.0, 3.0).toDF("v")
    val plan = Expectations.histogram(d, col("v"), 0.0, 10.0, 5)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan"))
    assert(scans == 1, s"expected a single scan, got $scans:\n$plan")
  }

  test("benfordReport: string-derived digits, sub-1 and NULL excluded") {
    val d = Seq(Option(1999.99), Option(-23.7), Option(0.5), Option(945.0),
      Option(1.0), None).toDF("v")
    val got = Expectations.benfordReport(d, col("v"))
      .as[(Int, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // digits: 1999.99→1, -23.7→2, 945→9, 1.0→1; 0.5 and NULL excluded
    assert(got.keySet == Set(1, 2, 9))
    assert(got(1)._2 == 2L && got(2)._2 == 1L && got(9)._2 == 1L)
    assert(got(1)._3 == 0.5)          // 2 of 4
    assert(got(1)._4 == 0.301)        // log10(2) rounded
    assert(got(1)._5 == 0.199)
    // fractions sum to 1 over the report
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
  }

  test("psiReport: identical distributions score zero, shifts score positive") {
    val a = (1 to 100).map(i => (i % 10).toDouble).toDF("v")
    // identical frames, equal totals: every contribution exactly 0
    val same = Expectations.psiReport(a, a, col("v"), 0.0, 10.0, 10)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(same.size == 10)
    assert(same.forall(_._4 == 0.0), s"identical inputs must have zero PSI: $same")
    // shifted actual: mass moves 0-4 → 5-9, PSI clearly over the 0.25
    // "drifted" rule of thumb
    val b = (1 to 100).map(i => (5 + i % 5).toDouble).toDF("v")
    val drift = Expectations.psiReport(a, b, col("v"), 0.0, 10.0, 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(drift.map(_._4).sum > 0.25, s"shifted input must read as drift: $drift")
    // empty buckets still appear on the spine with their counts zeroed
    val buckets = drift.map(_._1).sorted
    assert(buckets == (0L until 10L).toSeq)
    assert(drift.find(_._1 == 0L).get._3 == 0L) // actual has no mass at 0
  }

  test("CLI drift pipeline: report written, drift fails the job after the write") {
    val dir = java.nio.file.Files.createTempDirectory("drift").toString
    (1 to 100).map(i => (i % 10).toDouble).toDF("v")
      .write.mode("overwrite").parquet(s"$dir/base")
    (1 to 100).map(i => (5 + i % 5).toDouble).toDF("v")
      .write.mode("overwrite").parquet(s"$dir/shifted")
    val common = Map("pipeline" -> "drift", "baseline" -> s"$dir/base",
      "column" -> "v", "lo" -> "0", "hi" -> "10", "buckets" -> "10")
    // identical inputs pass the default gate
    val ok = graft.Main.run(spark, common ++ Map(
      "input" -> s"$dir/base", "output" -> s"$dir/rep_ok"))
    assert(ok.count() == 10)
    // shifted input fails AFTER the report lands
    val e = intercept[RuntimeException] {
      graft.Main.run(spark, common ++ Map(
        "input" -> s"$dir/shifted", "output" -> s"$dir/rep_bad"))
    }
    assert(e.getMessage.contains("drifted"))
    assert(spark.read.parquet(s"$dir/rep_bad").count() == 10)
    // a loose threshold lets the same drift through
    assert(graft.Main.run(spark, common ++ Map(
      "input" -> s"$dir/shifted", "output" -> s"$dir/rep_loose",
      "max_psi" -> "1000")).count() == 10)
  }

  test("orphans: missing parents and NULL child keys are both orphans") {
    val child = Seq(
      (1L, Option(10L)), (2L, Option(20L)), (3L, Option(99L)), (4L, None)
    ).toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val got = Expectations.orphans(child, "fk", parent, "pk")
      .select("id").as[Long].collect().toSet
    assert(got == Set(3L, 4L))
  }

  test("psiTimeline: baseline week scores exactly zero; a shifted week crosses the drift line") {
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // week 1 (baseline) and week 2 identical; week 3's mass shifts high
    val rows =
      (0 until 100).map(i => (t("2024-01-01 10:00:00"), (i % 10).toDouble)) ++
      (0 until 100).map(i => (t("2024-01-08 10:00:00"), (i % 10).toDouble)) ++
      (0 until 100).map(i => (t("2024-01-15 10:00:00"), (i % 10).toDouble + 6.0))
    val df = rows.toDF("ts", "v")
    val out = Expectations.psiTimeline(df, "ts", col("v"), 0.0, 20.0, 10)
      .orderBy("period")
      .select("n", "psi").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1) == Seq(100L, 100L, 100L), "n conserved per period")
    assert(out.head._2 == 0.0, "baseline vs itself is exactly zero (same smoothing)")
    assert(out(1)._2 == 0.0, "identical week scores zero")
    assert(out(2)._2 > 0.25, s"shifted week must cross the drift line: ${out(2)._2}")
    graft.CachedFrames.unpersistAll()
  }
}
