package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val left = Seq(
    (1L, "u1", ts("2024-01-01 10:00:00")),
    (2L, "u1", ts("2024-01-01 12:00:00")),
    (3L, "u2", ts("2024-01-01 09:00:00")),
    (4L, "u3", ts("2024-01-01 09:00:00"))
  ).toDF("id", "key", "t")

  private val right = Seq(
    ("u1", ts("2024-01-01 09:30:00"), "a", 1.0),
    ("u1", ts("2024-01-01 11:00:00"), "b", 2.0),
    ("u2", ts("2024-01-01 09:00:00"), "c", 3.0),
    ("u2", ts("2024-01-01 10:00:00"), "d", 4.0)
  ).toDF("key", "t", "tag", "v")

  test("asofJoin picks the latest right row at or before each left time") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t")
      .select($"id", $"asof_tag", $"asof_v").as[(Long, Option[String], Option[Double])]
      .collect().map { case (k, v1, v2) => k -> ((v1, v2)) }.toMap
    assert(out(1L) == (Some("a"), Some(1.0)))   // 10:00 -> 09:30 view
    assert(out(2L) == (Some("b"), Some(2.0)))   // 12:00 -> 11:00
    assert(out(3L) == (Some("c"), Some(3.0)))   // equal times match inclusively
    assert(out(4L) == (None, None))             // no right rows for u3
  }

  test("asofJoin strict mode excludes equal-time right rows") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t", inclusive = false)
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    assert(out(3L).isEmpty) // u2 09:00 right row no longer visible
    assert(out(1L).contains("a"))
  }

  test("asofJoin tolerance nulls out stale matches but keeps the row") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t",
        tolerance = Some("45 minutes"))
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    assert(out.size == 4)            // left-outer: all rows survive
    assert(out(1L).contains("a"))    // 30 min gap within tolerance
    assert(out(2L).isEmpty)          // 12:00 -> 11:00 is 60 min: stale, nulled
    assert(out(3L).contains("c"))    // 0 min gap
  }

  test("asofJoin forward picks the earliest right row at or after each left time") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t", forward = true)
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    assert(out(1L).contains("b"))    // u1 10:00 -> next is 11:00
    assert(out(2L).isEmpty)          // u1 12:00 -> nothing after
    assert(out(3L).contains("c"))    // u2 09:00 matches equal time inclusively
  }

  test("asofJoin forward tolerance bounds the lookahead") {
    val out = Joins.asofJoin(left, right, Seq("key"), "t", "t",
        forward = true, tolerance = Some("30 minutes"))
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    assert(out(1L).isEmpty)          // 10:00 -> 11:00 is 60 min: too far ahead
    assert(out(3L).contains("c"))    // 0 min gap
  }

  test("asofJoin distinguishes a null right attribute from no match") {
    val r = Seq(("u1", ts("2024-01-01 09:00:00"), Option.empty[String], 9.0))
      .toDF("key", "t", "tag", "v")
    val out = Joins.asofJoin(left.filter($"id" === 1L), r, Seq("key"), "t", "t")
      .select($"asof_tag", $"asof_v").as[(Option[String], Option[Double])].collect()
    assert(out.head == (None, Some(9.0))) // matched: v present, tag genuinely null
  }

  test("asofJoin rejects user columns shadowing its internal names") {
    val clashTime = left.withColumnRenamed("id", "__time")
    val e1 = intercept[IllegalArgumentException] {
      Joins.asofJoin(clashTime, right, Seq("key"), "t", "t")
    }
    assert(e1.getMessage.contains("__time"))
    val clashPrefix = right.withColumnRenamed("tag", "__l_tag")
    val e2 = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, clashPrefix, Seq("key"), "t", "t")
    }
    assert(e2.getMessage.contains("__l_tag"))
  }

  test("asofJoin rejects a malformed tolerance before it reaches the parser") {
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, Seq("key"), "t", "t",
        tolerance = Some("30 parsecs) OR 1=1"))
    }
    assert(e.getMessage.contains("tolerance"))
    // multi-term intervals stay accepted
    val ok = Joins.asofJoin(left, right, Seq("key"), "t", "t",
        tolerance = Some("1 hour 30 minutes"))
      .select($"id", $"asof_tag").as[(Long, Option[String])].collect().toMap
    assert(ok(2L).contains("b"))
  }

  test("asofJoin plans one exchange on the equi keys and no join node") {
    val plan = Joins.asofJoin(left, right, Seq("key"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected exactly one shuffle, got $exchanges:\n$plan")
  }

  private val intervals = Seq(
    (10L, 0L, 100L),
    (20L, 50L, 150L),
    (30L, 300L, 400L)
  ).toDF("iid", "lo", "hi")

  private val points = Seq((1L, 0L), (2L, 75L), (3L, 100L), (4L, 399L), (5L, 500L))
    .toDF("pid", "p")

  private val numBin: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    c => floor(c / 64).cast("long")

  test("pointInIntervalJoin matches exactly the contained pairs, no duplicates") {
    val out = Joins.pointInIntervalJoin(points, "p", intervals, "lo", "hi", numBin)
      .select($"pid", $"iid").as[(Long, Long)].collect().sorted.toSeq
    // p=0 in [0,100); p=75 in [0,100) and [50,150); p=100 in [50,150) only
    // (hi exclusive); p=399 in [300,400); p=500 nowhere
    assert(out == Seq((1L, 10L), (2L, 10L), (2L, 20L), (3L, 20L), (4L, 30L)))
  }

  test("pointInIntervalJoin hiInclusive includes the upper bound") {
    val out = Joins.pointInIntervalJoin(points, "p", intervals, "lo", "hi", numBin,
        hiInclusive = true)
      .filter($"pid" === 3L).select($"iid").as[Long].collect().sorted.toSeq
    assert(out == Seq(10L, 20L)) // p=100 now also matches [0,100]
  }

  test("pointInIntervalJoin caps pathologically wide intervals") {
    val wide = intervals.union(Seq((99L, 0L, 1000000L)).toDF("iid", "lo", "hi"))
    val capped = Joins.pointInIntervalJoin(points, "p", wide, "lo", "hi", numBin,
        maxBinsPerInterval = 8)
      .select($"iid").as[Long].collect().toSet
    assert(!capped.contains(99L))
    val audit = Joins.oversizedIntervals(wide, "lo", "hi", numBin, 8)
      .select($"iid").as[Long].collect().toSeq
    assert(audit == Seq(99L))
  }

  test("intervalOverlapJoin: exact overlap semantics, each pair exactly once") {
    val lefts = Seq(
      (1L, 0L, 100L),    // overlaps r1 [50,150) and r2 [90,95)
      (2L, 200L, 260L),  // overlaps r3 [250,350) — crosses several shared bins
      (3L, 500L, 510L)   // overlaps nothing
    ).toDF("lid", "l_lo", "l_hi")
    val rights = Seq(
      (1L, 50L, 150L), (2L, 90L, 95L), (3L, 250L, 350L),
      (4L, 100L, 120L)   // touches left 1 only at the half-open boundary
    ).toDF("rid", "r_lo", "r_hi")
    val out = Joins.intervalOverlapJoin(
        lefts, "l_lo", "l_hi", rights, "r_lo", "r_hi", numBin)
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 1L), (1L, 2L), (2L, 3L))) // no duplicates, no boundary pair
    val closed = Joins.intervalOverlapJoin(
        lefts, "l_lo", "l_hi", rights, "r_lo", "r_hi", numBin, hiInclusive = true)
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    assert(closed == Seq((1L, 1L), (1L, 2L), (1L, 4L), (2L, 3L)))
  }

  test("intervalOverlapJoin extraKeys scope pairs and the cap bounds replication") {
    val l = Seq((1L, "a", 0L, 100L), (2L, "b", 0L, 100L)).toDF("lid", "k", "l_lo", "l_hi")
    val r = Seq((1L, "a", 50L, 60L), (2L, "b", 0L, 100000L)).toDF("rid", "k", "r_lo", "r_hi")
    val keyed = Joins.intervalOverlapJoin(
        l, "l_lo", "l_hi", r, "r_lo", "r_hi", numBin, extraKeys = Seq("k"))
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    assert(keyed == Seq((1L, 1L), (2L, 2L))) // cross-key overlaps excluded
    val capped = Joins.intervalOverlapJoin(
        l, "l_lo", "l_hi", r, "r_lo", "r_hi", numBin, extraKeys = Seq("k"),
        maxBinsPerInterval = 8)
      .select($"lid", $"rid").as[(Long, Long)].collect().sorted.toSeq
    assert(capped == Seq((1L, 1L))) // the 1500-bin right interval is dropped
  }

  test("timeBin is monotonic over timestamps") {
    // 7-day epoch bins: 2024-01-01 is epoch day 19723 (bin 2817,
    // covering days 19719..19725); +7 days lands one bin later.
    val df = Seq(ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"),
      ts("2024-01-08 00:00:00")).toDF("t")
    val bins = df.select(Joins.timeBin(7L * 86400 * 1000000L)($"t").as("b"))
      .as[Long].collect().toSeq
    assert(bins(0) == bins(1))  // same 7-day bin
    assert(bins(2) == bins(0) + 1)
  }
}
