package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("compactChanges keeps the max-version row per key, all columns") {
    val ch = Seq(
      (1L, "a", 1L, "U"), (1L, "b", 3L, "U"), (1L, "c", 2L, "D"),
      (2L, "x", 1L, "D")
    ).toDF("id", "payload", "version", "op")
    val got = Cdc.compactChanges(ch, Seq("id"), "version")
      .orderBy("id").as[(Long, String, Long, String)].collect().toSeq
    assert(got == Seq((1L, "b", 3L, "U"), (2L, "x", 1L, "D")))
  }

  test("applyChanges: untouched survive, upserts replace/insert, deletes remove") {
    val base = Seq((1L, "old1"), (2L, "old2"), (3L, "old3")).toDF("id", "payload")
    val ch = Seq(
      (1L, "new1", 1L, "U"),   // replace
      (2L, "gone", 1L, "D"),   // delete
      (4L, "new4", 1L, "U"),   // insert
      (4L, "newer4", 2L, "U")  // ...latest version wins
    ).toDF("id", "payload", "version", "op")
    val got = Cdc.applyChanges(base, ch, Seq("id"), "version", "op")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "new1"), (3L, "old3"), (4L, "newer4")))
  }

  test("scd2FromLog: episodes collapse repeats, ranges chain, last is current") {
    val log = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "bronze"),
      (1L, ts("2024-01-02 10:00:00"), 2L, "bronze"), // repeat: no episode
      (1L, ts("2024-01-03 10:00:00"), 3L, "silver"),
      (1L, ts("2024-01-04 10:00:00"), 4L, "bronze"), // back: NEW episode
      (2L, ts("2024-01-01 10:00:00"), 5L, "gold")
    ).toDF("user_id", "ts", "event_id", "tier")
    val got = Cdc.scd2FromLog(log, "user_id", "ts", "event_id", Seq("tier"))
      .orderBy("user_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getTimestamp(3), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      (1L, "bronze", ts("2024-01-01 10:00:00"), ts("2024-01-03 10:00:00"), false),
      (1L, "silver", ts("2024-01-03 10:00:00"), ts("2024-01-04 10:00:00"), false),
      (1L, "bronze", ts("2024-01-04 10:00:00"), null, true),
      (2L, "gold", ts("2024-01-01 10:00:00"), null, true)))
  }

  test("a NULL op is an upsert, not a silent delete") {
    val base = Seq((1L, "old")).toDF("id", "payload")
    val ch = Seq((2L, "new", 1L, null.asInstanceOf[String]))
      .toDF("id", "payload", "version", "op")
    val got = Cdc.applyChanges(base, ch, Seq("id"), "version", "op")
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "old"), (2L, "new")))
  }

  test("schema guards: missing base columns and reserved SCD names are refused") {
    val base = Seq((1L, "a")).toDF("id", "payload")
    val changesNoPayload = Seq((1L, 1L, "U")).toDF("id", "version", "op")
    val e1 = intercept[IllegalArgumentException] {
      Cdc.applyChanges(base, changesNoPayload, Seq("id"), "version", "op")
    }
    assert(e1.getMessage.contains("payload"))
    val badLog = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "a", true))
      .toDF("user_id", "ts", "event_id", "state", "is_current")
    val e2 = intercept[IllegalArgumentException] {
      Cdc.scd2FromLog(badLog, "user_id", "ts", "event_id", Seq("state"))
    }
    assert(e2.getMessage.contains("is_current"))
  }

  test("scd2 plan: both windows and the change filter share one exchange") {
    val log = Seq((1L, ts("2024-01-01 10:00:00"), 1L, "a"))
      .toDF("user_id", "ts", "event_id", "state")
    val plan = Cdc.scd2FromLog(log, "user_id", "ts", "event_id", Seq("state"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }

  test("snapshotDiff: inserts, deletes, updates with exact changed-column lists") {
    val before = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, "a", 10.0),          // unchanged — no output row
      (2L, "B", 20.0),          // s changed
      (3L, "c", 33.0),          // v changed
      (5L, "e", 50.0)           // inserted; 4 deleted
    ).toDF("k", "s", "v")
    val d = Cdc.snapshotDiff(before, after, Seq("k"))
      .orderBy("k").as[(Long, String, String, String, Double)].collect().toSeq
    assert(d == Seq(
      (2L, "U", "s", "B", 20.0),
      (3L, "U", "v", "c", 33.0),
      (4L, "D", "", "d", 40.0),
      (5L, "I", "", "e", 50.0)))
  }

  test("snapshotDiff: NULL-safe comparison and multi-column change lists") {
    val before = Seq(
      (1L, Option("x"), Option(1.0)),
      (2L, None: Option[String], Option(2.0)),
      (3L, Option("z"), None: Option[Double])
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, None: Option[String], Option(9.0)), // both cols change (x→NULL, 1→9)
      (2L, None: Option[String], Option(2.0)), // NULL == NULL → unchanged
      (3L, Option("z"), Option(3.0))           // NULL → value is a change
    ).toDF("k", "s", "v")
    val d = Cdc.snapshotDiff(before, after, Seq("k"))
      .select("k", "change_type", "changed_cols")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(d == Seq((1L, "U", "s,v"), (3L, "U", "v")))
  }

  test("snapshotDiff round-trips through applyChanges") {
    val before = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "s", "v")
    val after = Seq(
      (1L, "a", 10.0), (2L, "B", 20.0), (5L, "e", 50.0), (6L, "f", 60.0)
    ).toDF("k", "s", "v")
    val changes = Cdc.snapshotDiff(before, after, Seq("k"))
      .withColumn("ver", lit(1L))
    val rebuilt = Cdc.applyChanges(
      before, changes, Seq("k"), "ver", "change_type", deleteOp = "D")
    assert(rebuilt.orderBy("k").collect().toSeq ==
      after.orderBy("k").collect().toSeq)
  }

  test("snapshotDiff validates schemas and reserved names") {
    val t = Seq((1L, "a")).toDF("k", "s")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(t, Seq((1L, 2.0)).toDF("k", "v"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(t, t, Seq())
    }
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(t.select("k"), t.select("k"), Seq("k"))
    }
    val bad = Seq((1L, "a", "x")).toDF("k", "s", "change_type")
    intercept[IllegalArgumentException] {
      Cdc.snapshotDiff(bad, bad, Seq("k"))
    }
  }
}
