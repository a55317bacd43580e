package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import EventStreams._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long, typ: String, v: Double) =
    Event(id, ts(t), user, typ, v)

  test("windowedAgg on a stream: tumbling counts, late row beyond watermark dropped") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = windowedAgg(input.toDF(), watermark = "10 minutes", windowLength = "1 hour")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()

    input.addData(
      ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:55:00", 2, "click", 2.0),
      ev(3, "2024-01-01 11:10:00", 1, "view", 3.0),
      // advance watermark far past the 10-11 window…
      ev(4, "2024-01-01 13:00:00", 3, "click", 4.0))
    query.processAllAvailable()
    input.addData( // …then a too-late row for 10-11: must be dropped
      ev(5, "2024-01-01 10:30:00", 4, "click", 99.0))
    query.processAllAvailable()
    query.stop()

    val out = spark.table("win_agg")
      .select("window_start", "event_type", "n_events", "total_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    // append mode emits only windows finalized by the watermark
    assert(out.contains((ts("2024-01-01 10:00:00"), "click", 2L, 3.0)))
    assert(!out.exists { case (w, _, n, v) =>
      w == ts("2024-01-01 10:00:00") && (n > 2L || v > 3.0)
    }, s"late row leaked into closed window: $out")
  }

  test("windowedAgg same plan works on a batch frame") {
    import spark.implicits._
    val batch = Seq(
      ev(1, "2024-01-01 10:05:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:55:00", 2, "click", 2.0),
      ev(3, "2024-01-01 11:10:00", 1, "view", 3.0)).toDF()
    val out = windowedAgg(batch)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(out == Set(
      (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
      (ts("2024-01-01 11:00:00"), "view", 1L, 3.0)))
  }

  test("dedupStream drops duplicate fingerprints within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = dedupStream(
      input.toDF().withColumn("fp", md5(col("event_type"))),
      "ts", "10 minutes", Seq("fp"))
    val query = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    input.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:01:00", 2, "click", 2.0), // dup fingerprint
      ev(3, "2024-01-01 10:02:00", 3, "view", 3.0))
    query.processAllAvailable()
    query.stop()
    val kept = spark.table("dedup_stream").select("event_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L), s"kept=$kept")
  }

  test("attributionJoin (stream-stream) matches in-window views and expires state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val views = MemoryStream[Event]
    val joined = attributionJoin(
      purchases.toDF(), views.toDF(),
      watermark = "5 minutes", lookback = "30 minutes", joinType = "inner")
      .select(col("event_id"), col("matched_event_id"))
    val query = joined.writeStream.format("memory").queryName("attr_join")
      .outputMode("append").start()
    views.addData(
      ev(100, "2024-01-01 10:00:00", 1, "view", 0.0),
      ev(101, "2024-01-01 10:20:00", 1, "view", 0.0),
      ev(102, "2024-01-01 09:00:00", 1, "view", 0.0), // outside 30-min lookback
      ev(103, "2024-01-01 10:15:00", 2, "view", 0.0)) // other user
    purchases.addData(
      ev(1, "2024-01-01 10:25:00", 1, "purchase", 9.99))
    query.processAllAvailable()
    query.stop()
    val got = spark.table("attr_join").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L), (1L, 101L)), s"got=$got")
  }

  test("enrichStream joins a stream to a broadcast static dim, stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val query = enrichStream(input.toDF(), dim, Seq("user_id"))
      .select(col("event_id"), col("tier"))
      .writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    input.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:01:00", 2, "click", 2.0),
      ev(3, "2024-01-01 10:02:00", 9, "view", 3.0)) // no dim row
    query.processAllAvailable()
    query.stop()
    val got = spark.table("enrich_stream")
      .as[(Long, Option[String])].collect().toSet
    assert(got == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
  }

  test("attributionJoin same plan works on batch frames") {
    import spark.implicits._
    val p = Seq(ev(1, "2024-01-01 10:25:00", 1, "purchase", 9.99)).toDF()
    val v = Seq(
      ev(100, "2024-01-01 10:00:00", 1, "view", 0.0),
      ev(102, "2024-01-01 09:00:00", 1, "view", 0.0)).toDF()
    val got = attributionJoin(p, v, joinType = "leftOuter")
      .select(col("event_id"), col("matched_event_id")).as[(Long, Option[Long])]
      .collect().toSet
    assert(got == Set((1L, Some(100L))))
  }

  test("attributionJoin is schema-agnostic: custom key/ts columns") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val installs = Seq(
      ("devA", "appX", t("2024-01-01 10:25:00")),
      ("devB", "appX", t("2024-01-01 10:25:00")))
      .toDF("device_id", "app", "install_time")
    val ads = Seq(
      (100L, "devA", "appX", t("2024-01-01 10:00:00")),
      (101L, "devA", "appX", t("2024-01-01 09:00:00")), // outside lookback
      (102L, "devA", "appY", t("2024-01-01 10:10:00"))) // other app key
      .toDF("ad_id", "device_id", "app", "impression_time")
    val got = attributionJoin(
        installs, ads,
        on = Seq("device_id", "app"),
        leftTs = "install_time", rightTs = "impression_time",
        lookback = "30 minutes", joinType = "leftOuter")
      .select(col("device_id"), col("matched_ad_id"))
      .as[(String, Option[Long])].collect().toSet
    assert(got == Set(("devA", Some(100L)), ("devB", None)))
  }

  test("attributionJoin rejects a malformed lookback before the parser") {
    import spark.implicits._
    val df = Seq(ev(1, "2024-01-01 10:00:00", 1, "x", 0.0)).toDF()
    val e = intercept[IllegalArgumentException] {
      attributionJoin(df, df, lookback = "5 furlongs'; DROP TABLE")
    }
    assert(e.getMessage.contains("lookback"))
  }

  test("sessionize splits on gaps and emits closed sessions (batch-mode run)") {
    // flatMapGroupsWithState executes on batch Datasets too (state
    // starts empty, timeouts never fire) — this pins the gap-splitting
    // semantics deterministically; the streaming plumbing itself is
    // covered by the windowedAgg stream test above.
    import spark.implicits._
    val input = Seq(
      // user 1: two events 5 min apart (one session), then a 2 h gap
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:05:00", 1, "view", 2.0),
      ev(3, "2024-01-01 12:30:00", 1, "click", 5.0),
      // user 2: single event
      ev(4, "2024-01-01 10:00:00", 2, "click", 7.0)).toDS()
    val out = sessionize(input, gapSeconds = 600).collect()
    // the 2h gap closes user 1's first session; trailing sessions stay
    // open (in state) and are not emitted
    assert(out.toSeq == Seq(
      Session(1L, 2L, 3.0, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"))))
  }

  test("sessionizeBatch: gap splits, per-user indices, and exact-gap boundary") {
    import spark.implicits._
    val input = Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:05:00", 1, "view", 2.0),  // 5 min: same session
      ev(3, "2024-01-01 10:15:00", 1, "click", 4.0), // EXACTLY the 600s gap: same session (strict >)
      ev(4, "2024-01-01 12:30:00", 1, "click", 5.0), // 2h15: new session
      ev(5, "2024-01-01 10:00:00", 2, "click", 7.0)).toDS().toDF()
    val got = EventStreams.sessionizeBatch(input, gapSeconds = 600)
      .orderBy("user_id", "session_idx")
      .as[(Long, Long, Long, Double, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 7.0, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00")),
      (1L, 2L, 1L, 5.0, ts("2024-01-01 12:30:00"), ts("2024-01-01 12:30:00")),
      (2L, 1L, 1L, 7.0, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:00:00"))))
  }

  test("sessionizeBatch edge cases: empty input, single event, bad gap") {
    import spark.implicits._
    val empty = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double)]
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    assert(EventStreams.sessionizeBatch(empty).count() == 0)
    val one = Seq(ev(1, "2024-01-01 10:00:00", 1, "click", 2.5)).toDS().toDF()
    val got = EventStreams.sessionizeBatch(one)
      .select("user_id", "session_idx", "n_events").as[(Long, Long, Long)].head()
    assert(got == ((1L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      EventStreams.sessionizeBatch(one, gapSeconds = 0)
    }
  }

  test("sessionizeBatch refuses inputs shadowing staging/output columns") {
    import spark.implicits._
    val one = Seq(ev(1, "2024-01-01 10:00:00", 1, "click", 2.5)).toDS().toDF()
    // staging name would be silently overwritten; output aggregate name
    // would silently vanish into the groupBy — both must be refused
    for (bad <- Seq("__new_sess", "session_idx", "n_events", "session_end")) {
      val err = intercept[IllegalArgumentException] {
        EventStreams.sessionizeBatch(one.withColumn(bad, lit(0)))
      }
      assert(err.getMessage.contains(bad))
    }
  }

  test("sessionizeBatch agrees with streaming sessionize on closed sessions") {
    import spark.implicits._
    // deterministic multi-user fixture: per-user event times with
    // gaps both under and over the threshold
    val events = for {
      u <- 1L to 5L
      i <- 0 until 12
    } yield {
      val base = ts("2024-01-01 08:00:00").getTime
      // bursts of 3 events 2 min apart, bursts separated by 40 min
      val t = base + u * 1000 + (i / 3) * 2400000L + (i % 3) * 120000L
      EventStreams.Event(u * 100 + i, new java.sql.Timestamp(t), u, "click", i.toDouble)
    }
    val ds = events.toDS()
    val closed = sessionize(ds, gapSeconds = 600).collect()
      .map(s => (s.user_id, s.n_events, s.total_value, s.first_ts, s.last_ts)).toSet
    val batch = EventStreams.sessionizeBatch(ds.toDF(), gapSeconds = 600)
      .as[(Long, Long, Long, Double, java.sql.Timestamp, java.sql.Timestamp)]
      .collect()
      .map { case (u, _, n, v, a, b) => (u, n, v, a, b) }.toSet
    // streaming emits only gap-closed sessions (the trailing one per
    // user stays in state); every one of them must appear in the batch
    // result, which additionally carries the 5 trailing sessions
    assert(closed.nonEmpty && closed.subsetOf(batch),
      s"streaming-closed not in batch: ${closed.diff(batch)}")
    assert(batch.size == closed.size + 5)
  }

  test("dedupDocStream: in-stream copies and store-known content both drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the persisted history: "old news" is already in the store
    val store = graft.ops.Dedup.exactFingerprintStore(
      Seq((100L, "old news")).toDF("doc_id", "text"), "text")
    val input = MemoryStream[Doc]
    val query = dedupDocStream(
        input.toDF(), "text", "ts", "10 minutes", store)
      .writeStream.format("memory").queryName("doc_dedup")
      .outputMode("append").start()
    input.addData(
      Doc(1, ts("2024-01-01 10:00:00"), "fresh content one"),
      Doc(2, ts("2024-01-01 10:01:00"), "old news"),          // in store → drop
      Doc(3, ts("2024-01-01 10:02:00"), "fresh content one"), // in-stream copy → drop
      Doc(4, ts("2024-01-01 10:03:00"), "fresh content two"))
    query.processAllAvailable()
    query.stop()
    val kept = spark.table("doc_dedup").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L), s"got $kept")
  }

  test("SessionState bounds never move backwards on a cross-batch late event") {
    // events sort only WITHIN a micro-batch; a late event from a later
    // batch used to drag lastMs backwards (first_ts > last_ts sessions,
    // then a spurious split on the next on-time event)
    val s0 = EventStreams.SessionState.start(ev(1, "2024-01-01 10:30:00", 1, "x", 1.0))
    val late = s0.add(ev(2, "2024-01-01 10:10:00", 1, "x", 2.0))
    assert(late.firstMs == ts("2024-01-01 10:10:00").getTime)
    assert(late.lastMs == ts("2024-01-01 10:30:00").getTime)
    assert(late.n == 2 && late.total == 3.0)
    // and an on-time follow-up within the gap does NOT split
    val next = late.add(ev(3, "2024-01-01 10:45:00", 1, "x", 1.0))
    assert(next.lastMs == ts("2024-01-01 10:45:00").getTime && next.n == 3)
  }

  test("foldBatch: a deep-late cross-batch event closes as its own session") {
    val gapMs = 1800 * 1000L
    // batch 1 (no carried state) opens a session 10:00–10:30
    val (c1, open1) = EventStreams.foldBatch(None, Seq(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:30:00", 1, "view", 2.0)), gapMs)
    assert(c1.isEmpty && open1.exists(_.n == 2))
    // batch 2: 07:00/07:10 are far more than the gap older than the
    // open session — they must NOT silently stretch it into a
    // 07:00–10:30 span with a 3h internal hole (what the batch twin
    // would split); they chain together and close as their own session
    val (c2, open2) = EventStreams.foldBatch(open1, Seq(
      ev(3, "2024-01-01 07:00:00", 1, "click", 4.0),
      ev(4, "2024-01-01 07:10:00", 1, "view", 8.0)), gapMs)
    assert(c2.map(_.toSession(1L)) == List(
      Session(1L, 2L, 12.0, ts("2024-01-01 07:00:00"), ts("2024-01-01 07:10:00"))),
      s"got $c2")
    assert(open2.exists(s => s.firstMs == ts("2024-01-01 10:00:00").getTime &&
      s.lastMs == ts("2024-01-01 10:30:00").getTime), s"open=$open2")
    // batch 3: an on-time event keeps the 10:00 session open and growing
    val (c3, open3) = EventStreams.foldBatch(open2,
      Seq(ev(5, "2024-01-01 10:45:00", 1, "click", 1.0)), gapMs)
    assert(c3.isEmpty && open3.exists(s =>
      s.n == 3 && s.lastMs == ts("2024-01-01 10:45:00").getTime))
  }

  test("foldBatch: a late event within the gap of the open session merges") {
    val gapMs = 1800 * 1000L
    val (_, open1) = EventStreams.foldBatch(None,
      Seq(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0)), gapMs)
    // 09:45 arrives a batch later but lies within the gap of the open
    // session's start — it belongs to it (extends the bounds backwards)
    val (c2, open2) = EventStreams.foldBatch(open1,
      Seq(ev(2, "2024-01-01 09:45:00", 1, "view", 2.0)), gapMs)
    assert(c2.isEmpty && open2.exists(s =>
      s.n == 2 && s.firstMs == ts("2024-01-01 09:45:00").getTime))
    // a >gap jump closes the merged 09:45–10:00 session
    val (c3, open3) = EventStreams.foldBatch(open2,
      Seq(ev(3, "2024-01-01 12:00:00", 1, "click", 4.0)), gapMs)
    assert(c3.map(_.toSession(1L)) == List(
      Session(1L, 2L, 3.0, ts("2024-01-01 09:45:00"), ts("2024-01-01 10:00:00"))),
      s"got $c3")
    assert(open3.exists(_.firstMs == ts("2024-01-01 12:00:00").getTime))
  }

  test("sessionizeReplay folds parity batches through foldBatch, differing from the batch twin") {
    import spark.implicits._
    // Even ids land in batch 0, odd in batch 1. Batch 0 alone makes
    // TWO segments (09:00 | 10:00); 09:00 closes, 10:00 stays open.
    // The odd-id 09:30 arrives a batch later: within the gap of the
    // OPEN session it merges (09:30–10:00) — but it can never re-open
    // the closed 09:00 one, even though in plain batch sessionization
    // it would bridge all three into a single session.
    val events = Seq(
      ev(2, "2024-01-01 09:00:00", 1, "a", 1.0),
      ev(4, "2024-01-01 10:00:00", 1, "b", 2.0),
      ev(1, "2024-01-01 09:30:00", 1, "c", 4.0)).toDS()
    val replay = EventStreams.sessionizeReplay(events, gapSeconds = 1800L, nBatches = 2)
      .collect().sortBy(_.first_ts.getTime).toList
    assert(replay == List(
      Session(1L, 1L, 1.0, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00")),
      Session(1L, 2L, 6.0, ts("2024-01-01 09:30:00"), ts("2024-01-01 10:00:00"))),
      s"got $replay")
    // the plain batch twin on identical events: ONE bridged session —
    // the replay demonstrably pins the stream contract, not batch's
    assert(EventStreams.sessionizeBatch(events.toDF(), gapSeconds = 1800L).count() == 1)
    // nBatches = 1 degenerates to the batch twin exactly
    val one = EventStreams.sessionizeReplay(events, gapSeconds = 1800L, nBatches = 1)
      .collect().toList
    assert(one == List(
      Session(1L, 3L, 7.0, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00"))),
      s"got $one")
  }

  test("sessionize runs as a real stream: gap close + watermark flush, no spin") {
    // regression: with ProcessingTimeTimeout the engine span empty
    // micro-batches back-to-back (shouldRunAnotherBatch always true)
    // and processAllAvailable never returned — this test HUNG. With
    // EventTimeTimeout it quiesces, and the watermark flushes state.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS(), gapSeconds = 1800)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    input.addData(
      ev(1, "2024-01-01 10:00:00", 1, "click", 1.0),
      ev(2, "2024-01-01 10:30:00", 1, "view", 2.0))
    query.processAllAvailable()
    // >gap jump closes user 1's first session in-stream
    input.addData(ev(3, "2024-01-01 13:00:00", 1, "click", 4.0))
    query.processAllAvailable()
    // another user's much later event advances the watermark past the
    // open session's gap horizon (13:30) → event-time timeout flushes it
    input.addData(ev(4, "2024-01-01 15:00:00", 2, "click", 8.0))
    query.processAllAvailable()
    query.stop()
    val got = spark.table("sess_stream").as[Session].collect().toSet
    assert(got == Set(
      Session(1L, 2L, 3.0, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00")),
      Session(1L, 1L, 4.0, ts("2024-01-01 13:00:00"), ts("2024-01-01 13:00:00"))),
      s"got $got")
  }

  test("foldBatch: a late chain connecting to the open session merges whole") {
    val gapMs = 1800 * 1000L
    val (_, open1) = EventStreams.foldBatch(None,
      Seq(ev(1, "2024-01-01 10:00:00", 1, "click", 1.0)), gapMs)
    // 09:40 is within the gap of 10:00; 09:20 is within the gap of
    // 09:40 — the chain connects to the open session END-to-start, so
    // all three belong together (exactly what the batch twin computes)
    val (c2, open2) = EventStreams.foldBatch(open1, Seq(
      ev(2, "2024-01-01 09:40:00", 1, "view", 2.0),
      ev(3, "2024-01-01 09:20:00", 1, "view", 4.0)), gapMs)
    assert(c2.isEmpty, s"got $c2")
    assert(open2.exists(s =>
      s.n == 3 && s.firstMs == ts("2024-01-01 09:20:00").getTime &&
        s.lastMs == ts("2024-01-01 10:00:00").getTime), s"open=$open2")
  }

  test("dedupDocStream rejects frames carrying its staging columns") {
    import spark.implicits._
    val store = graft.ops.Dedup.exactFingerprintStore(
      Seq((1L, "x")).toDF("doc_id", "text"), "text")
    val bad = Seq((1L, ts("2024-01-01 10:00:00"), "x", "boom"))
      .toDF("doc_id", "ts", "text", "__fp")
    intercept[IllegalArgumentException] {
      dedupDocStream(bad, "text", "ts", "10 minutes", store)
    }
  }

  test("dedupDocStream batch twin: same semantics on a static frame") {
    import spark.implicits._
    val store = graft.ops.Dedup.exactFingerprintStore(
      Seq((100L, "old news")).toDF("doc_id", "text"), "text")
    val docs = Seq(
      Doc(1, ts("2024-01-01 10:00:00"), "fresh content one"),
      Doc(2, ts("2024-01-01 10:01:00"), "old news"),
      Doc(3, ts("2024-01-01 10:02:00"), "fresh content one"),
      Doc(4, ts("2024-01-01 10:03:00"), "fresh content two")).toDF()
    val kept = dedupDocStream(docs, "text", "ts", "10 minutes", store)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }
}

/** top-level: Spark encoders can't capture a suite-inner class */
case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)
