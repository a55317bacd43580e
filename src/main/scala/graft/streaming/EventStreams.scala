package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming over event streams (the `events` table shape:
  * event_id, ts, user_id, event_type, value).
  *
  * The reference is batch-only (SURVEY §2.7) — its checkin data is
  * event-like but processed as batch. These operators are the
  * streaming counterparts a production deployment of the same pipeline
  * needs: tumbling-window aggregation with watermarking (late-data
  * drop), and custom sessionization state via
  * `flatMapGroupsWithState`.
  *
  * Scale notes: windowed aggregation is an incremental stateful
  * hash-agg keyed by (window, event_type) — state size is bounded by
  * the watermark horizon × group cardinality, not stream length.
  * Sessionization keys state by user; `EventTimeTimeout`/watermark
  * expiry bounds state. Both run identically on a 1000-executor
  * cluster: state is partitioned by the groupBy key.
  */
object EventStreams {

  /** One input event (the events-table row shape). */
  final case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  /** One closed (or flushed) user session. */
  final case class Session(
      user_id: Long,
      n_events: Long,
      total_value: Double,
      first_ts: java.sql.Timestamp,
      last_ts: java.sql.Timestamp)

  /** Tumbling-window counts/sums per event type with late-data
    * tolerance `watermark` (e.g. "10 minutes") and window length
    * `windowLength` (e.g. "1 hour"). Works on a streaming OR batch
    * DataFrame with the events schema — same plan, which is what makes
    * the batch pipeline's semantics reusable for streams.
    */
  def windowedAgg(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  /** Streaming exact-dedup: drop records whose `keyCols` fingerprint
    * was already seen within the event-time watermark horizon
    * (`dropDuplicatesWithinWatermark` expires per-key state past the
    * horizon, so state is bounded). The streaming counterpart of
    * [[graft.ops.Dedup.dedupExact]] — content-hash the payload into a
    * key column upstream for content dedup. On a batch frame this is
    * plain `dropDuplicates`.
    */
  def dedupStream(
      events: DataFrame,
      tsCol: String,
      watermark: String,
      keyCols: Seq[String]): DataFrame =
    if (events.isStreaming)
      events.withWatermark(tsCol, watermark).dropDuplicatesWithinWatermark(keyCols)
    else events.dropDuplicates(keyCols)

  /** Streaming document dedup against a PERSISTED fingerprint store —
    * the streaming closure of the X48 exact screen
    * ([[graft.ops.Dedup.dedupExactAgainst]]): a continuously-ingesting
    * crawl drops (1) re-deliveries and intra-stream copies via
    * watermark-bounded `dropDuplicatesWithinWatermark` on the content
    * fingerprint, then (2) everything history already holds via a
    * stream-static LEFT ANTI join against the store frame. NOTE the
    * static-side freshness contract: for a plain parquet-backed store
    * the FILE LISTING is fixed when the DataFrame is created
    * (InMemoryFileIndex) — each micro-batch re-reads the listed files
    * but does NOT discover newly appended ones, so offline appends by
    * `--pipeline dedup-increment` are only picked up by rebuilding
    * the store frame (restart the query, or resolve the store inside
    * `foreachBatch`), or by backing the store with a refreshable
    * table format. Until then the stream dedups against the listing
    * it started with.
    *
    * State is bounded by rate × watermark horizon (the fingerprint set
    * inside the watermark), never stream length; the anti-join is
    * stateless per micro-batch. Works identically on batch frames
    * (plain dropDuplicates + anti-join) for backfills.
    */
  def dedupDocStream(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String,
      store: DataFrame,
      fingerprintCol: String = "fingerprint"): DataFrame = {
    val reserved = Seq("__fp", "__store_fp")
    val shadowing = docs.columns.filter(reserved.contains)
    require(shadowing.isEmpty,
      s"dedupDocStream reserves ${reserved.mkString("/")}; rename: ${shadowing.mkString(", ")}")
    val withFp = docs.withColumn("__fp", graft.ops.Dedup.fingerprint(col(textCol)))
    val inStream =
      if (docs.isStreaming)
        withFp.withWatermark(tsCol, watermark)
          .dropDuplicatesWithinWatermark(Seq("__fp"))
      else withFp.dropDuplicates("__fp")
    inStream
      .join(
        store.select(col(fingerprintCol).as("__store_fp")),
        col("__fp") === col("__store_fp"),
        "left_anti")
      .drop("__fp")
  }

  /** Stream-static enrichment: join a stream to a (small) static
    * dimension frame by equi-key. The static side broadcasts, so each
    * micro-batch is a map-side hash join — no streaming state at all
    * (contrast [[attributionJoin]], which must buffer both sides).
    * The static frame is re-read per micro-batch by Spark when it is
    * file-backed, which is what makes slowly-changing dims pick up
    * updates without restarting the query.
    */
  def enrichStream(
      stream: DataFrame,
      dim: DataFrame,
      on: Seq[String],
      joinType: String = "left"): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), on, joinType)

  /** Stream-stream attribution join: each left event (e.g. purchase)
    * picks up every right event (e.g. view) by the same user within
    * `lookback` BEFORE it — the streaming counterpart of the batch
    * [[graft.ops.Joins.asofJoin]] family (stream-stream joins can't
    * rank "the latest", so this emits all in-window matches; aggregate
    * downstream if one-row-per-left is needed).
    *
    * Both sides carry watermarks and the join condition carries the
    * time bound, which is what lets Spark expire join state: buffered
    * rows older than watermark + lookback are dropped, so state is
    * bounded by rate × horizon, never stream length. `leftOuter`
    * emits unmatched left rows (with nulls) once the watermark passes
    * their window. Works identically on batch frames (plain
    * condition join, no watermark).
    *
    * Right columns come back prefixed with `rightPrefix`. Key and
    * timestamp column names are parameters (the events-table shape is
    * only the default); both sides must carry all `on` keys and their
    * own timestamp column.
    */
  def attributionJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String] = Seq("user_id"),
      leftTs: String = "ts",
      rightTs: String = "ts",
      watermark: String = "10 minutes",
      lookback: String = "30 minutes",
      joinType: String = "leftOuter",
      rightPrefix: String = "matched_"): DataFrame = {
    require(on.nonEmpty, "attributionJoin requires at least one equi key")
    graft.ops.Joins.requireIntervalLiteral(lookback, "attributionJoin lookback")
    val l = (if (left.isStreaming) left.withWatermark(leftTs, watermark) else left)
      .alias("l")
    val renamed = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"$rightPrefix$c")
    }
    val r = (if (renamed.isStreaming)
               renamed.withWatermark(s"$rightPrefix$rightTs", watermark)
             else renamed).alias("r")
    val keysEqual = on
      .map(k => col(s"l.$k") === col(s"r.$rightPrefix$k"))
      .reduce(_ && _)
    val lt = col(s"l.$leftTs")
    val rt = col(s"r.$rightPrefix$rightTs")
    l.join(
      r,
      keysEqual && rt <= lt && rt >= lt - expr(s"INTERVAL $lookback"),
      joinType)
  }

  /** Batch gap-sessionization, the relational twin of [[sessionize]]:
    * a session break is a gap > `gapSeconds` between consecutive
    * events of the same user; `session_idx` is the running count of
    * breaks (1-based) and sessions aggregate count/sum/min/max. Emits
    * EVERY session (batch has no open-state notion) with a
    * deterministic per-user index, where the streaming form emits
    * closed sessions as gaps arrive.
    *
    * Scale shape: both windows partition by the user key, so work
    * parallelizes across users at any corpus size; ONE user's history
    * sorts within one task — bounded by per-entity event volume, the
    * inherent sessionization contract (time-slice or pre-filter
    * hyperactive synthetic keys upstream). The gap test is an exact
    * day-time-interval comparison (microsecond precision, timezone-
    * free — works for TIMESTAMP and TIMESTAMP_NTZ alike), which
    * external engines replay exactly as integer-microsecond epoch
    * differences; the running sum uses the default running frame of an
    * ordered window. (`orderCol` breaks timestamp ties — required for
    * a total order and thus cross-engine determinism.)
    */
  def sessionizeBatch(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      orderCol: String = "event_id",
      gapSeconds: Long = 1800L): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    // Same reserved-name stance as mixSources/semanticDedupPairs: the
    // staging column would silently overwrite an input column of the
    // same name, and an input column matching an output aggregate name
    // would silently vanish into the groupBy — refuse both.
    val reserved = Set("__new_sess", "session_idx",
      "n_events", "total_value", "session_start", "session_end")
    val shadowing = events.columns.filter(reserved)
    require(
      shadowing.isEmpty,
      s"sessionizeBatch reserves column names ${reserved.mkString("/")} " +
        s"for staging and output; rename: ${shadowing.mkString(", ")}")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    // gapSeconds is a validated Long, so the interval literal is safe
    val isNew = when(
      prevTs.isNull || col(tsCol) - prevTs > expr(s"INTERVAL '$gapSeconds' SECOND"), 1L)
      .otherwise(0L)
    events
      .withColumn("__new_sess", isNew)
      .withColumn("session_idx", sum(col("__new_sess")).over(w))
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
  }

  /** Event-time sessionization: events for a user belong to one
    * session until a gap larger than `gapSeconds`. Emits a [[Session]]
    * row when a gap closes a session; remaining state flushes when the
    * event-time watermark passes the session's gap horizon
    * (`EventTimeTimeout`).
    *
    * EventTimeTimeout is load-bearing, not a style choice:
    * ProcessingTimeTimeout makes `FlatMapGroupsWithStateExec
    * .shouldRunAnotherBatch` return true on EVERY batch, so with the
    * default (as-fast-as-possible) trigger the engine spins empty
    * micro-batches back-to-back — reloading and committing every
    * state store each time — and `processAllAvailable` never observes
    * a quiescent stream (reproduced here: 849 empty batches in ~3
    * minutes on a 3-event input). With an event-time timeout the
    * engine re-triggers only when the watermark advances.
    *
    * Watermark semantics callers must know:
    * - rows older than the watermark are DROPPED by the engine before
    *   this function sees them (standard stateful-operator contract).
    *   `watermark` defaults to the session gap itself, so cross-batch
    *   disorder up to one gap is sessionized exactly ([[foldBatch]]'s
    *   late-merge/deep-late handling still applies to rows above the
    *   watermark — e.g. a key whose open session is much older than
    *   the global max event time); rows more than `watermark` behind
    *   the global max are lost, not sessionized. Size it to the
    *   stream's real disorder.
    * - trailing sessions flush only when the watermark ADVANCES, i.e.
    *   when newer data arrives. An idle stream holds its final open
    *   sessions in state indefinitely (the price of not busy-spinning
    *   on a wall-clock timeout); drain by stopping the query or by
    *   injecting heartbeat events past the horizon.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800L,
      watermark: String = ""): Dataset[Session] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val delay = if (watermark.nonEmpty) watermark else s"$gapSeconds seconds"
    val src =
      if (streaming) events.withWatermark("ts", delay) else events
    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(_.toSession(userId)).toSeq
            state.remove()
            out.iterator
          } else {
            val (closed, open) =
              foldBatch(state.getOption, rows.toSeq, gapSeconds * 1000)
            open.foreach { s =>
              state.update(s)
              // the horizon must sit strictly past the current
              // watermark (another key's events may have advanced it
              // beyond this session's own gap horizon); batch
              // execution has no watermark to read, and its timeouts
              // never fire anyway
              val horizon = s.lastMs + gapSeconds * 1000
              state.setTimeoutTimestamp(
                if (streaming) math.max(horizon, state.getCurrentWatermarkMs() + 1)
                else horizon)
            }
            closed.map(_.toSession(userId)).iterator
          }
      }
  }

  /** Deterministic batch replay of the [[foldBatch]] micro-batch
    * contract — the CORRECTNESS-visible oracle surface for the
    * streaming sessionizer's cross-batch semantics (deep-late events
    * emit as their own sessions instead of silently stretching the
    * open one; only segments within the gap of the carried span
    * merge; closed is closed).
    *
    * Each user's events split into `nBatches` arrival batches by
    * `event_id % nBatches` — a deterministic stand-in for arrival
    * order that intentionally BREAKS time order, so the late-merge
    * and deep-late paths actually run — then fold through the real
    * [[foldBatch]] in batch order and flush the final open session.
    * Distribution is the stream's own shape: one group per user, the
    * state machine inside the group, no driver-side state; group
    * size is a user's event count (the same bound the streaming
    * state store carries), never the table.
    */
  def sessionizeReplay(
      events: Dataset[Event],
      gapSeconds: Long,
      nBatches: Int): Dataset[Session] = {
    import events.sparkSession.implicits._
    require(nBatches >= 1, "nBatches must be >= 1")
    events.groupByKey(_.user_id).flatMapGroups { (userId, it) =>
      val byBatch = it.toSeq.groupBy(e => math.floorMod(e.event_id, nBatches.toLong))
      var open: Option[SessionState] = None
      val closed = List.newBuilder[SessionState]
      (0L until nBatches.toLong).foreach { b =>
        val (c, o) =
          foldBatch(open, byBatch.getOrElse(b, Seq.empty), gapSeconds * 1000)
        closed ++= c
        open = o
      }
      (closed.result() ++ open.toList).map(_.toSession(userId)).iterator
    }
  }

  /** One micro-batch of a user's events folded into the carried
    * session state: returns (closed segments in time order, open
    * tail). Pure — the streaming wrapper only owns the GroupState
    * plumbing, so cross-batch semantics are unit-testable without a
    * streaming query.
    *
    * Events sort within the batch and run the plain gap chain —
    * exactly what [[sessionizeBatch]] computes over the same events —
    * yielding >gap-separated segments. The carried state then merges
    * with every segment overlapping or within gap of its own span;
    * anything separated by more than the gap closes on its own. This
    * path has no watermark, so a deep-late cross-batch event must NOT
    * silently stretch the open session across an arbitrary gap (it
    * emits as its own session, as the batch twin would), and must not
    * drag the open bounds backwards either. No transitive re-check is
    * needed: chain segments are >gap apart by construction, so a
    * segment not connected to the open session's own span cannot
    * connect through one that is.
    */
  private[graft] def foldBatch(
      prev: Option[SessionState],
      batch: Seq[Event],
      gapMs: Long): (List[SessionState], Option[SessionState]) = {
    val sorted = batch.sortBy(_.ts.getTime)
    val segs = scala.collection.mutable.ListBuffer.empty[SessionState]
    sorted.foreach { e =>
      segs.lastOption match {
        case Some(c) if e.ts.getTime - c.lastMs <= gapMs =>
          segs(segs.length - 1) = c.add(e)
        case _ => segs += SessionState.start(e)
      }
    }
    prev.foreach { s =>
      val (connected, rest) = segs.partition(c =>
        c.lastMs >= s.firstMs - gapMs && s.lastMs >= c.firstMs - gapMs)
      val merged = connected.foldLeft(s)(_.merge(_))
      segs.clear()
      segs ++= rest
      val i = segs.indexWhere(_.firstMs > merged.firstMs)
      if (i < 0) segs += merged else segs.insert(i, merged)
    }
    (segs.toList.dropRight(1), segs.lastOption)
  }

  /** Mutable-free session accumulator kept in GroupState. `add` takes
    * min/max of the bounds rather than trusting arrival order: events
    * sort only WITHIN a micro-batch, so a late cross-batch event would
    * otherwise drag `lastMs` backwards and emit a session whose
    * first_ts > last_ts (then spuriously split on the next event).
    */
  final case class SessionState(
      n: Long,
      total: Double,
      firstMs: Long,
      lastMs: Long) {
    def add(e: Event): SessionState =
      SessionState(n + 1, total + e.value,
        math.min(firstMs, e.ts.getTime), math.max(lastMs, e.ts.getTime))
    /** Union of two session spans (used when a late segment connects
      * to the carried state). */
    def merge(o: SessionState): SessionState =
      SessionState(n + o.n, total + o.total,
        math.min(firstMs, o.firstMs), math.max(lastMs, o.lastMs))
    def toSession(userId: Long): Session =
      Session(userId, n, total,
        new java.sql.Timestamp(firstMs), new java.sql.Timestamp(lastMs))
  }
  object SessionState {
    def start(e: Event): SessionState =
      SessionState(1L, e.value, e.ts.getTime, e.ts.getTime)
  }
}
