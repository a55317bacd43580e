package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: backward as-of
  * join and point-in-interval range join.
  *
  * Both are composed from existing relational operators (brief's
  * preference (a)) rather than a custom `SparkPlan`: the as-of join is
  * one hash-shuffle + one sort — the exact cost profile of the
  * sort-merge join Spark would plan for an equi-join on the same keys —
  * and the range join is an equi-join on a derived bin key, so Catalyst
  * still gets to pick broadcast vs shuffle sides, reorder, and push
  * filters.
  *
  * 100 TB design notes:
  *  - [[asofJoin]] never materializes the O(left × right-per-key)
  *    candidate space a naive `t_r <= t_l` theta-join would: both sides
  *    shuffle ONCE by the equi keys, sort within partitions by
  *    (time, side), and a running `last(ignoreNulls)` window resolves
  *    every left row in a single pass. Hot keys skew exactly like a
  *    sort-merge join would and can be pre-salted by the caller.
  *  - [[pointInIntervalJoin]] turns an inequality-only join (which
  *    Spark plans as BroadcastNestedLoop/cartesian) into an equi-join
  *    on a time bin: intervals replicate to each bin they cover
  *    (bounded fanout, `maxBinsPerInterval` guards mis-sized bins),
  *    points map to exactly one bin — so every matching pair meets in
  *    exactly one bin and the join needs no post-`distinct`. A small
  *    interval side broadcasts; a large one degrades to one shuffle on
  *    the bin key.
  */
object Joins {

  /** Internal column names [[asofJoin]] stages through the union;
    * user columns may not shadow them (the guard below rejects). */
  private val asofReserved = Set("__time", "__side", "__p", "__m", "__mt")

  /** Whitelist for [[asofJoin]]'s `tolerance`: one or more
    * `<count> <unit>` terms, ANSI interval units only. Validated
    * BEFORE splicing into `expr(s"INTERVAL ...")` so a malformed (or
    * hostile) string fails with a clear message instead of an opaque
    * parser error — the string otherwise reaches the SQL parser
    * verbatim. */
  private val tolerancePattern =
    """(?i)^\s*\d+\s+(year|month|week|day|hour|minute|second|millisecond|microsecond)s?(\s+\d+\s+(year|month|week|day|hour|minute|second|millisecond|microsecond)s?)*\s*$""".r

  /** Shared guard for APIs that splice a duration string into
    * `expr(s"INTERVAL ...")` ([[asofJoin]]'s tolerance,
    * [[graft.streaming.EventStreams.attributionJoin]]'s lookback). */
  private[graft] def requireIntervalLiteral(t: String, what: String): Unit =
    require(
      tolerancePattern.pattern.matcher(t).matches,
      s"$what must be '<count> <unit>' interval terms " +
        s"(e.g. \"30 minutes\", \"1 day 12 hours\"); got: \"$t\"")

  /** Backward as-of join: for each left row, attach the single most
    * recent right row with the same `on` keys and right time ≤ left
    * time (strictly < when `inclusive=false`) — the standard
    * enrich-events-with-latest-state operator (pandas `merge_asof`,
    * many SQL engines' `ASOF JOIN`).
    *
    * Left-outer semantics: unmatched left rows survive with null
    * right columns. Every right column except the keys is attached,
    * prefixed with `rightPrefix`; the matched right time is attached
    * as `rightPrefix + rightTs`.
    *
    * `tolerance` (e.g. `"30 minutes"`): matches older than
    * `leftTs - tolerance` are nulled out (the row survives). Applied
    * after the window pass, so it costs one codegen'd projection.
    *
    * Ties: right rows sharing (keys, time) are resolved by whichever
    * sorts last — make the right side unique per (keys, time) first
    * (e.g. `max_by`) when downstream needs full determinism.
    *
    * Shape: `unionByName` (cheap, no shuffle) → one Exchange on the
    * equi keys → one in-partition sort on (time, side) → running
    * `last(struct, ignoreNulls)` with a rows-frame (streaming window
    * evaluation, no buffering of the whole partition) → filter to left
    * rows. The right payload rides inside ONE struct column so a
    * genuinely-null right attribute is not confused with "no match".
    *
    * `forward = true` flips the direction: each left row matches the
    * EARLIEST right row at-or-after (strictly after when
    * `inclusive=false`) its time — same plan, descending traversal.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTs: String,
      rightTs: String,
      inclusive: Boolean = true,
      tolerance: Option[String] = None,
      rightPrefix: String = "asof_",
      forward: Boolean = false): DataFrame = {
    require(on.nonEmpty, "asofJoin requires at least one equi key")
    val shadowing = (left.columns ++ right.columns)
      .filter(c => asofReserved(c) || c.startsWith("__l_")).distinct
    require(
      shadowing.isEmpty,
      s"asofJoin reserves column names ${asofReserved.mkString("/")} and the " +
        s"__l_ prefix for internal staging; rename: ${shadowing.mkString(", ")}")
    tolerance.foreach(requireIntervalLiteral(_, "asofJoin tolerance"))
    val payloadCols = right.columns.toSeq.filterNot(c => on.contains(c) || c == rightTs)
    // At equal times an inclusive join must see the right row (sort it
    // before the left row in traversal order), a strict one must not
    // (sort it after).
    val (rightSide, leftSide) = if (inclusive) (0, 1) else (1, 0)
    val payload = struct(
      col(rightTs).as("__t") +: payloadCols.map(col): _*)
    val rightU = right.select(
      on.map(col) ++ Seq(
        col(rightTs).as("__time"),
        lit(rightSide).as("__side"),
        payload.as("__p")) ++
        left.columns.filterNot(c => on.contains(c)).toSeq.map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    val leftU = left.select(
      on.map(col) ++ Seq(
        col(leftTs).as("__time"),
        lit(leftSide).as("__side"),
        lit(null).cast(rightU.schema("__p").dataType).as("__p")) ++
        left.columns.filterNot(c => on.contains(c)).toSeq.map(c =>
          col(c).as(s"__l_$c")): _*)
    val timeOrder = if (forward) col("__time").desc else col("__time").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(timeOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = leftU.unionByName(rightU)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)
    val inTolerance = (tolerance, forward) match {
      case (Some(t), false) => col("__m.__t") >= col("__time") - expr(s"INTERVAL $t")
      case (Some(t), true)  => col("__m.__t") <= col("__time") + expr(s"INTERVAL $t")
      case (None, _)        => col("__m").isNotNull
    }
    val gated = matched.withColumn(
      "__mt", when(inTolerance, col("__m")))
    gated.select(
      on.map(col) ++
        left.columns.filterNot(c => on.contains(c)).toSeq.map(c =>
          col(s"__l_$c").as(c)) ++
        (col("__mt.__t").as(s"$rightPrefix$rightTs") +:
          payloadCols.map(c => col(s"__mt.$c").as(s"$rightPrefix$c"))): _*)
  }

  /** Default bin mapper for timestamp columns: epoch microseconds
    * floor-divided into `widthMicros` buckets. Monotonic, total — the
    * contract [[pointInIntervalJoin]] needs. Exact integer floor
    * division (`(m − pmod(m, w)) div w`), not `floor(m / w)`: the
    * double round-trip is only exact below 2^53 µs and truncation
    * `div` alone mis-bins pre-epoch timestamps.
    */
  def timeBin(widthMicros: Long): Column => Column = { c =>
    val m = unix_micros(c.cast("timestamp"))
    call_function("div", m - pmod(m, lit(widthMicros)), lit(widthMicros))
  }

  /** Intervals covering more than `maxBins` bins under `bin` — the
    * accounting frame for a capped [[pointInIntervalJoin]] run: each
    * interval's row plus its bin span as `group_size` (same audit
    * pattern as [[Dedup.oversizedBuckets]]; shape and complement
    * guarantees: [[Audit]]).
    */
  def oversizedIntervals(
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bin: Column => Column,
      maxBins: Int): DataFrame =
    intervals
      .withColumn(Audit.GroupSizeCol, bin(col(hiCol)) - bin(col(loCol)) + 1)
      .filter(col(Audit.GroupSizeCol) > maxBins)

  /** Join points to every interval containing them, as an equi-join on
    * a derived bin key: intervals replicate once per covered bin,
    * points map to their single bin, pairs meet exactly once (no
    * dedup pass). Bounds are `lo <= pt` and (`pt < hi`, or `pt <= hi`
    * when `hiInclusive`).
    *
    * Pick `bin` so a typical interval covers O(1) bins (e.g.
    * [[timeBin]] with width ≈ interval length). `maxBinsPerInterval`
    * > 0 drops mis-sized intervals instead of letting one
    * pathological row replicate across the whole time domain —
    * [[oversizedIntervals]] audits what a cap would drop.
    *
    * Output: all point columns plus all interval columns — prefix or
    * prune on the way in if names collide.
    */
  def pointInIntervalJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      bin: Column => Column,
      hiInclusive: Boolean = false,
      maxBinsPerInterval: Int = 0): DataFrame = {
    val capped =
      if (maxBinsPerInterval > 0)
        intervals.filter(
          bin(col(hiCol)) - bin(col(loCol)) + 1 <= maxBinsPerInterval)
      else intervals
    val binned = capped
      .withColumn("__bin", explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    val pointed = points.withColumn("__bin", bin(col(pointCol)))
    val hiOk =
      if (hiInclusive) col(pointCol) <= col(hiCol) else col(pointCol) < col(hiCol)
    pointed
      .join(binned, Seq("__bin"))
      .filter(col(loCol) <= col(pointCol) && hiOk)
      .drop("__bin")
  }

  /** Interval × interval overlap join as an equi-join on a derived bin
    * key (+ optional `extraKeys` equi-columns, e.g. the entity id two
    * per-entity interval sets share). Both sides replicate once per
    * covered bin; a pair overlapping across several shared bins is
    * counted in exactly ONE — the bin of the overlap's start,
    * `bin(greatest(lLo, rLo))`, which both intervals cover whenever
    * they overlap — so no post-join distinct exists in the plan (the
    * same dedup-free accounting as [[pointInIntervalJoin]]'s
    * single-bin points, extended to two replicated sides).
    *
    * Overlap is half-open (`lLo < rHi AND rLo < lHi`) or closed when
    * `hiInclusive`. `maxBinsPerInterval` caps either side's
    * replication ([[oversizedIntervals]] audits what it would drop).
    * At scale the join shuffles both sides by (bin, extraKeys) — or
    * broadcasts a small right side — and a hot bin's cost is bounded
    * by the cap; there is never a cartesian fallback.
    *
    * Output: all left columns then all right columns minus
    * `extraKeys` duplicates — prefix or prune on the way in if other
    * names collide.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      lLoCol: String,
      lHiCol: String,
      right: DataFrame,
      rLoCol: String,
      rHiCol: String,
      bin: Column => Column,
      extraKeys: Seq[String] = Nil,
      hiInclusive: Boolean = false,
      maxBinsPerInterval: Int = 0): DataFrame = {
    def binned(df: DataFrame, lo: String, hi: String) = {
      val capped =
        if (maxBinsPerInterval > 0)
          df.filter(bin(col(hi)) - bin(col(lo)) + 1 <= maxBinsPerInterval)
        else df
      capped.withColumn("__bin", explode(sequence(bin(col(lo)), bin(col(hi)))))
    }
    val overlap =
      if (hiInclusive) col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol)
      else col(lLoCol) < col(rHiCol) && col(rLoCol) < col(lHiCol)
    binned(left, lLoCol, lHiCol)
      .join(binned(right, rLoCol, rHiCol), "__bin" +: extraKeys)
      .filter(overlap && col("__bin") === bin(greatest(col(lLoCol), col(rLoCol))))
      .drop("__bin")
  }
}
