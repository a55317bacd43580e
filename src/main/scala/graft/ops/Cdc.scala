package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture and slowly-changing-dimension operators — the
  * lakehouse mutation surface (MERGE INTO / SCD2 dimension builds)
  * expressed as pure keyed joins and windows, no table format
  * required.
  *
  * Scale shape: everything is keyed by the entity/primary key. The
  * compaction is one map-side-combined `max_by` aggregate; the merge
  * is one anti-join plus a union; SCD2 is two windows over one hash
  * exchange. No operator ever moves more than the changed rows plus
  * the base rows once.
  */
object Cdc {

  /** Latest change per key from a CDC stream slice:
    * `max_by(row, versionCol)` per key — one aggregate, map-side
    * combined. `versionCol` must totally order each key's changes
    * (a log sequence number / commit timestamp); ties are broken
    * arbitrarily, so don't feed duplicate versions per key.
    * Keeps every column (including the op column) of the winning row.
    */
  def compactChanges(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String): DataFrame = {
    val payload = changes.columns.toIndexedSeq.filterNot(keyCols.contains)
    changes.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), col(versionCol)).as("__w"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** MERGE a compacted change set into a base snapshot,
    * upsert-or-delete semantics: the latest change per key wins —
    * `opCol == deleteOp` removes the key, anything else replaces (or
    * inserts) the row. Returns the new snapshot with base's schema.
    *
    * Plan: compact → one left-anti join (base keys untouched by any
    * change survive as-is) → union the non-delete winners. Both sides
    * shuffle by the key once; at 100 TB the anti-join is the
    * unavoidable cost of not having a sorted/bucketed table format,
    * and with one (Iceberg-bucketed base + same-bucketed changes) it
    * becomes storage-partitioned and shuffle-free.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val missing = base.columns.filterNot(changes.columns.contains)
    require(missing.isEmpty,
      s"changes must carry every base column (plus $versionCol/$opCol); " +
        s"missing: ${missing.mkString(", ")}")
    val latest = compactChanges(changes, keyCols, versionCol)
    val untouched = base.join(latest.select(keyCols.map(col): _*), keyCols, "left_anti")
    // NULL op must read as upsert, not silently vanish: a bare
    // `op =!= deleteOp` is NULL for NULL ops and the filter would
    // treat an op-less change as a delete.
    val upserts = latest.filter(!coalesce(col(opCol) === deleteOp, lit(false)))
      .select(base.columns.toIndexedSeq.map(col): _*)
    untouched.unionByName(upserts)
  }

  /** Type-2 slowly-changing dimension from a keyed event/snapshot
    * log: one row per state EPISODE with `valid_from` = first ts of
    * the state, `valid_to` = the next state's start (NULL while
    * current), `is_current` flag. Consecutive rows with identical
    * `stateCols` collapse into one episode (re-asserting the same
    * state is not a change).
    *
    * Two windows (lag to detect change, lead for the horizon) over
    * ONE hash exchange on the key; `orderCol` breaks ts ties so the
    * episode sequence is total. This is the dimension-build the
    * medallion silver layer performs when the upstream is a change
    * log rather than full snapshots.
    */
  def scd2FromLog(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      orderCol: String,
      stateCols: Seq[String]): DataFrame = {
    val reserved = Set("valid_from", "valid_to", "is_current", "__prev_state")
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"scd2FromLog reserves ${reserved.mkString("/")}; rename: ${shadowing.mkString(", ")}")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(orderCol))
    val state = struct(stateCols.map(col): _*)
    val episodes = df
      .withColumn("__prev_state", lag(state, 1).over(w))
      .filter(col("__prev_state").isNull || col("__prev_state") =!= state)
    episodes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCol +: stateCols).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)
  }

  /** Diff two keyed snapshots — the inverse of [[applyChanges]]: when
    * the upstream can only hand over full table states (the common
    * case for vendor dumps and daily exports), the change feed has to
    * be SYNTHESIZED. One row per differing key:
    *
    *  - `change_type` — 'I' (key only in `after`), 'D' (only in
    *    `before`), 'U' (present in both with any payload difference),
    *  - `changed_cols` — comma-joined names of the differing payload
    *    columns in schema order ('' for I/D — the whole row moved),
    *
    * followed by the AFTER payload for I/U rows and the BEFORE payload
    * for D rows, so the output IS an upsert-or-delete change set:
    * `applyChanges(before, diff + version, ..., opCol = "change_type",
    * deleteOp = "D")` reproduces `after` exactly (specced).
    *
    * Comparison is NULL-safe per column (`<=>` — NULL vs NULL is
    * equal, NULL vs value is a change). Identical rows produce NO
    * output: at 100 TB the diff of two dailies is change-sized, and
    * everything after the one full-outer key join (the unavoidable
    * cost of keyed comparison; storage-partitioned with a bucketed
    * format) is a codegen'd projection + filter.
    */
  def snapshotDiff(
      before: DataFrame,
      after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(before.columns.sameElements(after.columns),
      s"schemas must match: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val payload = before.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty, "need at least one non-key column to diff")
    val reserved = Set("change_type", "changed_cols", "__b", "__a")
    val shadowing = before.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"snapshotDiff reserves ${reserved.mkString("/")}; rename: ${shadowing.mkString(", ")}")
    val b = before.select(
      keyCols.map(col) :+ struct(payload.map(col): _*).as("__b"): _*)
    val a = after.select(
      keyCols.map(col) :+ struct(payload.map(col): _*).as("__a"): _*)
    val joined = b.join(a, keyCols, "full_outer")
    val changedCols = concat_ws(",", payload.map(c =>
      when(!(col(s"__b.$c") <=> col(s"__a.$c")), lit(c))): _*)
    val side = when(col("change_type") === "D", col("__b")).otherwise(col("__a"))
    joined
      .withColumn(
        "change_type",
        when(col("__b").isNull, lit("I"))
          .when(col("__a").isNull, lit("D"))
          .when(!(col("__b") <=> col("__a")), lit("U")))
      .filter(col("change_type").isNotNull)
      .withColumn(
        "changed_cols",
        when(col("change_type") === "U", changedCols).otherwise(lit("")))
      .select(
        keyCols.map(col) ++ Seq(col("change_type"), col("changed_cols")) ++
          payload.map(c => side.getField(c).as(c)): _*)
  }
}
