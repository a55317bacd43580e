package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.io.AtomicSwap
import graft.ops.Sketches
import graft.pipeline.HllStore

/** Continuous HLL register maintenance — the streaming closure of
  * [[graft.pipeline.HllStore]]: every micro-batch's register sketch
  * folds into the persisted base, so a live distinct-count (unique
  * tokens/users/URLs per group) is always one register-read away
  * while the raw stream is never stored.
  *
  * Delivery contract — and the reason this needs NO batch-id fence
  * where [[GoldStream]] must carry one: the fold is per-register MAX,
  * which is IDEMPOTENT. foreachBatch is at-least-once (a restart
  * re-runs the last uncommitted batch), and re-folding the same batch
  * re-maxes the same ρ values into registers that already hold them —
  * the state is unchanged. Aggregation-sum state double-counts on
  * re-delivery; max-register state cannot.
  *
  * State layout IS the [[HllStore]] layout (one
  * `registers.parquet` base behind an [[AtomicSwap]], no increment
  * generations — a micro-batch cadence would grow unbounded
  * generations, and the base is only groups × 2^b rows to rewrite),
  * so [[HllStore.estimate]] reads a streaming store and a batch store
  * identically, and the register-width audit applies unchanged: a
  * stream started with a different `b` than the store raises on the
  * first fold instead of corrupting estimates.
  */
object HllStream {

  /** Test seam: runs after the staging write and before the commit
    * re-list — the exact instant where the r18-flagged race lost a
    * concurrent append. Production no-op; HllStreamSpec injects an
    * append here to prove the re-list-and-retry fold absorbs it.
    */
  private[graft] var raceHook: () => Unit = () => ()

  /** Fold one micro-batch into the register base. Safe to re-apply
    * (idempotent max); raises if `b` disagrees with the store.
    */
  def applyBatch(
      batch: DataFrame,
      storeDir: String,
      groupCols: Seq[String],
      valueCol: Column,
      b: Int = 6,
      hasher: (Column, Column) => Column = graft.ops.TextAnalysis.h64): Unit = {
    val spark = batch.sparkSession
    val root = HllStore.registersPath(storeDir)
    AtomicSwap.recover(spark, root)
    val base = s"$root/registers.parquet"
    val fs = new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inc = Sketches.hllSketch(batch, groupCols, valueCol, b, hasher)
    // Fold the WHOLE store — base plus every committed
    // registers_inc_N.parquet generation — not the base alone: the swap
    // below replaces the entire root, so an increment appended by
    // [[HllStore.append]] between folds would otherwise be silently
    // deleted and its data vanish from all later estimates (ADVICE
    // r17). foldedRegisters also audits register width across
    // generations, so a mismatched append still errors here.
    //
    // Writer race (ADVICE r18, closed r20): the fold lists generations
    // eagerly, so an append committing AFTER that listing would be
    // swapped away. The fix is optimistic-concurrency: after writing
    // `.next`, RE-LIST the store; if the generation set changed, drop
    // the stale staging and re-fold (bounded retries — each retry
    // absorbs everything committed so far, so under any finite append
    // rate the loop converges; a pathological appender that outruns
    // `maxRetries` consecutive folds errors loudly instead of losing
    // data). This shrinks the silent-loss window from the WHOLE
    // fold+write (seconds of Spark jobs) to the instants between the
    // final re-list and swapIn's first rename — and an append still
    // in flight there commits INTO the live root just as swapIn
    // renames it away, so its own commit-rename finds its parent gone
    // and fails loudly on the APPEND side (retryable) instead of
    // being silently folded away. Appends that ERROR are therefore
    // possible under concurrency; appends that SUCCEED are never lost.
    val next = root + ".next"
    val maxRetries = 5
    var attempt = 0
    var committed = false
    while (!committed) {
      val seen = HllStore.sources(spark, root)
      val merged =
        if (fs.exists(new Path(base)))
          Sketches.hllMerge(
            HllStore.foldedRegisters(spark, root, groupCols), inc, groupCols)
        else inc
      fs.delete(new Path(next), true)
      merged.write.mode("overwrite").parquet(s"$next/registers.parquet")
      raceHook()
      if (HllStore.sources(spark, root) == seen) {
        AtomicSwap.swapIn(spark, root, next)
        committed = true
      } else {
        attempt += 1
        // >=: error after exactly maxRetries failed validations, as
        // the message states (ADVICE r20 off-by-one).
        if (attempt >= maxRetries)
          sys.error(s"HllStream: store $root gained generations during " +
            s"$maxRetries consecutive folds; quiesce the appender")
      }
    }
  }

  /** Start the continuous fold; read estimates any time through
    * [[HllStore.estimate]].
    */
  def start(
      changes: DataFrame,
      storeDir: String,
      checkpointDir: String,
      groupCols: Seq[String],
      valueCol: Column,
      b: Int = 6,
      hasher: (Column, Column) => Column = graft.ops.TextAnalysis.h64): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, storeDir, groupCols, valueCol, b, hasher)
        ()
      }
      .start()
}
