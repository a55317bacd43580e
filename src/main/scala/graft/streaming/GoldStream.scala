package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.io.AtomicSwap
import graft.ops.IncrementalAgg

/** Continuous incremental gold table — the streaming closure of
  * [[graft.pipeline.GoldIncrement]]: each micro-batch's
  * [[IncrementalAgg.partials]] fold into the persisted per-group
  * state, with the EXACTLY-ONCE guarantee aggregation state needs
  * (unlike [[SnapshotUpsert]]'s keyed MERGE, re-applying an increment
  * here would double-count).
  *
  * Fencing: every state row carries `__batch_id`, the highest batch
  * folded in. A re-delivered batch (foreachBatch is at-least-once —
  * restarts re-run the last uncommitted batch) sees
  * `batchId <= max(__batch_id)` and skips: the fence and the state it
  * protects live in ONE dataset behind ONE [[graft.io.AtomicSwap]],
  * so no crash point can separate them (a two-file design — state +
  * marker — would double-count or drop a batch when dying between
  * the two swaps).
  */
object GoldStream {

  /** One fenced micro-batch fold. Returns true if the batch was
    * folded, false if the fence skipped a re-delivery.
    */
  def applyBatch(
      batch: DataFrame,
      batchId: Long,
      statePath: String,
      groupCols: Seq[String],
      valueCol: String): Boolean = {
    val spark = batch.sparkSession
    AtomicSwap.recover(spark, statePath)
    val curP = new Path(statePath)
    val fs = curP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = if (fs.exists(curP)) Some(spark.read.parquet(statePath)) else None
    val lastBatch = existing
      .flatMap(s => Option(s.agg(max("__batch_id")).head().get(0)))
      .map(_.asInstanceOf[Long]).getOrElse(-1L)
    if (batchId <= lastBatch) return false
    val inc = IncrementalAgg.partials(batch, groupCols, valueCol)
    val merged = existing match {
      case Some(s) => IncrementalAgg.merge(s.drop("__batch_id"), inc)
      case None => IncrementalAgg.merge(inc)
    }
    val next = statePath + ".next"
    merged.withColumn("__batch_id", lit(batchId))
      .write.mode("overwrite").parquet(next)
    AtomicSwap.swapIn(spark, statePath, next)
    true
  }

  /** Start the continuous fold: every micro-batch of `changes` merges
    * into the state under `statePath`; read it back through
    * [[IncrementalAgg.finalize]] (dropping `__batch_id`).
    */
  def start(
      changes: DataFrame,
      statePath: String,
      checkpointDir: String,
      groupCols: Seq[String],
      valueCol: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, statePath, groupCols, valueCol)
        ()
      }
      .start()
}
