package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.ops.Cdc

/** Continuous CDC → queryable snapshot: a streaming change feed
  * MERGEd into an on-disk parquet snapshot per micro-batch — the
  * "streaming upsert into the lakehouse" sink
  * (reference analogue: the write stage of
  * /root/reference/yelp_etl/common/write.py:24-53, which targets
  * Iceberg V2 row-level deletes; here the merge itself is the
  * library's relational [[graft.ops.Cdc.applyChanges]] so no table
  * format is required).
  *
  * Semantics per micro-batch: compact the batch to the latest change
  * per key (`versionCol` must totally order each key's changes,
  * ACROSS batches too), then upsert-or-delete into the snapshot and
  * atomically swap the result in (write-to-`.next`, rename
  * cur→`.old`, promote, drop — the same crash-safe discipline as the
  * crawl-cycle stores: the live snapshot always has an on-disk copy,
  * and a restart between renames restores from `.old`).
  *
  * Delivery: foreachBatch is at-least-once — a batch can re-run after
  * a failure. The merge is IDEMPOTENT for re-applied batches (same
  * latest-per-key outcome), which is exactly the property that makes
  * at-least-once safe here; it is not safe against versionless feeds,
  * hence the total-order requirement.
  *
  * Scale: each batch costs one key anti-join against the snapshot +
  * a union — the relational MERGE price. At warehouse scale the
  * snapshot side wants a bucketed/sorted format (Iceberg) to make
  * that join storage-partitioned; this sink is the format-free
  * equivalent with identical semantics.
  */
object SnapshotUpsert {

  /** One micro-batch merge: read the current snapshot (bootstrap:
    * empty with the batch's base schema), MERGE, swap in. Separated
    * from [[start]] so the batch core is directly testable.
    */
  def applyBatch(
      batch: DataFrame,
      snapshotPath: String,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String = "D"): Unit = {
    val spark = batch.sparkSession
    val curP = new Path(snapshotPath)
    val fs = curP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Mid-swap crash recovery + write-to-.next-then-promote are the
    // shared store-lifecycle discipline (graft.io.AtomicSwap): the
    // merge plan READS the current snapshot, so it is never
    // overwritten in place, and no crash point loses it.
    graft.io.AtomicSwap.recover(spark, snapshotPath)
    val base =
      if (fs.exists(curP)) spark.read.parquet(snapshotPath)
      else batch.drop(versionCol, opCol).limit(0)
    val merged = Cdc.applyChanges(base, batch, keyCols, versionCol, opCol, deleteOp)
    val nextPath = snapshotPath + ".next"
    merged.write.mode("overwrite").parquet(nextPath)
    graft.io.AtomicSwap.swapIn(spark, snapshotPath, nextPath)
  }

  /** Start the continuous upsert: every micro-batch of `changes`
    * merges into `snapshotPath`. `checkpointDir` makes restarts
    * resume from the last committed batch.
    */
  def start(
      changes: DataFrame,
      snapshotPath: String,
      checkpointDir: String,
      keyCols: Seq[String],
      versionCol: String,
      opCol: String,
      deleteOp: String = "D"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, snapshotPath, keyCols, versionCol, opCol, deleteOp)
      }
      .start()
}
