package graft.pipeline

import graft.io.AtomicSwap
import graft.ops.IncrementalAgg
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** X76 incremental gold-table pipeline: one CLI-driven maintenance
  * run of a stored aggregate — read the increment, fold its
  * [[IncrementalAgg.partials]] into the persisted per-group state
  * under `storeDir`, swap the updated state in atomically (the
  * [[graft.io.AtomicSwap]] lifecycle — the merge plan reads the
  * current state, and no crash point loses it), and publish the
  * [[IncrementalAgg.finalize]]d view to `output`.
  *
  * History is never re-read: each run costs one pass over the
  * increment plus a group-grained merge against the
  * group-cardinality-sized state.
  *
  * Delivery contract: each increment must be fed EXACTLY once —
  * re-running an increment double-counts (aggregation state has no
  * per-row identity to dedupe on, unlike [[graft.streaming
  * .SnapshotUpsert]]'s keyed MERGE, which is idempotent). Feed this
  * from an exactly-once source, or use
  * [[graft.streaming.GoldStream]] — the streaming closure of this
  * pipeline with batch-id fencing built into the state.
  */
object GoldIncrement {

  final case class Config(
      input: String,
      output: String,
      storeDir: String,
      groupCols: Seq[String],
      valueCol: String)

  def statePath(cfg: Config): String = s"${cfg.storeDir}/gold_state"

  def run(spark: SparkSession, cfg: Config): DataFrame = {
    require(cfg.groupCols.nonEmpty, "need at least one group column")
    val path = statePath(cfg)
    AtomicSwap.recover(spark, path)
    val exists = {
      val p = new Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val incState = IncrementalAgg.partials(
      spark.read.parquet(cfg.input), cfg.groupCols, cfg.valueCol)
    val merged =
      if (exists) IncrementalAgg.merge(spark.read.parquet(path), incState)
      else IncrementalAgg.merge(incState)
    val next = path + ".next"
    merged.write.mode("overwrite").parquet(next)
    AtomicSwap.swapIn(spark, path, next)
    val published = IncrementalAgg.finalize(spark.read.parquet(path))
    published.write.mode("overwrite").parquet(cfg.output)
    spark.read.parquet(cfg.output)
  }
}
