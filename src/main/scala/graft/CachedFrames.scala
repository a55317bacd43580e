package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Process-wide persist registry keyed by canonicalized logical plan.
  *
  * Query modules build semantically identical intermediate frames
  * (e.g. the MinHash signature frame feeding four dedup queries);
  * naively calling `.persist()` in each query re-registers the same
  * plan and floods the log with `CacheManager: Asked to cache already
  * cached data` while pinning storage for the process lifetime.
  * Routing through [[persistOnce]] caches each distinct plan exactly
  * once, and [[unpersistAll]] releases everything at a well-defined
  * point (end of a Verify/Bench run, test teardown) — the
  * caller-managed lifecycle a long-lived cluster app needs.
  *
  * Spark's CacheManager also substitutes the cached fragment into any
  * later query whose plan CONTAINS it, so persisting a shared base
  * frame (the shingle frame) accelerates derived frames (signatures)
  * with no extra wiring.
  */
object CachedFrames {

  private val registry =
    scala.collection.mutable.LinkedHashMap.empty[LogicalPlan, DataFrame]

  /** Persist `df` unless an identical plan is already registered; the
    * registered frame is returned so callers share one cache entry.
    */
  def persistOnce(df: DataFrame): DataFrame = synchronized {
    registry.getOrElseUpdate(df.queryExecution.analyzed.canonicalized, {
      df.persist()
      df
    })
  }

  /** Unpersist and forget every registered frame. */
  def unpersistAll(): Unit = synchronized {
    registry.values.foreach(_.unpersist(blocking = false))
    registry.clear()
  }

  /** Unpersist and forget ONE registered frame — for a bounded
    * working set (an index build's training cache) that should not
    * wait for the end-of-run [[unpersistAll]] in a long-lived app.
    * No-op if the plan isn't registered.
    */
  def release(df: DataFrame): Unit = synchronized {
    registry.remove(df.queryExecution.analyzed.canonicalized)
      .foreach(_.unpersist(blocking = false))
  }

  /** Number of live registered cache entries (test hook). */
  def size: Int = synchronized(registry.size)
}
