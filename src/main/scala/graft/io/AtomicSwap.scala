package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-safe replacement of an on-disk dataset that its own update
  * plan READS — the store-lifecycle discipline shared by the
  * crawl-cycle dedup stores, the streaming snapshot-upsert sink, and
  * the incremental gold tables:
  *
  *   1. write the updated data to `<path>.next` (never in place — an
  *      in-place overwrite would truncate the update's own input
  *      mid-job),
  *   2. [[swapIn]]: rename cur→`.old`, promote `.next`→cur, drop
  *      `.old` — the live dataset always has at least one on-disk
  *      copy (a bare delete-then-rename would destroy it if the
  *      process died between the two steps, and the next run would
  *      silently bootstrap EMPTY),
  *   3. [[recover]] at startup: a run that died between the renames
  *      left cur missing and `.old` holding the pre-cycle data —
  *      restore it and simply re-run the interrupted cycle.
  */
object AtomicSwap {

  /** Restore `path` from a stranded `path.old` if a previous swap died
    * between its renames. Call before reading the store.
    */
  def recover(spark: SparkSession, path: String): Unit = {
    val curP = new Path(path)
    val oldP = new Path(path + ".old")
    val fs = curP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(curP) && fs.exists(oldP)) fs.rename(oldP, curP)
  }

  /** Promote a fully-written `next` dir over `cur` via the `.old`
    * hop. `next` must already be completely on disk.
    */
  def swapIn(spark: SparkSession, cur: String, next: String): Unit = {
    val curP = new Path(cur)
    val nextP = new Path(next)
    val oldP = new Path(cur + ".old")
    val fs = curP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(oldP)) fs.delete(oldP, true)
    if (fs.exists(curP) && !fs.rename(curP, oldP))
      sys.error(s"store swap failed: $cur -> $oldP")
    if (!fs.rename(nextP, curP))
      sys.error(s"store swap failed: $next -> $cur")
    fs.delete(oldP, true)
  }
}
