package graft.tools

import graft.pipeline.CorpusBuild
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the flagship corpus-build DAG's scale claim
  * (VERDICT r19 #7): the per-op pins say dedup/decontaminate/mix/pack/
  * split/curriculum each avoid corpus-sized re-shuffles — this
  * measures the COMPOSITION at 1×/10×/100× document counts and
  * reports wall-clock, the exchange count of the final adaptive plan,
  * and total shuffle-write bytes per scale, so superlinear drift in
  * any stage shows up as a shape change, not a vibe.
  *
  * Replicas perturb the text (` r<k>` suffix) so scaled corpora keep
  * realistic near-dup structure instead of 100-deep identical-text
  * buckets; ids offset upward so the benchCut contamination slice
  * stays the original.
  *
  * Run: `sbt "Test/runMain graft.tools.CorpusBuildProbe [sfDir]"`.
  */
object CorpusBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1

    def scaled(k: Int) =
      if (k == 1) docs
      else (0 until k).map { rep =>
        if (rep == 0) docs
        else docs
          .withColumn("doc_id", col("doc_id") + lit(rep.toLong * maxId))
          .withColumn("text", concat(col("text"), lit(s" r$rep")))
      }.reduce(_.unionByName(_))

    Seq(1, 10, 100).foreach { k =>
      val input = scaled(k)
      val n = input.count() // materialization cost outside the timed DAG? no:
      // count() here only prices the union scan; the timed section below
      // re-reads, which is exactly what the CLI does from parquet. Keep
      // the input on disk so scan cost is the real columnar scan.
      val dir = java.nio.file.Files.createTempDirectory(s"corpus_x$k").toString
      input.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      graft.CachedFrames.unpersistAll()
      shuffleWrite.set(0L)
      val frame = CorpusBuild.corpusFrame(
        spark.read.parquet(s"$dir/documents.parquet"), CorpusBuild.Config())
      val t0 = System.nanoTime()
      val rows = frame.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // wall + listener-accumulated shuffle bytes are ground truth; a
      // plan-node exchange count is NOT reported — frame.queryExecution
      // is the un-executed AQE plan here and persistOnce hides cached
      // sub-plans, so it undercounts (caught during the r20 probe run)
      println(f"[probe] x$k%-4d docs=$n%7d out=$rows%7d wall=$sec%7.2fs " +
        f"shuffle_write=${shuffleWrite.get / 1024.0 / 1024.0}%8.2f MiB")
      graft.CachedFrames.unpersistAll()
    }
    spark.stop()
  }
}
