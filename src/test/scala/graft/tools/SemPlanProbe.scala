package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: confirm the SemDeDup within-cluster self-join reuses ONE
  * exchange for both sides when it can't broadcast (the at-scale
  * shape). Run: `sbt "Test/runMain graft.tools.SemPlanProbe"`.
  */
object SemPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0L until 1000L).map(i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 17).toFloat))).toDF("vec_id", "embedding")
    val centroids = (0 until 4).map(c => Seq.tabulate(8)(d => ((c + d) % 5).toFloat))
    val pairs = graft.ops.Similarity.semanticDedupPairs(
      df, "vec_id", "embedding", centroids, 0.5)
    pairs.count() // execute so AQE finalizes reuse decisions
    val plan = pairs.queryExecution.executedPlan.toString
    println("HAS_REUSE=" + (plan.contains("ReusedExchange") || plan.contains("reused")))
    println(plan.linesIterator.filter(l =>
      l.contains("Exchange") || l.contains("Join")).mkString("\n"))
    spark.stop()
  }
}
