package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.EventAnalytics

/** Dev probe for the X51–X53 single-exchange scale claim: funnel,
  * retention, and path mining must scale ~linearly in the event
  * count, because each is one hash exchange on the entity key plus
  * windows/aggregates that reuse it. A super-linear blow-up would
  * mean a hidden second shuffle or a per-entity quadratic.
  *
  * The Nx corpus replicates sf0.1 events with SHIFTED entity ids
  * (each replica is a disjoint user population, the realistic growth
  * mode — more users, same per-user history; per-window state is
  * constant so memory holds at any N).
  *
  * Run: `sbt "Test/runMain graft.tools.EventScaleProbe [sfDir] [N]"`.
  */
object EventScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev1 = graft.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "event_type")
    val users = ev1.agg(max("user_id")).head().getLong(0) + 1
    val ids = ev1.agg(max("event_id")).head().getLong(0) + 1
    def replicated(n: Int): DataFrame =
      (0 until n).map { i =>
        ev1.select(
          (col("user_id") + lit(i * users)).as("user_id"), col("ts"),
          (col("event_id") + lit(i * ids)).as("event_id"), col("event_type"))
      }.reduce(_ unionByName _)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    for (n <- Seq(1, factor)) {
      val ev = replicated(n)
      println(s"[probe] ---- ${n}x = ${ev.count()} events ----")
      timed(s"funnel ${n}x") {
        EventAnalytics.funnel(ev, "user_id", "ts", "event_type",
          Seq("signup", "view", "click", "purchase")).count()
      }
      timed(s"retention ${n}x") {
        EventAnalytics.retentionCohorts(ev, "user_id", "ts").count()
      }
      timed(s"paths ${n}x") {
        EventAnalytics.topPaths(ev, "user_id", "ts", "event_type", "event_id").count()
      }
    }
    spark.stop()
  }
}
