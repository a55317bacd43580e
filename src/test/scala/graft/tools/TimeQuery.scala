package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only single-query timer: min/max over N runs of the named
  * queries, without paying a full Bench pass. Mirrors Bench's session
  * config so numbers are comparable.
  *
  * Run: `sbt "Test/runMain graft.tools.TimeQuery q_safe_cast [more...]"`
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  *      SPARK_GRAFT_TIME_RUNS (3).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeQuery <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_TIME_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(f"loadavg_start ${loadavg}%.2f")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        graft.CachedFrames.unpersistAll()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name min=${times.min}%.3f max=${times.max}%.3f runs=$runs sf=$sfDir")
    }
    println(f"loadavg_end ${loadavg}%.2f")
    spark.stop()
  }
}
