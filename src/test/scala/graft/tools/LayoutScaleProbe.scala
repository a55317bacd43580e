package graft.tools

import graft.ops.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the X-layout claim: a Z-ordered file layout prunes
  * rectangle predicates on EVERY interleaved column via per-file
  * min/max stats, where a single-key sort prunes only its own key and
  * an unsorted layout prunes nothing. The measurement is EXACT and
  * structural — per-file min/max ranges (what an Iceberg manifest or
  * parquet footer stores) against a rectangle predicate — rather than
  * wall-clock, which at probe scale is all fixed overhead.
  *
  * Run: `sbt "Test/runMain graft.tools.LayoutScaleProbe [sfDir]"`.
  */
object LayoutScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val dir = java.nio.file.Files.createTempDirectory("layout").toString
    val nFiles = 32

    li.repartition(nFiles).write.mode("overwrite")
      .parquet(s"$dir/unsorted")
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$dir/partkey_sorted")
    Layout.clusterByZOrder(li, Seq("l_partkey", "l_suppkey"), bits = 15, numFiles = nFiles)
      .write.mode("overwrite").parquet(s"$dir/zordered")

    // rectangle predicate: ~6% of the partkey range × ~6% of suppkey
    val (pMax, sMax) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (p0, p1) = (pMax / 2, pMax / 2 + pMax / 16)
    val (s0, s1) = (sMax / 2, sMax / 2 + sMax / 16)

    println(s"[probe] ranges: l_partkey [$p0, $p1], l_suppkey [$s0, $s1]")
    for (layout <- Seq("unsorted", "partkey_sorted", "zordered")) {
      val stats = spark.read.parquet(s"$dir/$layout")
        .groupBy(input_file_name().as("f"))
        .agg(
          min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
        .collect()
      val total = stats.length
      def survives(p: Boolean, s: Boolean) = stats.count { r =>
        (!p || (r.getAs[Long]("pmin") <= p1 && r.getAs[Long]("pmax") >= p0)) &&
        (!s || (r.getAs[Long]("smin") <= s1 && r.getAs[Long]("smax") >= s0))
      }
      println(f"[probe] $layout%-15s files=$total%2d " +
        f"partkey-only=${survives(p = true, s = false)}%2d " +
        f"suppkey-only=${survives(p = false, s = true)}%2d " +
        f"rectangle=${survives(p = true, s = true)}%2d")
    }
    spark.stop()
  }
}
