package graft.tools

import graft.ops.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the X63 small-files closure: after
  * [[Layout.compactFiles]] bin-packs a z-ordered partition's files up
  * to a target size, per-file min/max stats must still prune rectangle
  * predicates — at coarser granularity but proportional BYTES. The
  * measurement is structural (per-file ranges vs a rectangle), like
  * [[LayoutScaleProbe]]; wall-clock at probe scale is fixed overhead.
  *
  * Run: `sbt "Test/runMain graft.tools.CompactionProbe [sfDir]"`.
  */
object CompactionProbe {
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
    val dir = java.nio.file.Files.createTempDirectory("compaction").toString + "/t"
    val nSmall = 64

    Layout.clusterByZOrder(li, Seq("l_partkey", "l_suppkey"), bits = 15, numFiles = nSmall)
      .write.mode("overwrite").parquet(dir)

    val (pMax, sMax) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    val (p0, p1) = (pMax / 2, pMax / 2 + pMax / 16)
    val (s0, s1) = (sMax / 2, sMax / 2 + sMax / 16)

    def measure(tag: String, path: String = dir): Unit = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(
          count(lit(1)).as("rows"),
          min("l_partkey").as("pmin"), max("l_partkey").as("pmax"),
          min("l_suppkey").as("smin"), max("l_suppkey").as("smax"))
        .collect()
      val total = stats.length
      val totalRows = stats.map(_.getAs[Long]("rows")).sum
      val surv = stats.filter { r =>
        r.getAs[Long]("pmin") <= p1 && r.getAs[Long]("pmax") >= p0 &&
        r.getAs[Long]("smin") <= s1 && r.getAs[Long]("smax") >= s0
      }
      val survRows = surv.map(_.getAs[Long]("rows")).sum
      println(f"[probe] $tag%-12s files=$total%3d rect-files=${surv.length}%3d " +
        f"(${100.0 * surv.length / total}%5.1f%%) rect-rows=${100.0 * survRows / totalRows}%5.1f%%")
    }

    measure("small-files")
    val bytes = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum
    }
    val report = Layout.compactFiles(spark, dir, targetBytes = bytes / 8)
    println(s"[probe] compacted: $report")
    measure("compacted")
    // the honest bar: a FRESH z-order write at the compacted file
    // count — fewer files prune coarser no matter how they were
    // produced; compaction preserves the layout if it matches this
    val fresh = dir + "_fresh"
    Layout.clusterByZOrder(li, Seq("l_partkey", "l_suppkey"), bits = 15,
        numFiles = report.filesAfter)
      .write.mode("overwrite").parquet(fresh)
    measure("fresh-same-n", fresh)
    spark.stop()
  }
}
