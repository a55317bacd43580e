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
    def dirBytes(d: String): Long = {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum
    }
    val bytes = dirBytes(dir)
    // concurrency probe (VERDICT r19 #3/#5): identical copy compacted
    // serially; wall-clock should track the slowest bin under the
    // pooled submission, not the bin count
    val serialDir = dir + "_serial"
    locally {
      val hconf = spark.sparkContext.hadoopConfiguration
      val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
      org.apache.hadoop.fs.FileUtil.copy(hfs,
        new org.apache.hadoop.fs.Path(dir), hfs,
        new org.apache.hadoop.fs.Path(serialDir), false, hconf)
    }
    val t0 = System.nanoTime()
    val report = Layout.compactFiles(spark, dir, targetBytes = bytes / 8)
    val tPool = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val reportSerial = Layout.compactFiles(spark, serialDir, bytes / 8,
      maxConcurrentBins = 1)
    val tSerial = (System.nanoTime() - t1) / 1e9
    println(f"[probe] compacted: $report pooled=$tPool%.2fs serial=$tSerial%.2fs " +
      f"(speedup ${tSerial / tPool}%.2fx over ${report.mergedBins} merged bins)")
    assert(report == reportSerial, "concurrency must not change the plan")
    measure("compacted")
    // the honest bar: a FRESH z-order write at the compacted file
    // count — fewer files prune coarser no matter how they were
    // produced; compaction preserves the layout if it matches this
    val fresh = dir + "_fresh"
    Layout.clusterByZOrder(li, Seq("l_partkey", "l_suppkey"), bits = 15,
        numFiles = report.filesAfter)
      .write.mode("overwrite").parquet(fresh)
    measure("fresh-same-n", fresh)

    // ---- appended layout (VERDICT r19 #1): a z-ordered base plus an
    // appended increment covering a key SUBRANGE (new partkeys — the
    // store-generation lifecycle's normal state). The part names
    // interleave, so name-order bins merge low-curve base files with
    // high-curve increment files and every merged rectangle spans the
    // append range; key-stats ordering sorts the increment's files to
    // their true curve position and restores the pruning.
    val app = java.nio.file.Files.createTempDirectory("compaction_app").toString + "/t"
    val base = li.filter(col("l_partkey") < pMax * 3 / 4)
    val incr = li.filter(col("l_partkey") >= pMax * 3 / 4)
    Layout.clusterByZOrder(base, Seq("l_partkey", "l_suppkey"), bits = 15, numFiles = 32)
      .write.parquet(app)
    Layout.clusterByZOrder(incr, Seq("l_partkey", "l_suppkey"), bits = 15, numFiles = 24)
      .write.mode("append").parquet(app)
    val app2 = app + "_byname"
    locally {
      val hconf = spark.sparkContext.hadoopConfiguration
      val hfs = new org.apache.hadoop.fs.Path(app).getFileSystem(hconf)
      org.apache.hadoop.fs.FileUtil.copy(hfs,
        new org.apache.hadoop.fs.Path(app), hfs,
        new org.apache.hadoop.fs.Path(app2), false, hconf)
    }
    measure("appended-56f", app)
    val appBytes = dirBytes(app)
    val rByName = Layout.compactFiles(spark, app2, appBytes / 8)
    val rByKey = Layout.compactFilesByKey(spark, app, appBytes / 8,
      Seq("l_partkey", "l_suppkey"), bits = 15)
    println(s"[probe] appended byName: $rByName")
    println(s"[probe] appended byKey:  $rByKey")
    measure("app-byname", app2)
    measure("app-bykey", app)
    spark.stop()
  }
}
