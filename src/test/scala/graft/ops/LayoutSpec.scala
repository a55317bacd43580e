package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala Morton reference: bit i of col j → position i*n+j. */
  private def refZ(vals: Seq[Long], bits: Int): Long = {
    val n = vals.size
    (for {
      (v, j) <- vals.zipWithIndex
      i <- 0 until bits
    } yield ((v >> i) & 1L) << (i * n + j)).sum
  }

  test("zOrderKey matches the reference interleave, incl. 3 columns") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (5L, 3L, 0L), (255L, 255L, 255L))
    val got = rows.toDF("x", "y", "z")
      .withColumn("k2", Layout.zOrderKey(Seq($"x", $"y"), 8))
      .withColumn("k3", Layout.zOrderKey(Seq($"x", $"y", $"z"), 8))
      .as[(Long, Long, Long, Long, Long)].collect()
    got.foreach { case (x, y, z, k2, k3) =>
      assert(k2 == refZ(Seq(x, y), 8), s"($x,$y)")
      assert(k3 == refZ(Seq(x, y, z), 8), s"($x,$y,$z)")
    }
    // unit-bit placement: x contributes even positions, y odd
    val m = got.map { case (x, y, _, k2, _) => (x, y) -> k2 }.toMap
    assert(m((1L, 0L)) == 1L && m((0L, 1L)) == 2L)
  }

  test("zOrderKey masks out-of-range values into their own lanes") {
    val k = Seq((1024L + 3L, 2L)).toDF("x", "y")
      .select(Layout.zOrderKey(Seq($"x", $"y"), 10).as("k"))
      .as[Long].head()
    assert(k == refZ(Seq(3L, 2L), 10)) // the 11th bit of x must not leak
  }

  test("zOrderKey preserves locality better than a single-column sort") {
    // 16x16 grid: rank cells by zkey and by x-major; for each cell
    // measure the curve distance to its right neighbor. Z-order keeps
    // neighbors close (<= 3 for half the cells); x-major puts
    // row-crossing neighbors 16 apart everywhere.
    val cells = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val z = cells.map { case (x, y) => (x, y) -> refZ(Seq(x, y), 4) }.toMap
    val closeZ = cells.count { case (x, y) =>
      x < 15 && math.abs(z((x + 1, y)) - z((x, y))) <= 3 }
    assert(closeZ > 100, s"z-order lost locality: $closeZ")
  }

  test("clusterByZOrder range-partitions along the curve and validates input") {
    // integral lanes spanning exactly [0, 63] so min/max normalization
    // is the identity and the raw-key tiling assertion below is exact
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val out = Layout.clusterByZOrder(df, Seq("x", "y"), bits = 6, numFiles = 8)
    assert(out.columns.toSeq == Seq("x", "y")) // staging key dropped
    assert(out.rdd.getNumPartitions == 8)
    // partitions tile the curve: every partition's zkey range is
    // disjoint from the next one's
    val ranges = out
      .withColumn("zk", Layout.zOrderKey(Seq(col("x"), col("y")), 6))
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("zk").as("lo"), max("zk").as("hi"))
      .orderBy("p").as[(Int, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ =>
    }
    intercept[IllegalArgumentException] {
      Layout.clusterByZOrder(df.withColumn("__zkey", lit(1)), Seq("x", "y"), 6, 2)
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(Seq(col("x")), 8) // one column is not an interleave
    }
    intercept[IllegalArgumentException] {
      Layout.zOrderKey(Seq(col("x"), col("y")), 32) // 64 bits > 62
    }
  }

  test("clusterByZOrder normalizes unequal-width columns: the narrow key prunes too") {
    // wide (0..16383) × narrow (0..15): without min/max lane scaling
    // the wide column's top bits own the curve and narrow-key
    // predicates prune nothing (measured 32/32 files read on
    // lineitem — LayoutScaleProbe). With scaling, a narrow-only
    // range must skip a meaningful share of partitions.
    val df = spark.range(0, 16384).select(
      col("id").as("wide"), (col("id") % 16).as("narrow"))
    val parts = Layout.clusterByZOrder(df, Seq("wide", "narrow"), bits = 10, numFiles = 16)
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg(min("narrow").as("nmin"), max("narrow").as("nmax"))
      .collect()
    val surviving = parts.count(r =>
      r.getAs[Long]("nmin") <= 3L && r.getAs[Long]("nmax") >= 2L)
    assert(surviving < parts.length,
      s"narrow-only predicate pruned nothing: $surviving of ${parts.length}")
  }

  private def partSizes(dir: String): Seq[(String, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1)
  }

  test("compactionBins packs curve-adjacent files in order, every file exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("compact-plan").toString + "/t"
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.clusterByZOrder(df, Seq("x", "y"), bits = 6, numFiles = 16)
      .write.parquet(dir)
    val files = partSizes(dir)
    assert(files.size == 16)
    val target = files.map(_._2).sum / 4 // aim for ~4 output files
    val bins = Layout.compactionBins(spark, dir, target)
    // exactly the input files, still in curve (= name) order
    assert(bins.flatMap(_.files).map(f => f.substring(f.lastIndexOf('/') + 1))
      == files.map(_._1))
    // capacity respected for every multi-file bin; sizes add up
    bins.filter(_.files.size > 1).foreach(b => assert(b.bytes <= target))
    assert(bins.map(_.bytes).sum == files.map(_._2).sum)
    assert(bins.map(_.bin) == bins.indices)
    // an over-target file keeps its own bin instead of breaking packing
    val tiny = Layout.compactionBins(spark, dir, 1L)
    assert(tiny.size == files.size && tiny.forall(_.files.size == 1))
  }

  test("compactFiles shrinks the file count and keeps data + curve rectangles") {
    val dir = java.nio.file.Files.createTempDirectory("compact-run").toString + "/t"
    val df = spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.clusterByZOrder(df, Seq("x", "y"), bits = 6, numFiles = 16)
      .write.parquet(dir)
    val before = partSizes(dir)
    val target = before.map(_._2).sum / 4
    val report = Layout.compactFiles(spark, dir, target)
    val after = partSizes(dir)
    assert(report.filesBefore == 16 && report.filesAfter == after.size)
    assert(after.size < before.size && after.size >= 4)
    assert(report.mergedBins + report.passThroughBins == after.size)
    val parent = new java.io.File(dir).getParentFile
    assert(!parent.listFiles.exists(_.getName.startsWith(".compact_")),
      "swap must consume the dotted staging/backup dirs")
    assert(new java.io.File(dir, "_SUCCESS").exists(),
      "the _SUCCESS commit marker must survive the swap (ADVICE r19)")

    // data survives bit-exactly
    val got = spark.read.parquet(dir)
    assert(got.count() == 4096)
    assert(got.select(sum(col("x") * lit(65536L) + col("y"))).head.getLong(0)
      == df.select(sum(col("x") * lit(65536L) + col("y"))).head.getLong(0))

    // the property compaction exists to preserve: per-FILE zkey ranges
    // are still disjoint and monotone in file-name order (bins merged
    // only curve-adjacent files), so min/max stats prune exactly like
    // the pre-compaction layout at coarser granularity
    val ranges = got
      .withColumn("zk", Layout.zOrderKey(Seq(col("x"), col("y")), 6))
      .groupBy(input_file_name().as("f"))
      .agg(min("zk").as("lo"), max("zk").as("hi"))
      .orderBy("f")
      .as[(String, Long, Long)].collect()
    assert(ranges.length == after.size)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (f2, lo2, _)) =>
        assert(hi1 <= lo2, s"curve rectangles overlap at $f2")
      case _ =>
    }
  }

  test("compactFilesByKey restores curve order on an appended-to directory") {
    // Two range-partitioned writes into ONE directory — the store-
    // generation / incremental-append lifecycle this repo ships
    // everywhere. Their part names interleave (part-00000-uuidA,
    // part-00000-uuidB, …), each write's OWN curve ranges, so name
    // order is NOT curve order: name-order bins would merge files half
    // a curve apart and silently destroy the pruning compaction exists
    // to preserve (VERDICT r19 #1). The y split puts the two writes on
    // disjoint global curve halves (y's top bit is the most
    // significant curve bit), so a correct compaction CAN restore
    // fully disjoint per-file rectangles — and must.
    val dir = java.nio.file.Files.createTempDirectory("compact-appended").toString + "/t"
    val w1 = spark.range(0, 2048).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y")) // y ∈ [0,32)
    val w2 = spark.range(0, 2048).select(
      (col("id") % 64).as("x"), (col("id") / 64 + 32).cast("long").as("y")) // y ∈ [32,64)
    // deliberately misaligned file counts (8 vs 7): appends are never
    // sized like the original write, so name order interleaves files
    // from unrelated curve segments
    Layout.clusterByZOrder(w1, Seq("x", "y"), bits = 6, numFiles = 8)
      .write.parquet(dir)
    Layout.clusterByZOrder(w2, Seq("x", "y"), bits = 6, numFiles = 7)
      .write.mode("append").parquet(dir)
    assert(partSizes(dir).size == 15)
    val target = partSizes(dir).map(_._2).sum / 4
    // the planners must disagree on this directory: name order
    // interleaves the writes, measured-stats order separates them
    val byName = Layout.compactionBins(spark, dir, target).flatMap(_.files)
    val byKey = Layout.compactionBinsByKey(spark, dir, target, Seq("x", "y"), 6)
    assert(byKey.flatMap(_.files).sorted == byName.sorted, "same file universe")
    assert(byKey.flatMap(_.files) != byName,
      "stats ordering must differ from name ordering on an interleaved dir")

    // identical copy, so name-order and stats-order compaction run on
    // byte-identical inputs
    val dir2 = dir + "2"
    val hconf = spark.sparkContext.hadoopConfiguration
    val hfs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hconf)
    assert(org.apache.hadoop.fs.FileUtil.copy(hfs,
      new org.apache.hadoop.fs.Path(dir), hfs,
      new org.apache.hadoop.fs.Path(dir2), false, hconf))

    val reportName = Layout.compactFiles(spark, dir2, target)
    val reportKey = Layout.compactFilesByKey(spark, dir, target, Seq("x", "y"), bits = 6)
    assert(reportKey.filesBefore == 15 && reportKey.filesAfter < 15)
    assert(spark.read.parquet(dir).count() == 4096)

    // the property stats ordering restores: per-FILE (x, y) min/max
    // rectangles — exactly what parquet row-group pruning consults —
    // must still prune a small probe rectangle. Name-order bins merged
    // files from both writes half a curve apart, so their rectangles
    // span the y split and the probe touches nearly everything.
    def surviving(d: String): (Int, Int) = {
      val stats = spark.read.parquet(d)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
      val surv = stats.count { r =>
        r.getAs[Long]("x0") <= 15L && r.getAs[Long]("x1") >= 8L &&
        r.getAs[Long]("y0") <= 15L && r.getAs[Long]("y1") >= 8L
      }
      (surv, stats.length)
    }
    val (survKey, nKey) = surviving(dir)
    val (survName, nName) = surviving(dir2)
    assert(nKey == reportKey.filesAfter && nName == reportName.filesAfter)
    // every name-order bin mixes the two writes here, so NO file is
    // skippable on y; stats ordering must beat it outright
    assert(survKey < survName,
      s"stats-ordered pruning ($survKey/$nKey) must beat name-ordered ($survName/$nName)")
    assert(survKey.toDouble / nKey <= 0.5,
      s"appended-dir compaction must keep rectangles prunable: $survKey/$nKey")
  }

  test("compact-files CLI routes a stranded-only-leaf table to recovery (ADVICE r19)") {
    // A table whose ONLY leaf is crash-stranded as .compact_old_<leaf>
    // has no non-dot child: the old routing sent it to compactFiles on
    // the root and failed with 'nothing to compact', leaving the
    // partition unrecoverable through the CLI.
    val dir = java.nio.file.Files.createTempDirectory("compact-stranded").toString + "/t"
    spark.range(0, 600)
      .select(col("id"), lit(0).as("part"))
      .repartition(4)
      .write.partitionBy("part").parquet(dir)
    val leaf = new java.io.File(s"$dir/part=0")
    assert(leaf.renameTo(new java.io.File(s"$dir/.compact_old_part=0")))
    val out = graft.Main.run(spark, graft.Main.parseArgs(Array(
      "--pipeline", "compact-files",
      "--input", dir, "--target_bytes", Long.MaxValue.toString)))
    assert(out.count() == 600, "the stranded leaf must be recovered and readable")
    assert(new java.io.File(s"$dir/part=0").exists())
    assert(!new java.io.File(dir).listFiles.exists(_.getName.startsWith(".compact_")))
  }

  test("compact-files CLI recovers a FLAT dir stranded wholly under its dotted backup") {
    // the flat-input analogue of the stranded-leaf case: the input
    // path itself doesn't exist after a mid-swap crash, so the CLI's
    // partitioned-vs-flat probe would throw before compactFiles' own
    // recovery pre-pass could run — the routing now recovers first
    val dir = java.nio.file.Files.createTempDirectory("compact-flat-str").toString + "/t"
    val df = spark.range(0, 1024).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.clusterByZOrder(df, Seq("x", "y"), bits = 6, numFiles = 4)
      .write.parquet(dir)
    val d = new java.io.File(dir)
    assert(d.renameTo(new java.io.File(d.getParent, ".compact_old_t")))
    val out = graft.Main.run(spark, graft.Main.parseArgs(Array(
      "--pipeline", "compact-files",
      "--input", dir, "--target_bytes", Long.MaxValue.toString)))
    assert(out.count() == 1024, "the stranded flat dir must be recovered and compacted")
    assert(partSizes(dir).size == 1)
    assert(!d.getParentFile.listFiles.exists(_.getName.startsWith(".compact_")))
  }

  test("compact-files CLI rewrites a partition in place through the dispatch") {
    val dir = java.nio.file.Files.createTempDirectory("compact-cli").toString + "/t"
    val df = spark.range(0, 2048).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    Layout.clusterByZOrder(df, Seq("x", "y"), bits = 6, numFiles = 8)
      .write.parquet(dir)
    val target = partSizes(dir).map(_._2).sum / 2
    val out = graft.Main.run(spark, graft.Main.parseArgs(Array(
      "--pipeline", "compact-files",
      "--input", dir, "--target_bytes", target.toString)))
    assert(out.count() == 2048)
    assert(partSizes(dir).size < 8)
  }

  test("compactPartitions walks a partitionBy layout and compacts each leaf independently") {
    val dir = java.nio.file.Files.createTempDirectory("compact-part").toString + "/t"
    spark.range(0, 3000)
      .select(col("id"), (col("id") % 3).as("part"))
      .repartition(6) // 6 part files per partition dir
      .write.partitionBy("part").parquet(dir)
    val reports = Layout.compactPartitions(spark, dir, targetBytes = Long.MaxValue)
    assert(reports.map(_._1).sorted == Seq("part=0", "part=1", "part=2"))
    reports.foreach { case (_, r) => assert(r.filesBefore == 6 && r.filesAfter == 1) }
    // data intact, partition column included
    val back = spark.read.parquet(dir)
    assert(back.count() == 3000)
    assert(back.groupBy("part").count().collect().forall(_.getLong(1) == 1000))
    // single-file partitions are left untouched (no pointless swap)
    assert(Layout.compactPartitions(spark, dir, Long.MaxValue).isEmpty)
  }

  test("a compaction crash between renames recovers: the leaf is restored, never phantom") {
    val dir = java.nio.file.Files.createTempDirectory("compact-crash").toString + "/t"
    spark.range(0, 900)
      .select(col("id"), (col("id") % 3).as("part"))
      .repartition(4)
      .write.partitionBy("part").parquet(dir)
    // simulate a death between swapCompaction's two renames on part=1:
    // the live leaf was renamed to the dotted backup and nothing
    // promoted — exactly the on-disk state the review flagged as
    // previously unrecoverable (the dot-skipping walk couldn't see it)
    val leaf = new java.io.File(s"$dir/part=1")
    val bak = new java.io.File(s"$dir/.compact_old_part=1")
    assert(leaf.renameTo(bak))
    // a table read in the crashed state must see NO phantom partition
    // (dot-prefixed names are invisible to partition discovery)
    assert(!spark.read.parquet(dir).select("part").distinct()
      .collect().map(_.get(0).toString).contains("1"))
    val reports = Layout.compactPartitions(spark, dir, Long.MaxValue)
    assert(reports.map(_._1).contains("part=1"), "recovered leaf must be compacted")
    val back = spark.read.parquet(dir)
    assert(back.count() == 900, "recovery must restore the crashed partition's rows")
    assert(back.filter(col("part") === 1).count() == 300)
    assert(!new java.io.File(dir).listFiles.exists(_.getName.startsWith(".compact_")))
  }

  test("clusterByZOrder survives an empty frame and an all-NULL column") {
    // ADVICE r14: min/max aggregate to NULL on these inputs and the
    // normalization read them with getDouble — an empty-increment
    // pipeline input threw where it previously laid out harmlessly.
    val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
    assert(Layout.clusterByZOrder(empty, Seq("x", "y"), bits = 6, numFiles = 4).isEmpty)
    val nullCol = spark.range(0, 32).select(
      col("id").as("x"), lit(null).cast("long").as("y"))
    val out = Layout.clusterByZOrder(nullCol, Seq("x", "y"), bits = 6, numFiles = 2)
    assert(out.count() == 32) // degenerate lane, rows intact
  }
}
