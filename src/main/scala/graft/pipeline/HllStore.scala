package graft.pipeline

import graft.io.AtomicSwap
import graft.ops.Sketches
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted HyperLogLog register store — the X114 sketch given the
  * repo's standard offline store lifecycle (the ANN/gold/dedup-store
  * pattern): build once, fold daily increments in at increment cost,
  * estimate any time without rescanning history.
  *
  * Why persist registers at all: at 100 TB the value stream behind a
  * distinct-count (tokens, user ids, URLs) is the corpus itself.
  * The register store is ≤ groups × 2^b tiny rows — estimating from
  * it reads KILOBYTES, and a new day's data folds in by sketching
  * ONLY the increment (max ρ is idempotent, so the fold is exact, not
  * approximate-on-approximate).
  *
  * Layout: `<storeDir>/hll/registers.parquet` (base, behind
  * [[AtomicSwap]]) + committed `registers_inc_N.parquet` generations
  * (one atomic rename each — the X49 generation contract). The
  * register-width column `b` rides every row ([[Sketches.hllSketch]]);
  * [[append]] reads the store's width and sketches the increment with
  * it, and [[estimate]] passes it through [[Sketches.hllEstimate]]'s
  * min/max-b audit, so a width mismatch is an ERROR, never a silently
  * garbage estimate.
  *
  * Hash-family contract: like the ANN store's frozen centroids, the
  * hasher is part of the store identity — pass the SAME `hasher` to
  * [[build]] and every [[append]] (functions don't serialize; the
  * default is the oracle-exact md5 form).
  */
object HllStore {

  def registersPath(storeDir: String): String = s"$storeDir/hll"
  private def basePath(root: String): String = s"$root/registers.parquet"

  private def fs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Base + committed increment paths, oldest first (numeric order —
    * inc_10 must follow inc_2). */
  private[graft] def sources(spark: SparkSession, root: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = fs(spark, root)
    val incs =
      if (!f.exists(p)) Seq.empty
      else f.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("registers_inc_") && n.endsWith(".parquet"))
        .sortBy(n => scala.util.Try(
          n.stripPrefix("registers_inc_").stripSuffix(".parquet").toLong)
          .getOrElse(Long.MaxValue))
    basePath(root) +: incs.map(n => s"$root/$n")
  }

  /** Sketch `df` and persist the register base (atomic swap; a crash
    * mid-build leaves the previous generation live). Returns the
    * per-group estimates of the fresh store.
    */
  def build(
      spark: SparkSession,
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      storeDir: String,
      b: Int = 6,
      hasher: (Column, Column) => Column = graft.ops.TextAnalysis.h64): DataFrame = {
    val root = registersPath(storeDir)
    AtomicSwap.recover(spark, root)
    val next = root + ".next"
    Sketches.hllSketch(df, groupCols, valueCol, b, hasher)
      .write.mode("overwrite").parquet(basePath(next))
    AtomicSwap.swapIn(spark, root, next)
    estimate(spark, storeDir, groupCols)
  }

  /** Fold an increment in: sketch ONLY the new rows (with the store's
    * own register width) and commit the registers as a generation —
    * one atomic rename, cost ∝ increment, history never re-read.
    */
  def append(
      spark: SparkSession,
      storeDir: String,
      increment: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      hasher: (Column, Column) => Column = graft.ops.TextAnalysis.h64): Unit = {
    val root = registersPath(storeDir)
    AtomicSwap.recover(spark, root)
    // The store's register width, from parquet column statistics on
    // the driver (r22, guide §6): the old `read.parquet.select(b)
    // .distinct().collect()` cost an inference job plus a scan job to
    // learn ONE integer. min==max across every part file and row
    // group is the same single-width audit the distinct performed.
    val (bLo, bHi) = graft.io.ParquetFooters
      .int32Range(spark, basePath(root), "b")
      .getOrElse(sys.error(s"store base ${basePath(root)} is empty; rebuild it"))
    require(bLo == bHi,
      s"store carries register widths $bLo..$bHi; rebuild it")
    val b = bLo
    val n = sources(spark, root).size - 1
    val target = s"$root/registers_inc_$n.parquet"
    val tmp = target + ".tmp"
    Sketches.hllSketch(increment, groupCols, valueCol, b, hasher)
      .write.mode("overwrite").parquet(tmp)
    if (!fs(spark, root).rename(
        new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(target)))
      sys.error(s"increment commit failed: $tmp -> $target")
  }

  /** Registers of base + all generations folded per (group, bucket) —
    * exactly the sketch one pass over the union of the data would
    * build (max ρ is idempotent across overlapping increments).
    */
  private[graft] def foldedRegisters(
      spark: SparkSession, root: String, groupCols: Seq[String]): DataFrame = {
    // Every generation was written by this store with one schema:
    // infer it from the first source only and read the rest with it
    // stated — each avoided inference is one fewer footer job per
    // generation per fold (r21). A stated-schema read is SILENT about
    // column-set drift (missing columns become nulls, extras are
    // dropped — ADVICE r21), so each tail generation's column set is
    // audited against the first's from ONE parquet footer per
    // generation, read on the driver (parquet-hadoop, no Spark job —
    // the audit costs microseconds, not the inference job the stated
    // schema saved). Type drift still fails loudly in the read.
    val srcs = sources(spark, root)
    val first = spark.read.parquet(srcs.head)
    val firstCols = first.schema.fieldNames.toSet
    srcs.tail.foreach { p =>
      val cols = graft.io.ParquetFooters.columnNames(spark, p)
      require(cols == firstCols,
        s"store generation $p column drift: has ${cols.toSeq.sorted.mkString(",")}, " +
          s"base has ${firstCols.toSeq.sorted.mkString(",")}")
    }
    val all = (first +: srcs.tail.map(p =>
        spark.read.schema(first.schema).parquet(p)))
      .reduce(_.unionByName(_))
    all
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("r")).as("r"),
        min(col("b")).as("__bmin"), max(col("b")).as("__bmax"))
      .withColumn("b",
        when(col("__bmin") === col("__bmax"), col("__bmin"))
          .otherwise(raise_error(format_string(
            "HllStore: register width mismatch across generations: [%d, %d]",
            col("__bmin"), col("__bmax")))))
      .drop("__bmin", "__bmax")
  }

  /** Per-group distinct estimates over everything the store has
    * absorbed. Reads ≤ generations × groups × 2^b register rows —
    * never the data.
    */
  def estimate(
      spark: SparkSession,
      storeDir: String,
      groupCols: Seq[String]): DataFrame = {
    val root = registersPath(storeDir)
    AtomicSwap.recover(spark, root)
    val storeB = spark.read.parquet(basePath(root))
      .select(col("b")).distinct().collect()
    require(storeB.length == 1,
      s"store carries ${storeB.length} register widths; rebuild it")
    Sketches.hllEstimate(
      foldedRegisters(spark, root, groupCols), groupCols, storeB.head.getInt(0))
  }

  /** Fold every generation back into one base (fresh atomic swap).
    * Estimates are identical before and after (spec-pinned); run it
    * when generation count grows past taste.
    */
  def compact(
      spark: SparkSession,
      storeDir: String,
      groupCols: Seq[String]): DataFrame = {
    val root = registersPath(storeDir)
    AtomicSwap.recover(spark, root)
    val next = root + ".next"
    foldedRegisters(spark, root, groupCols)
      .write.mode("overwrite").parquet(basePath(next))
    AtomicSwap.swapIn(spark, root, next)
    estimate(spark, storeDir, groupCols)
  }
}
