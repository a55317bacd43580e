package graft.pipeline

import graft.io.AtomicSwap
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Offline-build / online-query lifecycle for the IVF ANN index —
  * the persisted-store counterpart of [[graft.ops.Similarity.ivfTopK]]
  * (which trains and assigns inline per run). A production corpus is
  * indexed ONCE per refresh cycle and queried many times; this module
  * splits the two paths:
  *
  *  - [[build]]: train the spherical k-means quantizer, assign every
  *    corpus vector to its cell with the fused mat-vec argmax
  *    (map-side, no join), and persist ONE index directory —
  *    `centroids.parquet` (k tiny rows) + `cells.parquet`
  *    PARTITIONED BY cell — behind a single [[AtomicSwap]] (both
  *    halves swap together: a centroid set from one build against
  *    cell assignments from another would silently misroute probes).
  *  - [[query]]: load the k centroid rows (driver-side constants, the
  *    [[Similarity.ivfTopK]] pattern), compute each query's `nProbe`
  *    best cells map-side, and join ONLY those cells' vectors for the
  *    exact cosine re-rank. Because `cells.parquet` is
  *    partitioned-by-cell on disk and the probe frame broadcasts,
  *    Spark's dynamic partition pruning skips unprobed cells at the
  *    FILE level — the at-scale payoff of persisting assignments:
  *    query cost reads ≈ corpus × nProbe / nCentroids bytes, not the
  *    corpus.
  *
  * Between full rebuilds, [[append]] indexes new vectors against the
  * live centroids as committed `cells_inc_N.parquet` generations
  * (cost ∝ increment, one atomic rename per append) and [[compact]]
  * folds the generations back into one base — the X49 store
  * lifecycle applied to the index.
  *
  * With `pqM > 0` the store is PQ-COMPRESSED (the X104 IVFADC
  * layout, [[graft.ops.Pq]]): cell rows are (id, m codes) of the
  * unit vector's cell residual instead of `dim` raw floats — 16–32×
  * less index to store AND scan — and `codebooks.parquet` joins the
  * swap as a third half. [[query]] then scores ADC-approximate
  * cosine from the codes (raw vectors move through no join), with an
  * optional exact-cosine refine of the bounded shortlist against the
  * source corpus. This is what makes a billion-vector index FIT: at
  * 100 TB of raw embeddings the probed scan reads ~nProbe/nCells of
  * a ~4 TB code table, not of the vectors.
  *
  * Store refresh = rerun [[build]]; a crash between the renames
  * recovers via [[AtomicSwap.recover]]. Concurrency contract: the
  * swap keeps the ON-DISK state consistent (both halves always from
  * one build), but a [[query]] whose centroids were collected BEFORE
  * a refresh and whose cell scan runs AFTER it would rank probes
  * against one build and read cells from another — run refreshes
  * quiesced (the offline-cycle pattern every store in this repo
  * follows), or version the index directory per build and point
  * readers at a generation explicitly.
  */
object AnnIndex {

  /** `pqM > 0` builds a PQ-COMPRESSED store (X104 layout): cell rows
    * carry `m` small codes instead of `dim` floats — 16–32× less
    * index to store and scan — and [[query]] scores by ADC against
    * the persisted residual codebooks (approximate cosine; optional
    * exact refine against the source corpus). `pqM = 0` keeps the
    * exact raw-vector store.
    */
  final case class Config(
      input: String,
      storeDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      dim: Int = 64,
      nCentroids: Int = 16,
      iters: Int = 3,
      seedSample: Int = 256,
      pqM: Int = 0,
      pqKsub: Int = 16)

  def indexPath(storeDir: String): String = s"$storeDir/index"
  private def centroidsPath(index: String): String = s"$index/centroids.parquet"
  private def cellsPath(index: String): String = s"$index/cells.parquet"
  private def codebooksPath(index: String): String = s"$index/codebooks.parquet"

  /** The fused-kernel cell assignment both paths share: dots against
    * every centroid in one call, argmax index (first wins ties).
    */
  private def withCellDots(
      df: DataFrame, vecCol: String, centroids: Seq[Seq[Float]]): DataFrame =
    df.withColumn(
      "__cd",
      graft.functions.MatVecDotsExpr.matVecDots(
        col(vecCol), centroids.map(_.map(_.toDouble).toArray).toArray))

  /** Unit-normalize `vecCol` into `outCol` (each element the exact
    * `float(double(x_i) / ‖x‖)`) and drop zero-norm rows — a zero
    * vector has no direction, the same exclusion the cosine family
    * applies through its NaN guards. The PQ store quantizes
    * DIRECTIONS: residuals of unit vectors against the (unit,
    * spherical-k-means) centroids stay small, and cosine then needs
    * no stored norm at query time — `cos(q, x) = q·(x/‖x‖) / ‖q‖`.
    */
  private def unitized(df: DataFrame, vecCol: String, outCol: String): DataFrame =
    df.withColumn("__norm",
        sqrt(aggregate(col(vecCol), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double"))))
      .filter(col("__norm") > 0.0)
      .withColumn(outCol,
        transform(col(vecCol), e => (e.cast("double") / col("__norm")).cast("float")))
      .drop("__norm")

  private def writeCodebooks(
      spark: SparkSession, model: graft.ops.Pq.PqModel, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      s <- 0 until model.m
      j <- 0 until model.ksub
    } yield (s, j, model.codebooks(s)(j).toSeq)
    rows.toDF("s", "j", "cvec").coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def loadCodebooks(
      spark: SparkSession, index: String): graft.ops.Pq.PqModel = {
    val rows = spark.read.parquet(codebooksPath(index))
      .select("s", "j", "cvec").orderBy("s", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = rows.map(_._1).max + 1
    val ksub = rows.map(_._2).max + 1
    val books = Array.tabulate(m, ksub)((s, j) => rows(s * ksub + j)._3)
    graft.ops.Pq.PqModel(m * books(0)(0).length, m, books)
  }

  /** A store built with `pqM > 0` persists its residual codebooks —
    * their presence selects the ADC query path.
    */
  private def isPqStore(spark: SparkSession, index: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(codebooksPath(index))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Build (or refresh) the index store from the corpus at
    * `cfg.input`. Returns the assignment cell census (cell, n) —
    * the balance report an operator checks before trusting probes.
    * Rows with a NULL vector OR any NULL element are excluded up
    * front: the kernel is element-null-propagating (one NULL element
    * → NULL dots → NULL argmax), so either shape would otherwise land
    * in a `cell=null` default partition that no probe ever reads —
    * silently unqueryable ids and a census row downstream code
    * doesn't expect. (Same guard as [[graft.ops.Pca.fit]].) A PQ
    * build (`pqM > 0`) additionally drops zero-norm vectors (no
    * direction to quantize) and stores (id, codes) per cell instead
    * of raw vectors, plus the codebooks as a third swap half.
    */
  def build(spark: SparkSession, cfg: Config): DataFrame = {
    import spark.implicits._
    val index = indexPath(cfg.storeDir)
    AtomicSwap.recover(spark, index)
    val corpus = spark.read.parquet(cfg.input)
      .filter(col(cfg.vecCol).isNotNull &&
        !exists(col(cfg.vecCol), v => v.isNull))
    val centroids = Similarity.trainCentroids(
      corpus, cfg.idCol, cfg.vecCol, cfg.nCentroids, cfg.dim,
      iters = cfg.iters, seedSample = cfg.seedSample)
    val next = index + ".next"
    centroids.zipWithIndex
      .map { case (v, i) => (i, v) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(centroidsPath(next))
    if (cfg.pqM > 0) {
      // PQ layout: assignment is identical (dot(x/‖x‖, c) shares the
      // raw path's argmax — positive scaling never moves it), but the
      // cell rows carry codes of the unit vector's cell residual.
      // Persist the normalized frame: training re-scans it once per
      // Lloyd iteration plus the seed collect and the final encode —
      // without the persist each pass would redo the parquet scan AND
      // the per-element normalize (measured: the dominant build cost
      // at the 100× probe scale).
      val normed = graft.CachedFrames.persistOnce(unitized(
        corpus.select(col(cfg.idCol), col(cfg.vecCol)), cfg.vecCol, "__xn"))
      try {
        val model = graft.ops.Pq.trainResidual(
          normed, cfg.idCol, "__xn", centroids, cfg.dim, cfg.pqM, cfg.pqKsub,
          iters = cfg.iters, seedSample = cfg.seedSample)
        writeCodebooks(spark, model, codebooksPath(next))
        graft.ops.Pq.encodeIvf(normed, "__xn", centroids, model, cellCol = "cell")
          .select(col(cfg.idCol), col("pq_codes"), col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(cellsPath(next))
      } finally graft.CachedFrames.release(normed)
    } else {
      val assign = array_position(col("__cd"), array_max(col("__cd"))).cast("int") - 1
      withCellDots(corpus.select(col(cfg.idCol), col(cfg.vecCol)), cfg.vecCol, centroids)
        .withColumn("cell", assign)
        .drop("__cd")
        .write.mode("overwrite").partitionBy("cell").parquet(cellsPath(next))
    }
    AtomicSwap.swapIn(spark, index, next)
    spark.read.parquet(cellsPath(index))
      .groupBy("cell").agg(count(lit(1)).as("n")).orderBy("cell")
  }

  /** All committed cell datasets: the base build plus every
    * `cells_inc_N.parquet` increment, oldest first. In-flight
    * increments live under a `.tmp` name until their commit rename,
    * so a crash mid-append leaves nothing a reader would pick up.
    */
  private[pipeline] def cellSources(
      spark: SparkSession, index: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(index)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val incs =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.map(_.getPath.getName)
        .filter(n => n.startsWith("cells_inc_") && n.endsWith(".parquet"))
        // numeric suffix, not lexicographic: cells_inc_10 must order
        // AFTER cells_inc_2 for "oldest first" to stay true past nine
        // increments.
        .sortBy(n => scala.util.Try(
          n.stripPrefix("cells_inc_").stripSuffix(".parquet").toLong)
          .getOrElse(Long.MaxValue))
    cellsPath(index) +: incs.map(n => s"$index/$n")
  }

  /** Base + increments as one frame. Each generation loads as its own
    * partitioned root and unions (a single multi-path read trips
    * CONFLICTING_DIRECTORY_STRUCTURES: the roots are sibling dirs).
    * Cell filters push into every branch, so partition pruning holds
    * per generation.
    */
  private def readCells(spark: SparkSession, index: String): DataFrame =
    cellSources(spark, index)
      .map(spark.read.parquet(_))
      .reduce(_ unionByName _)

  /** Incrementally index new vectors WITHOUT retraining or rewriting
    * the base — the crawl-cycle companion (X49 pattern: increments
    * cost ∝ increment, compaction is a separate maintenance step).
    * The increment assigns against the LIVE centroids with the same
    * fused kernel and the same NULL/element-NULL exclusions as
    * [[build]], lands as a new cell-partitioned
    * `cells_inc_N.parquet` generation (written under a `.tmp` name,
    * then one atomic directory rename = the commit), and [[query]]
    * reads base + all committed increments with partition pruning
    * intact per generation.
    *
    * Contract boundaries, deliberately:
    *  - centroids do NOT move. Under distribution drift the cell
    *    census skews and recall decays — watch the returned census
    *    (now spanning base + increments) and [[build]] to re-train,
    *    then the increments fold in via that full rebuild, or merge
    *    file counts down with [[compact]] between rebuilds.
    *  - ids are NOT deduplicated against the base (that would read
    *    the whole index per append); the upstream crawl dedup screens
    *    own identity, exactly as they do for the document stores.
    *
    * @return the post-append cell census over base + increments
    */
  def append(
      spark: SparkSession,
      storeDir: String,
      input: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val index = indexPath(storeDir)
    AtomicSwap.recover(spark, index)
    val centroids = loadCentroids(spark, index)
    val increment = spark.read.parquet(input)
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), v => v.isNull))
    val n = cellSources(spark, index).size - 1 // existing increments
    val target = s"$index/cells_inc_$n.parquet"
    val tmp = target + ".tmp"
    if (isPqStore(spark, index)) {
      // encode the increment against the LIVE codebooks — the same
      // frozen-model contract as the frozen centroids
      val model = loadCodebooks(spark, index)
      val normed = unitized(
        increment.select(col(idCol), col(vecCol)), vecCol, "__xn")
      graft.ops.Pq.encodeIvf(normed, "__xn", centroids, model, cellCol = "cell")
        .select(col(idCol), col("pq_codes"), col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    } else {
      val assign = array_position(col("__cd"), array_max(col("__cd"))).cast("int") - 1
      withCellDots(increment.select(col(idCol), col(vecCol)), vecCol, centroids)
        .withColumn("cell", assign)
        .drop("__cd")
        .write.mode("overwrite").partitionBy("cell").parquet(tmp)
    }
    val fs = new org.apache.hadoop.fs.Path(index)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.rename(
        new org.apache.hadoop.fs.Path(tmp),
        new org.apache.hadoop.fs.Path(target)))
      sys.error(s"increment commit failed: $tmp -> $target")
    census(spark, index)
  }

  /** Merge the base and every committed increment back into ONE
    * cell-partitioned `cells.parquet` (fresh index generation behind
    * the usual [[AtomicSwap]]; centroids carry over unchanged). Run
    * between appends once generation count — and with it per-query
    * file listings — grows past taste; [[query]] results are
    * identical before and after (spec-pinned).
    */
  def compact(spark: SparkSession, storeDir: String): DataFrame = {
    val index = indexPath(storeDir)
    AtomicSwap.recover(spark, index)
    val next = index + ".next"
    spark.read.parquet(centroidsPath(index))
      .coalesce(1)
      .write.mode("overwrite").parquet(centroidsPath(next))
    if (isPqStore(spark, index))
      spark.read.parquet(codebooksPath(index))
        .coalesce(1)
        .write.mode("overwrite").parquet(codebooksPath(next))
    readCells(spark, index)
      .write.mode("overwrite").partitionBy("cell").parquet(cellsPath(next))
    AtomicSwap.swapIn(spark, index, next)
    census(spark, index)
  }

  private def census(spark: SparkSession, index: String): DataFrame =
    readCells(spark, index)
      .groupBy("cell").agg(count(lit(1)).as("n")).orderBy("cell")

  private def loadCentroids(
      spark: SparkSession, index: String): Seq[Seq[Float]] =
    spark.read.parquet(centroidsPath(index))
      .orderBy("cell").collect()
      .map(_.getSeq[Float](1).toSeq).toSeq

  /** Query the persisted index: top-`k` cosine neighbors per query
    * row, probing each query's `nProbe` best cells only.
    *
    * Against a PQ store the scores are ADC-approximate cosine —
    * `(q·c_cell + Σ_s lut_s[code_s]) / ‖q‖`, the cell term recovered
    * for free from the probe ranking — and the scan moves (cell, id,
    * codes) rows only. `refineWith = Some(corpus)` then re-ranks each
    * query's ADC top-`k × refineFactor` shortlist by EXACT cosine
    * against the source corpus (one broadcast-semi join by id — the
    * shortlist is queries × k × factor rows, bounded): the standard
    * two-stage ANN serving shape, quantized scan + exact refine.
    */
  def query(
      spark: SparkSession,
      storeDir: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nProbe: Int,
      refineWith: Option[DataFrame] = None,
      refineFactor: Int = 4): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"k and nProbe must be >= 1: $k, $nProbe")
    val index = indexPath(storeDir)
    AtomicSwap.recover(spark, index)
    val centroids = loadCentroids(spark, index)
    require(nProbe <= centroids.size,
      s"nProbe=$nProbe exceeds the index's ${centroids.size} cells")
    if (!isPqStore(spark, index)) {
      require(refineWith.isEmpty,
        "refineWith applies to PQ stores; the raw store is already exact")
      val probes = graft.ops.Pq.probeRanking(col("__cd"), centroids.size, nProbe)
      val q = withCellDots(
          queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")),
          "qvec", centroids)
        .select(col("qid"), col("qvec"), explode(probes).as("__p"))
        .select(col("qid"), col("qvec"), col("__p.cell").as("cell"))
      val cells = readCells(spark, index)
        .select(col("cell"), col(idCol).as("nid"), col(vecCol).as("nvec"))
      val scored = cells.join(broadcast(q), Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("sim", Similarity.cosine(col("qvec"), col("nvec")))
        // a zero-norm stored vector scores NaN, and Spark orders NaN
        // ABOVE every number — unguarded it becomes rank 1 for every
        // query probing its cell (the hardNegatives/passesThreshold
        // trap; the PQ branch excludes such rows at build via the
        // unit-normalize, the raw store may carry them)
        .filter(!isnan(col("sim")))
      Similarity.rankTopK(scored, k)
    } else {
      require(refineFactor >= 1, s"refineFactor must be >= 1: $refineFactor")
      val model = loadCodebooks(spark, index)
      val probes = graft.ops.Pq.probeRanking(col("__cd"), centroids.size, nProbe)
      val q = withCellDots(
          queries
            .filter(col(vecCol).isNotNull && !exists(col(vecCol), v => v.isNull))
            .select(col(idCol).as("qid"), col(vecCol).as("__qv")),
          "__qv", centroids)
        .withColumn("__qnorm",
          sqrt(aggregate(col("__qv"), lit(0.0),
            (a, x) => a + x.cast("double") * x.cast("double"))))
        .filter(col("__qnorm") > 0.0)
        .select(col("qid"), graft.ops.Pq.lutArray("__qv", model).as("__luts"),
          col("__qnorm"), explode(probes).as("__p"))
        .select(col("qid"), col("__luts"), col("__qnorm"),
          col("__p.cell").as("cell"), col("__p.qc").as("qc"))
      val cells = readCells(spark, index)
        .select(col("cell"), col(idCol).as("nid"), col("pq_codes").as("__codes"))
      val scored = cells.join(broadcast(q), Seq("cell"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          ((graft.ops.Pq.adcFold(col("__codes"), col("__luts")) + col("qc"))
            / col("__qnorm")).as("sim"))
      refineWith match {
        case None => Similarity.rankTopK(scored, k)
        case Some(corpus) =>
          // A shortlist id the refine corpus lacks (an appended-
          // increment vector when refineWith points at the original
          // build input — the natural operator choice) must not
          // silently VANISH from results: it keeps its ADC estimate,
          // which is on the same cosine scale. Outer-joining would
          // put the big corpus on the build side, so: broadcast-inner
          // for the covered ids, then a small anti-join recovers the
          // uncovered remainder. A refine-side zero-norm vector
          // scores exact NaN — same ADC fallback, rather than letting
          // NaN sort to rank 1.
          val shortlist = Similarity.rankTopK(scored, k * refineFactor)
            .select(col("qid"), col("nid"), col("sim").as("__adc"))
          val nv = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
          val qv = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
          // matched is bounded (≤ queries × k × factor rows) and
          // feeds both the union and the anti-join — persist it so
          // the corpus scan behind it runs once (registry-released
          // at the run's unpersistAll, as every query cache is)
          val matched = graft.CachedFrames.persistOnce(nv
            .join(broadcast(shortlist), Seq("nid"))
            .join(broadcast(qv), Seq("qid"))
            .withColumn("__exact", Similarity.cosine(col("qvec"), col("nvec")))
            .select(col("qid"), col("nid"),
              when(!isnan(col("__exact")), col("__exact"))
                .otherwise(col("__adc")).as("sim")))
          val uncovered = shortlist
            .join(matched.select("qid", "nid"), Seq("qid", "nid"), "left_anti")
            .select(col("qid"), col("nid"), col("__adc").as("sim"))
          Similarity.rankTopK(matched.unionByName(uncovered), k)
      }
    }
  }
}
