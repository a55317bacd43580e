package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import graft.functions.GraftFunctions.roundPinned

/** PCA projection / whitening for embedding columns — the standard
  * preprocessing in front of ANN and semantic dedup: project to the
  * top-k principal directions (keeps most cosine structure in far
  * fewer dimensions → every downstream dot costs k/dim of the
  * original) and optionally whiten (scale each direction to unit
  * variance, which equalizes the axes LSH hyperplanes cut across).
  *
  * Fit is the textbook distributed shape: TWO tree-aggregated passes
  * over the corpus through MLlib's `RowMatrix` (column statistics,
  * then the dim×dim Gramian — executors accumulate partials, never
  * rows to the driver; the row RDD persists across the two so the
  * source is read and decoded once) and a driver-side
  * eigendecomposition of the dim×dim covariance (dim is embedding
  * width — 64..4096 — so the driver solve is trivial at any corpus
  * size). The fitted model is a plain case class of constants. Rows
  * with a null vector OR null elements are excluded (a null element
  * would otherwise unbox to a phantom 0.0 and bias the mean).
  *
  * Transform is fully codegen'd via the fused
  * [[graft.functions.MatVecDotsExpr]] kernel: `projᵢ = cᵢ·(x − μ)`
  * expands to `cᵢ·x − cᵢ·μ` where `cᵢ·μ` is a driver-computed
  * constant — so the data path is ONE fused mat-vec per row plus a
  * constant shift, no per-element lambda over the input vector, no
  * UDF, no shuffle.
  *
  * Determinism: a refit on the same input and partitioning is
  * bit-identical; a different partitioning changes the Gramian
  * tree-aggregation order, giving ulp-level drift (specced at 1e-9).
  * Eigenvector SIGNS are canonicalized (largest-magnitude coefficient
  * positive) so the arbitrary solver sign can never flip a stored
  * model. Not SQL-replayable (no eigensolver in DuckDB), so the
  * projection query ships under the driver's rows-only check with
  * the invariants pinned in [[PcaSpec]] instead.
  */
object Pca {

  /** Fitted model: `mean` (dim), `components` (k × dim, orthonormal
    * rows, descending eigenvalue), `eigenvalues` (k, the variance
    * along each component — the whitening scale), and
    * `explainedVariance` (k, fractions of total variance).
    */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      explainedVariance: Array[Double]) {
    def k: Int = components.length
    def dim: Int = mean.length
  }

  /** Fit the top-`k` principal components of `vecCol`
    * (`array<float|double>`). One distributed pass; driver solve is
    * dim×dim.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    require(k >= 1, s"k must be >= 1: $k")
    val rows = df.select(col(vecCol).cast("array<double>").as("__v"))
      .filter(col("__v").isNotNull && !exists(col("__v"), _.isNull))
      .rdd.map(r => OldVectors.dense(r.getSeq[Double](0).toArray))
      .persist()
    try {
      val mat = new RowMatrix(rows)
      val dim = mat.numCols().toInt
      require(k <= dim, s"k=$k exceeds embedding dim $dim")
      val stats = mat.computeColumnSummaryStatistics()
      val mean = stats.mean.toArray
      val totalVariance = stats.variance.toArray.sum
      val (pc, variance) = mat.computePrincipalComponentsAndExplainedVariance(k)
      // pc is dim × k column-major; transpose to k per-component rows and
      // canonicalize each sign so refits agree exactly
      val comps = Array.tabulate(k) { j =>
        val c = Array.tabulate(dim)(i => pc(i, j))
        val lead = c.maxBy(math.abs)
        if (lead < 0) c.map(-_) else c
      }
      val fractions = variance.toArray.take(k)
      PcaModel(mean, comps, fractions.map(_ * totalVariance), fractions)
    } finally rows.unpersist(blocking = false)
  }

  /** Append `outCol: array<double>` — the centered projection (and,
    * with `whiten`, per-direction 1/√λ scaling to unit variance).
    * Pure codegen'd projection via the fused mat-vec kernel +
    * constant offsets; no shuffle.
    */
  def transform(
      df: DataFrame,
      vecCol: String,
      model: PcaModel,
      outCol: String = "pca",
      whiten: Boolean = false): DataFrame = {
    require(!df.columns.contains(outCol),
      s"transform appends output column $outCol; rename the existing")
    require(!df.columns.contains("__pca_dots"),
      "transform stages through __pca_dots; rename the existing column")
    val offsets = model.components.map(c =>
      c.zip(model.mean).map { case (a, b) => a * b }.sum)
    // a near-zero eigenvalue means the direction carries no signal —
    // whitening it with 1/sqrt(λ) would AMPLIFY floating-point noise
    // by ~1e6; suppress the axis to 0 instead
    val scales: Array[Double] =
      if (whiten) model.eigenvalues.map(v => if (v < 1e-9) 0.0 else 1.0 / math.sqrt(v))
      else Array.fill(model.k)(1.0)
    // the fused kernel is float-typed; fit accepts any numeric array,
    // so transform must too
    val dots = graft.functions.MatVecDotsExpr.matVecDots(
      col(vecCol).cast("array<float>"), model.components)
    // k is small (the projection width): the constant-shift transform
    // runs over k elements per row, not dim
    val shifted = (0 until model.k).map { i =>
      (element_at(col("__pca_dots"), i + 1) - offsets(i)) * scales(i)
    }
    df.withColumn("__pca_dots", dots)
      .withColumn(outCol, array(shifted: _*))
      .drop("__pca_dots")
  }

  // ------------------------------------------------ replayable variant

  /** Moment quantization scale for [[fitReplayable]]: every per-row
    * term is `round(x * 1e9)` to a long before summing, so the sums
    * are INTEGER — exact and associativity-free — and any physical
    * aggregation shape (map-side combine, AQE re-plan, a different
    * partitioning, another SQL engine) produces bit-identical moments.
    * Magnitudes: |x| and |x·y| are O(1) for unit-ish embeddings, so
    * quantized terms are ≤ ~1e10 and even billions of rows stay far
    * from the long range.
    */
  val replayQuantScale: Double = 1e9

  /** Eigenvalue floor under which a whitening axis is suppressed to 0
    * (same guard as [[transform]]). */
  val replayLambdaFloor: Double = 1e-9

  /** Deterministic start vector for power-iteration component `c` —
    * a fixed integer recurrence (exact in 64-bit arithmetic in any
    * engine), NOT a solver-dependent random draw, so a SQL replay can
    * embed the identical values. */
  def replayStart(c: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { i =>
      ((c.toLong * dim + i) * 2654435761L + 12345L) % 1000003L / 1000003.0 - 0.5
    }

  /** Fit `k` principal components by QUANTIZED moments + fixed-order
    * power iteration with deflation — every floating-point operation
    * in a pinned order, so the fit (and the whitened projection built
    * from it) is replayable BIT-EXACTLY by any IEEE-754 SQL engine:
    * the oracle-exactness counterpart of [[fit]], same convention as
    * [[Pq.lowestIdCodebooks]] vs [[Pq.train]].
    *
    * Distributed pass (the only one): each row explodes to its
    * dim linear + dim(dim+1)/2 upper-triangle product terms, each
    * term quantized to a long ([[replayQuantScale]]) — integer sums
    * are exact and order-free, so the map-side-combined groupBy (one
    * shuffle of ≤ (dim²/2 + dim + 1) × partitions tiny rows) matches
    * a driver loop, a different partitioning, or DuckDB no matter how
    * the plan executes. Cost is the same dim²-products-per-row bill
    * as [[fit]]'s Gramian; [[fit]] remains the production path
    * (BLAS-fused, no explode fan-out).
    *
    * Driver solve: `iters` power-iteration steps per component over
    * the dim×dim covariance, Rayleigh-quotient eigenvalue, rank-one
    * deflation — all left-to-right loops mirrored token-for-token by
    * the SQL oracle's recursive CTE (list_sum is a strict sequential
    * fold; verified to 4096 elements). With a flat spectrum the
    * vectors need not converge to true eigenvectors — replay
    * exactness never depends on convergence, only the ORDER of
    * operations — but they are always unit-norm and the projection
    * still whitens the directions found. Signs follow the start
    * vector (no canonicalization: the largest-|coefficient| rule of
    * [[fit]] would need a tie rule the SQL side must copy; the start
    * vectors are already deterministic so signs are too).
    */
  def fitReplayable(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      k: Int,
      iters: Int = 24): PcaModel = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]: $k")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val qs = replayQuantScale
    val v = col("__v")
    def q(c: Column): Column = roundPinned(c * lit(qs)).cast("long")
    // Two SMALL nested explodes, not one dim(dim+1)/2-element inline
    // struct array: a single projection constructing 2 000+ structs
    // per row overflows whole-stage codegen's method budget and falls
    // back to interpreted evaluation (~4.5 s at bench scale vs sub-
    // second for this shape). Integer sums make the two shapes
    // bit-identical anyway.
    // size(__v) === dim: a short vector would emit NULL quad terms
    // (element_at past the end) that SUM silently drops, skewing the
    // quantized moments — and a dimension absent from EVERY row would
    // make sums((i,-1)) throw on the driver. Wrong-length vectors are
    // excluded under the same valid-vector convention as the ANN
    // family (mirrored in the oracle's valid CTE).
    val base = df
      .select(col(vecCol).cast("array<double>").as("__v"))
      .filter(v.isNotNull && !exists(v, _.isNull) && size(v) === dim)
      // Spread the moments fanout (guide §2.4, r22): the quad explode
      // multiplies every vector by dim(dim+1)/2 ≈ 2 000 rows, and
      // without this exchange the whole fanout runs in the SCAN's
      // task count — one task for a single-file corpus sample, which
      // is exactly why q_pca_whiten measured core-INSENSITIVE in the
      // r21 8-vs-32-core pair (1.82 s at both). The exchange moves
      // only the narrow pre-explode vectors; integer quantized sums
      // are order-free, so results are bit-identical.
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
    val withIdx = base.select(v, posexplode(v).as(Seq("__i", "__x")))
    val lin = withIdx.select(
      col("__i").as("i"), lit(-1).as("j"), q(col("__x")).as("q"))
    val quad = withIdx
      .select(v, col("__i"), col("__x"),
        explode(sequence(col("__i"), lit(dim - 1))).as("__j"))
      .select(col("__i").as("i"), col("__j").as("j"),
        q(col("__x") * element_at(v, col("__j") + 1)).as("q"))
    val cnt = base.select(lit(-1).as("i"), lit(-1).as("j"), lit(1L).as("q"))
    // persistOnce: the aggregated moments frame is ≤ dim²/2 + dim + 1
    // tiny rows, and sibling queries fitting the same input (the
    // whiten row + the reduced-space top-k composition) re-collect it
    // instead of re-running the corpus moments pass.
    val sums = graft.CachedFrames.persistOnce(
        cnt.unionByName(lin).unionByName(quad)
          .groupBy(col("i"), col("j"))
          .agg(sum(col("q")).as("s")))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val n = sums((-1, -1))
    require(n > 1, "fitReplayable needs at least two valid vectors")
    val mu = Array.tabulate(dim)(i => sums((i, -1)).toDouble / qs / n)
    // SAMPLE covariance (n−1), the same normalization as [[fit]]'s
    // MLlib path — so eigenvalues and whitening scales agree between
    // the two fits instead of differing by n/(n−1).
    val cov = Array.tabulate(dim, dim)((i, j) =>
      sums((math.min(i, j), math.max(i, j))).toDouble / qs / (n - 1) -
        mu(i) * mu(j) * n / (n - 1))
    val totalVariance = (0 until dim).map(i => cov(i)(i)).sum

    def matvec(c: Array[Array[Double]], x: Array[Double]): Array[Double] =
      Array.tabulate(dim) { i =>
        var acc = 0.0; var j = 0
        while (j < dim) { acc += c(i)(j) * x(j); j += 1 }
        acc
      }
    val comps = Array.ofDim[Array[Double]](k)
    val lams = Array.ofDim[Double](k)
    for (c <- 0 until k) {
      var vv = replayStart(c, dim)
      for (_ <- 1 to iters) {
        val w = matvec(cov, vv)
        var ss = 0.0; var i = 0
        while (i < dim) { ss += w(i) * w(i); i += 1 }
        val nrm = math.sqrt(ss)
        vv = w.map(_ / nrm)
      }
      val cv = matvec(cov, vv)
      var lam = 0.0; var i = 0
      while (i < dim) { lam += vv(i) * cv(i); i += 1 }
      comps(c) = vv; lams(c) = lam
      var a = 0
      while (a < dim) {
        var b = 0
        while (b < dim) { cov(a)(b) -= lam * vv(a) * vv(b); b += 1 }
        a += 1
      }
    }
    PcaModel(mu, comps, lams, lams.map(_ / totalVariance))
  }

  // -------------------------------------- Johnson–Lindenstrauss (X121)

  /** Deterministic ±1 sign for JL output dimension `j`, input
    * dimension `i` — md5-derived (low bit of the 60-bit hash of
    * "jl|j|i"), no RNG state, re-derivable by any engine with md5.
    */
  def jlSign(j: Int, i: Int): Double =
    if (graft.functions.Md5PrefixLongExpr.hashPrefix(s"jl|$j|$i", 15) % 2 == 0) 1.0
    else -1.0

  /** Johnson–Lindenstrauss sign-matrix projection: append `outDim`
    * double columns `outPrefix1..outPrefixN` =
    * `(Σᵢ xᵢ·s(j,i)) · (1/√outDim)` with s the deterministic ±1
    * matrix ([[jlSign]]) — the Achlioptas (2003) database-friendly
    * random projection. The DATA-INDEPENDENT complement of
    * [[fitReplayable]]: no fit pass at all, so it costs nothing to
    * derive, applies identically to every increment of a growing
    * corpus (no model staleness), and the JL lemma bounds pairwise
    * distance distortion w.h.p. regardless of the data. PCA keeps
    * more structure per dimension when a fit pass is affordable; JL
    * is the streaming/appendix-corpus path.
    *
    * Pure codegen'd projection through the fused
    * [[graft.functions.MatVecDotsExpr]] kernel (which accumulates in
    * DOUBLE, left-to-right — the exact replay order; the sign matrix
    * ships as one reference object, so codegen stays tiny at any
    * outDim×dim). A literal-fold first cut evaluated interpreted at
    * ~11 M mul-adds/s; the kernel is the same arithmetic JIT-compiled.
    * A SQL engine replays the projection bit-exactly (q_jl_project's
    * oracle embeds the same sign literals and scale).
    */
  def jlProject(
      vecCol: Column,
      dim: Int,
      outDim: Int,
      outPrefix: String = "jl"): Seq[Column] = {
    require(outDim >= 1 && outDim <= dim, s"need 1 <= outDim <= dim: $outDim")
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val signs = Array.tabulate(outDim, dim)((j, i) => jlSign(j, i))
    val dots = graft.functions.MatVecDotsExpr.matVecDots(
      vecCol.cast("array<float>"), signs)
    (0 until outDim).map { j =>
      (roundPinned(element_at(dots, j + 1) * lit(scale), 4))
        .as(s"$outPrefix${j + 1}")
    }
  }

  /** The k whitened-projection columns for a [[fitReplayable]] model,
    * every double op in the pinned replay order: per row,
    * `pcᶜ = (Σᵢ xᵢ·vᶜᵢ − vᶜ·μ) · (λc < floor ? 0 : 1/√λc)`. The dot
    * runs through the fused [[graft.functions.MatVecDotsExpr]] kernel
    * — DOUBLE accumulation, left-to-right, i.e. exactly the oracle's
    * sequential fold, but JIT-compiled with the component matrix as
    * one reference object. Codegen'd projection, no shuffle.
    */
  def replayableWhitened(
      vecCol: Column,
      model: PcaModel,
      outPrefix: String = "pc"): Seq[Column] = {
    val dim = model.dim
    val offs = model.components.map { c =>
      var o = 0.0; var i = 0
      while (i < dim) { o += c(i) * model.mean(i); i += 1 }
      o
    }
    val scls = model.eigenvalues.map(l =>
      if (l < replayLambdaFloor) 0.0 else 1.0 / math.sqrt(l))
    val dots = graft.functions.MatVecDotsExpr.matVecDots(
      vecCol.cast("array<float>"), model.components)
    (0 until model.k).map { c =>
      // `+ 0.0` folds -0.0 so the dump is sign-stable cross-engine.
      (roundPinned((element_at(dots, c + 1) - lit(offs(c))) * lit(scls(c)), 4))
        .as(s"$outPrefix${c + 1}")
    }
  }
}
