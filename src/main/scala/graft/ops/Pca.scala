package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix

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
}
