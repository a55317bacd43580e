package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for approximate nearest neighbor search
  * — the compression path that makes billion-vector indexes fit:
  * each `dim`-float vector is split into `m` contiguous subspaces of
  * `dim/m` floats, each subspace is vector-quantized against its own
  * `ksub`-entry codebook, and the vector is stored as `m` small codes
  * instead of `dim` floats (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — public
  * textbook material; FAISS popularized the same layout as IVF-PQ).
  *
  * Scale shape, which is the whole point:
  *
  *  - '''Storage''': `m` codes/vector (1–2 bytes each at ksub ≤ 256)
  *    vs `4·dim` bytes raw — 64-dim float embeddings compress 16–32×,
  *    so a corpus whose raw vectors are 100 TB carries a ~4 TB code
  *    table that joins/scans like any other column.
  *  - '''Query (ADC — asymmetric distance computation)''': per query,
  *    one `m × ksub` lookup table of subspace dot products is computed
  *    once (map-side, against driver-constant codebooks); scoring a
  *    candidate is then `m` table lookups + adds instead of `dim`
  *    multiplies, and — critically — '''candidates never carry their
  *    raw vectors''', only codes, so the scoring join moves
  *    (id, m codes) rows.
  *  - '''Training''': per-subspace k-means, all `m` subspaces fused
  *    into ONE distributed pass per Lloyd iteration (assignment via
  *    the fused mat-vec kernel per subspace, then a single
  *    explode + groupBy(subspace, code) with map-side partial
  *    aggregation — the shuffle is `m × ksub × dsub` cells, never
  *    corpus-sized).
  *
  * Encoding is a pure codegen'd projection: per subspace one
  * [[graft.functions.MatVecDotsExpr]] call against an AUGMENTED
  * constant matrix `[c_j | −½‖c_j‖²]` with the input slice augmented
  * by a literal 1, so `argmax(dot − ½‖c‖²) = argmin ‖x − c‖²` comes
  * out of a single fused kernel — no join, no shuffle, no
  * per-element lambda over the corpus.
  *
  * ADC ranks by approximate INNER PRODUCT `Σ_s lut_s[code_s] ≈ q·x`
  * (L2-normalize inputs upstream if cosine ranking is wanted, as the
  * rest of the ANN family does). ADC is exact in the quantized space:
  * the error is entirely the quantization residual, which shrinks
  * with `m` and `ksub`. For bounded candidate generation at scale,
  * route candidates through the IVF cells ([[Similarity.ivfTopK]],
  * [[graft.pipeline.AnnIndex]]) and use ADC as the in-cell scorer.
  */
object Pq {

  /** Fitted model: `codebooks(s)(j)` is subspace `s`'s `j`-th centroid
    * (`dsub` doubles). Deterministic for a fixed corpus and knobs.
    */
  final case class PqModel(
      dim: Int,
      m: Int,
      codebooks: Array[Array[Array[Double]]]) {
    def dsub: Int = dim / m
    def ksub: Int = codebooks.head.length
  }

  private def validate(dim: Int, m: Int, ksub: Int): Unit = {
    require(dim >= 1 && m >= 1 && ksub >= 2,
      s"dim, m must be >= 1 and ksub >= 2: dim=$dim m=$m ksub=$ksub")
    require(dim % m == 0, s"m=$m must divide dim=$dim evenly")
  }

  /** Subspace `s`'s slice of `vec` (1-based slice, `array<float>`). */
  private[graft] def subVec(vec: Column, s: Int, dsub: Int): Column =
    slice(vec, s * dsub + 1, dsub)

  /** Deterministic stand-in codebooks: subspace slices of the `ksub`
    * lowest-id corpus vectors — the same oracle-replayable quantizer
    * convention as [[Similarity.ivfTopK]]'s default. Production
    * recall wants [[train]]; this exists so PQ's encode/ADC algebra
    * is exactly reproducible by any SQL engine.
    */
  def lowestIdCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int): PqModel = {
    validate(dim, m, ksub)
    val dsub = dim / m
    val rows = corpus
      .select(col(idCol), col(vecCol))
      // ANN-family convention (same as train/lowestIdResidualCodebooks):
      // a NULL or element-NULL vector among the lowest ids is excluded,
      // not NPE'd on the driver-side getSeq map below.
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .orderBy(col(idCol))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(rows.length == ksub, s"corpus has < $ksub rows for the quantizer")
    val books = Array.tabulate(m)(s =>
      rows.map(v => v.slice(s * dsub, (s + 1) * dsub)))
    PqModel(dim, m, books)
  }

  /** Per-subspace Lloyd k-means, all `m` subspaces in ONE distributed
    * pass per iteration. Seeding is farthest-point (by L2) over the
    * `seedSample` lowest-id vectors per subspace — bounded driver
    * memory, deterministic. Each iteration: assign every row's `m`
    * subvectors map-side (fused kernel per subspace), explode to
    * (subspace, code, subvec) and groupBy(subspace, code) with `dsub`
    * avg aggregates — map-side combined, `m × ksub × dsub` cells
    * shuffled, `m × ksub` rows collected. Empty cells keep their
    * previous centroid. Unlike [[Similarity.trainCentroids]] the
    * centroids are NOT normalized: PQ quantizes raw subvectors by L2
    * distance, not directions by cosine.
    */
  def train(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int = 3,
      seedSample: Int = 256): PqModel = {
    validate(dim, m, ksub)
    val dsub = dim / m
    val vecs = corpus
      .select(col(vecCol).as("__vec"))
      .filter(col("__vec").isNotNull && !exists(col("__vec"), _.isNull))

    // ---- farthest-point seeding per subspace on one bounded sample
    // (lowest-id rows, so retraining on the same corpus is identical)
    val seedRows = corpus
      .select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .orderBy(col(idCol))
      .limit(seedSample)
      .collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    require(seedRows.nonEmpty, "corpus is empty")
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    var codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      val subs = seedRows.map(v => v.slice(s * dsub, (s + 1) * dsub))
      val seeds = scala.collection.mutable.ArrayBuffer(subs.head)
      while (seeds.size < ksub) {
        // farthest-point: next seed maximizes distance to its nearest
        // existing seed (ties: first in sample order); with fewer
        // distinct sample points than ksub this repeats points, and
        // Lloyd + empty-cell carry-over resolves the duplicates
        val next = subs.maxBy(v => seeds.map(c => l2(v, c)).min)
        seeds += next
      }
      seeds.toArray
    }

    // ---- Lloyd iterations: one exploded groupBy pass each
    for (_ <- 1 to iters) {
      val perSub = (0 until m).map { s =>
        struct(
          lit(s).as("s"),
          encodeSub(col("__vec"), s, dsub, codebooks(s)).as("c"),
          subVec(col("__vec"), s, dsub).as("v"))
      }
      val avgs = (0 until dsub).map(d =>
        avg(element_at(col("sub.v"), d + 1).cast("double")).as(s"__d$d"))
      val rows = vecs
        .select(explode(array(perSub: _*)).as("sub"))
        .groupBy(col("sub.s").as("s"), col("sub.c").as("c"))
        .agg(avgs.head, avgs.tail: _*)
        .collect()
      val next = codebooks.map(_.map(identity))
      rows.foreach { r =>
        val s = r.getInt(0); val c = r.getInt(1)
        if (s >= 0 && s < m && c >= 0 && c < ksub)
          next(s)(c) = Array.tabulate(dsub)(d => r.getDouble(d + 2))
      }
      codebooks = next
    }
    PqModel(dim, m, codebooks)
  }

  /** Subspace code: `argmin_j ‖x_s − c_j‖² = argmax_j (x_s·c_j −
    * ½‖c_j‖²)`, one fused kernel over the augmented matrix, ties to
    * the first index.
    */
  private def encodeSub(
      vec: Column, s: Int, dsub: Int,
      book: Array[Array[Double]]): Column = {
    val augmented = book.map { c =>
      // offset summed left-to-right in double — the replayable order
      var n2 = 0.0; var i = 0
      while (i < c.length) { n2 += c(i) * c(i); i += 1 }
      c :+ (-0.5 * n2)
    }
    val in = concat(subVec(vec, s, dsub), array(lit(1.0f)))
    val scores = graft.functions.MatVecDotsExpr.matVecDots(in, augmented)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Append `codesCol: array<int>` of length `m` — the PQ encoding.
    * Pure codegen'd projection (one fused kernel per subspace), zero
    * shuffle. NULL or element-NULL vectors encode to NULL (the
    * ANN-family exclusion convention; [[adcTopK]] drops them).
    * A production sink packs the codes to 1–2 bytes each; the array
    * keeps the algebra engine-portable.
    */
  def encode(
      df: DataFrame,
      vecCol: String,
      model: PqModel,
      codesCol: String = "pq_codes"): DataFrame = {
    require(!df.columns.contains(codesCol),
      s"encode appends $codesCol; rename the existing column")
    val codes = (0 until model.m).map(s =>
      encodeSub(col(vecCol), s, model.dsub, model.codebooks(s)))
    df.withColumn(
      codesCol,
      when(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull),
        array(codes: _*)))
  }

  // ------------------------------------------------------------------
  // IVF-PQ: the composed billion-vector layout (FAISS's IVFADC;
  // Jégou et al. TPAMI 2011 §V). The coarse IVF quantizer bounds the
  // CANDIDATES (each query probes nProbe of nCells inverted lists);
  // PQ bounds the BYTES (list entries are (id, m codes), never raw
  // vectors). Codes quantize the RESIDUAL x − c_cell, not x itself:
  // within a cell the residuals live in a small ball around the
  // origin, so the same ksub codebook entries spend their resolution
  // on the part of x the coarse quantizer didn't already explain —
  // the score error drops accordingly (pinned in PqSpec). ADC then
  // decomposes q·x ≈ q·c_cell + q·r̂: the first term falls out of the
  // probe ranking (the query-centroid dot is already computed), the
  // second is the m-lookup LUT sum.
  // ------------------------------------------------------------------

  private def centroidMatrix(centroids: Seq[Seq[Float]]): Array[Array[Double]] =
    centroids.map(_.map(_.toDouble).toArray).toArray

  /** array<array<double>> plan literal of the coarse centroids. */
  private def centroidLit(cm: Array[Array[Double]]): Column =
    array(cm.toIndexedSeq.map(c => array(c.toIndexedSeq.map(lit): _*)): _*)

  /** Append `cellCol` (best-dot coarse cell, first index wins ties —
    * the [[Similarity.ivfTopK]] assignment convention) and `resCol`
    * (float residual vs the assigned centroid, each element
    * `float(double(x_i) − c_i)` so any engine reproduces the exact
    * IEEE value). NULL / element-NULL vectors get NULL cell and
    * residual. Pure projection — the centroid matrix rides the plan
    * as a constant, no join, no shuffle.
    */
  def withCellAndResidual(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      cellCol: String = "ivf_cell",
      resCol: String = "__res"): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val cm = centroidMatrix(centroids)
    val ok = col(vecCol).isNotNull && !exists(col(vecCol), _.isNull)
    df.withColumn("__cd",
        when(ok, graft.functions.MatVecDotsExpr.matVecDots(col(vecCol), cm)))
      .withColumn(cellCol,
        (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int"))
      .withColumn(resCol,
        zip_with(col(vecCol), element_at(centroidLit(cm), col(cellCol) + 1),
          (x, c) => (x.cast("double") - c).cast("float")))
      .drop("__cd")
  }

  /** Deterministic stand-in RESIDUAL codebooks: subspace slices of
    * the `ksub` lowest-id corpus rows' residuals — the IVF-PQ
    * counterpart of [[lowestIdCodebooks]], replayable by any SQL
    * engine (assignment, residual float cast, and slicing all follow
    * the engine's own conventions). [[trainResidual]] is the recall
    * path; this one exists for oracle-exact queries.
    */
  def lowestIdResidualCodebooks(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      dim: Int,
      m: Int,
      ksub: Int): PqModel = {
    validate(dim, m, ksub)
    val dsub = dim / m
    val cm = centroidMatrix(centroids)
    val rows = corpus
      .select(col(idCol), col(vecCol))
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .orderBy(col(idCol))
      .limit(ksub)
      .collect()
      .map(_.getSeq[Float](1).toArray)
    require(rows.length == ksub, s"corpus has < $ksub rows for the quantizer")
    val residuals = rows.map { v =>
      // same left-to-right dot and first-max-index rules as the kernel
      val dots = cm.map { c =>
        var acc = 0.0; var i = 0
        while (i < c.length) { acc += c(i) * v(i).toDouble; i += 1 }
        acc
      }
      var best = 0; var i = 1
      while (i < dots.length) { if (dots(i) > dots(best)) best = i; i += 1 }
      val c = cm(best)
      Array.tabulate(dim)(d => (v(d).toDouble - c(d)).toFloat.toDouble)
    }
    val books = Array.tabulate(m)(s =>
      residuals.map(r => r.slice(s * dsub, (s + 1) * dsub)))
    PqModel(dim, m, books)
  }

  /** Residual-space [[train]]: assign + residual as one projection,
    * then per-subspace Lloyd over the residual frame. The codebooks
    * spend their resolution inside the cells, which is where IVF-PQ
    * scores (pinned in PqSpec: residual ADC beats raw-vector ADC on
    * a clustered corpus).
    */
  def trainResidual(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      dim: Int,
      m: Int,
      ksub: Int,
      iters: Int = 3,
      seedSample: Int = 256): PqModel = {
    validate(dim, m, ksub)
    val res = withCellAndResidual(
      corpus.select(col(idCol), col(vecCol)), vecCol, centroids)
    train(res, idCol, "__res", dim, m, ksub, iters, seedSample)
  }

  /** Inverted-list build projection: (…, `cellCol`, `codesCol`) where
    * codes PQ-encode the cell residual against `model` (a residual
    * model from [[trainResidual]]/[[lowestIdResidualCodebooks]]).
    * This IS the index row layout at scale — partition the output by
    * `cellCol` and the raw vectors never need to be read again for
    * search. NULL shapes get NULL cell/codes (the ANN-family
    * exclusion convention). Pure projection, zero shuffle.
    */
  def encodeIvf(
      df: DataFrame,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      model: PqModel,
      cellCol: String = "ivf_cell",
      codesCol: String = "pq_codes"): DataFrame = {
    require(centroids.forall(_.length == model.dim),
      s"centroid dim must equal model dim ${model.dim}")
    val withRes = withCellAndResidual(df, vecCol, centroids, cellCol)
    val codes = (0 until model.m).map(s =>
      encodeSub(col("__res"), s, model.dsub, model.codebooks(s)))
    withRes
      .withColumn(codesCol, when(col(cellCol).isNotNull, array(codes: _*)))
      .drop("__res")
  }

  /** IVF-PQ top-`k` (ADC over probed inverted lists): each query
    * ranks the coarse cells by centroid dot, probes the best
    * `nProbe`, and scores ONLY those cells' entries by
    * `q·c_cell + Σ_s lut_s[code_s]`. The corpus side of the scoring
    * join carries (cell, id, m codes); the query side — LUTs, probe
    * cells, and the already-computed centroid dots — broadcasts.
    * Per-query cost ≈ corpus × nProbe/nCells candidate rows × m
    * lookups each; raw vectors appear in no join at any point.
    */
  def ivfAdcTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      model: PqModel,
      nProbe: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(nProbe >= 1 && nProbe <= centroids.size,
      s"nProbe must be in [1, ${centroids.size}]: $nProbe")
    val cm = centroidMatrix(centroids)
    val n = encodeIvf(
        corpus.select(col(idCol).as("nid"), col(vecCol)), vecCol, centroids, model)
      .filter(col("pq_codes").isNotNull)
      .select(col("ivf_cell").as("cell"), col("nid"), col("pq_codes").as("__codes"))
      // Materialization barrier, deliberately: the scoring join below
      // is a codegen'd BroadcastHashJoin, and whole-stage codegen
      // defers a pipelined projection to its USE site — which for a
      // join emitting multiple rows per stream row means the whole
      // encode expression re-evaluates PER CANDIDATE, not per corpus
      // row (measured: 6.1 s vs 1 s on q_ivfpq_topk at sf0.1, ~25×
      // redundant encode work at nProbe=4 × 100 queries). The
      // exchange pins codes to one evaluation per corpus row AND
      // lands the code table in its inverted-list layout (clustered
      // by cell) — the same bytes the join must move anyway, 16–32×
      // smaller than the raw vectors. The persisted-store path
      // ([[graft.pipeline.AnnIndex]]) reads codes from parquet and
      // needs no barrier.
      .repartition(col("cell"))
    val probes = probeRanking(col("__cd"), centroids.size, nProbe)
    val q = queries
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"))
      .withColumn("__cd", graft.functions.MatVecDotsExpr.matVecDots(col("__qv"), cm))
      .select(col("qid"), lutArray("__qv", model).as("__luts"), explode(probes).as("__p"))
      .select(col("qid"), col("__luts"),
        col("__p.cell").as("cell"), col("__p.qc").as("qc"))
    val adcSum = adcFold(col("__codes"), col("__luts"))
    val scored = n
      .join(broadcast(q), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), (adcSum + col("qc")).as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("adc"))
  }

  /** The shared probe ranking: the `nProbe` best cells of a
    * materialized centroid-dots array `cdCol`, as
    * `array<struct<cell:int, qc:double>>`. Sorts (−dot, idx) structs
    * so LOWER index wins dot ties — the [[Similarity.ivfTopK]]
    * convention every oracle replays — and recovers the dot (`qc`,
    * the `q·c_cell` ADC term) by exact IEEE negation of the sort key.
    * One definition on purpose: this tie rule is pinned by three
    * consumers (inline IVF-PQ, and both [[graft.pipeline.AnnIndex]]
    * query branches); a divergence would silently desynchronize the
    * store path from the inline path.
    */
  private[graft] def probeRanking(cdCol: Column, nCells: Int, nProbe: Int): Column = {
    val ranked = array_sort(transform(
      sequence(lit(0), lit(nCells - 1)),
      i => struct((-element_at(cdCol, i + 1)).as("neg"), i.as("idx"))))
    transform(slice(ranked, lit(1), lit(nProbe)),
      s => struct(s.getField("idx").cast("int").as("cell"), (-s.getField("neg")).as("qc")))
  }

  /** `Σ_s lut_s[code_s]` — the in-subspace-order ADC fold shared by
    * every scorer, as the codegen'd [[graft.functions.AdcSumExpr]]
    * loop (bit-identical to the composed
    * `aggregate(zip_with(codes, luts, element_at))` fold — pinned in
    * PqSpec — which evaluates INTERPRETED and was measured as the
    * dominant cost of the candidate-scoring join).
    */
  private[graft] def adcFold(codes: Column, luts: Column): Column =
    graft.functions.AdcSumExpr.adcSum(codes, luts)

  /** The composed-built-ins form of [[adcFold]] — kept as the
    * equivalence-spec reference, never on the hot path.
    */
  private[graft] def adcFoldComposed(codes: Column, luts: Column): Column =
    aggregate(
      zip_with(codes, luts, (c, l) => try_element_at(l, c + 1)),
      lit(0.0),
      (acc, x) => acc + x)

  /** Per-subspace LUTs of `vecCol` against the model's codebooks. */
  private[graft] def lutArray(vecCol: String, model: PqModel): Column =
    array((0 until model.m).map(s =>
      graft.functions.MatVecDotsExpr.matVecDots(
        subVec(col(vecCol), s, model.dsub), model.codebooks(s))): _*)

  /** ADC top-`k`: rank every corpus code row against every query by
    * the table-lookup inner product `Σ_s lut_s[code_s]`. The corpus
    * side carries ONLY (id, codes) — never raw vectors; the query
    * side computes its `m × ksub` lookup table map-side from the
    * driver-constant codebooks and must fit a broadcast (the same
    * contract as the brute-force and hard-negative scorers). Corpus
    * streams once; cost per pair is `m` lookups, not `dim` multiplies.
    *
    * @param codes   corpus with `idCol` and `codesCol` (from [[encode]])
    * @param queries query rows with `idCol` and raw `vecCol`
    * @return (qid, rank, nid, adc) with rank 1..k by (adc desc, nid);
    *         `adc ≈ q·x` in the quantized space
    */
  def adcTopK(
      codes: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      model: PqModel,
      k: Int,
      codesCol: String = "pq_codes"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val q = queries
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), _.isNull))
      .select(col(idCol).as("qid"), lutArray(vecCol, model).as("__luts"))
    val n = codes
      .filter(col(codesCol).isNotNull)
      .select(col(idCol).as("nid"), col(codesCol).as("__codes"))
    val adc = adcFold(col("__codes"), col("__luts"))
    val scored = n
      .join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), adc.as("adc"))
    val w = Window.partitionBy("qid").orderBy(col("adc").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("adc"))
  }
}
