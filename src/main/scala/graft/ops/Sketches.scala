package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis.h64
import graft.functions.GraftFunctions.roundPinned

/** Deterministic streaming-style sketches as relational plans:
  * KMV (k-minimum-values) distinct-count estimation, a CountMin
  * frequency sketch with heavy-hitter extraction, and grouped
  * quantiles.
  *
  * Spark ships HLL++ (`approx_count_distinct`) and KLL-ish
  * (`approx_percentile`) aggregates; these exist alongside them for
  * two reasons: (1) the estimate is REPRODUCIBLE — hash-derived, no
  * engine-private sketch state — so an external SQL engine replays it
  * bit-for-bit (the DuckDB oracle does), which matters when training
  * pipelines must audit exactly what a filter kept; (2) the sketch
  * intermediates (k smallest hashes, d×w counter grid) are plain
  * DataFrames a caller can persist, merge across days, or diff.
  *
  * 100 TB design notes:
  *  - KMV: the rank ≤ k filter after a per-group window triggers
  *    Spark's WindowGroupLimit rewrite — each map task retains only k
  *    rows per group before the shuffle, so the exchange moves
  *    O(groups × k) rows regardless of input size.
  *  - CountMin: the sketch is a d×w counter grid built by one
  *    map-side-combined aggregation over d codegen'd hash projections;
  *    estimation joins candidates to the grid on (row, bucket) — the
  *    grid side is tiny and broadcasts.
  *  - Quantiles: exact `percentile` shuffles every value to its
  *    group — fine for bounded groups; pass `exact=false` to use
  *    `approx_percentile` (bounded-memory KLL-style, not
  *    oracle-reproducible) at corpus scale.
  */
object Sketches {

  /** Per-group KMV distinct-count estimate from the k smallest
    * distinct 60-bit hashes of `valueCol`: estimate = (k−1) / U_k
    * where U_k is the k-th minimum normalized to (0, 1]; groups with
    * fewer than k distinct hashes report their exact distinct count.
    *
    * Output: group cols, `n_kept` (min(k, distinct)), `kth_hash`,
    * `est_distinct`.
    */
  def kmvDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      k: Int,
      hasher: (Column, Column) => Column = h64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, "KMV needs k >= 2")
    val domain = math.pow(2, 60) // h64 range: [0, 2^60)
    val hashed = df
      .select(groupCols.map(col) :+ hasher(lit("kmv"), valueCol).as("__h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_kept"), max(col("__h")).as("kth_hash"))
      .withColumn(
        "est_distinct",
        roundPinned(
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit((k - 1) * domain) / col("kth_hash")),
          4))
  }

  /** Materialized KMV sketch: `(group cols..., kmv: array<long>)` —
    * the sorted k smallest distinct hashes per group. This is the
    * MERGEABLE form: sketches of disjoint (or overlapping) corpus
    * partitions combine losslessly via [[kmvMerge]], so daily partials
    * union into an exact whole-corpus sketch without rescanning —
    * the property that makes a sketch useful at warehouse scale.
    */
  def kmvSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      k: Int,
      hasher: (Column, Column) => Column = h64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hashed = df
      .select(groupCols.map(col) :+ hasher(lit("kmv"), valueCol).as("__h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    hashed
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }

  /** Merge two KMV sketch frames (same group columns, same hasher):
    * per group, the k smallest of the distinct union of both hash
    * sets — exactly the sketch a single pass over the combined data
    * would produce (property-specced). Groups present in only one
    * side pass through.
    */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exploded = a.unionByName(b)
      .select(groupCols.map(col) :+ explode(col("kmv")).as("__h"): _*)
      .distinct()
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__h"))
    exploded
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("__h"))).as("kmv"))
  }

  /** Distinct-count estimate from a sketch frame ([[kmvSketch]] /
    * [[kmvMerge]] output): same estimator as [[kmvDistinct]].
    */
  def kmvEstimate(sketch: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val domain = math.pow(2, 60)
    sketch.select(
      groupCols.map(col) ++ Seq(
        size(col("kmv")).cast("long").as("n_kept"),
        element_at(col("kmv"), -1).as("kth_hash")): _*)
      .withColumn(
        "est_distinct",
        roundPinned(
          when(col("n_kept") < k, col("n_kept").cast("double"))
            .otherwise(lit((k - 1) * domain) / col("kth_hash")),
          4))
  }

  /** Set-overlap estimation from two KMV sketches — "how much of
    * corpus B duplicates corpus A" without a distinct-join of either:
    * per group, take the k smallest hashes of the sketch UNION, count
    * how many of those appear in BOTH sketches (ρ = n_both / n_union
    * estimates the Jaccard similarity — the k-minimum-values
    * coincidence argument, same machinery as MinHash), and scale by
    * the union's KMV cardinality estimate for the intersection size.
    * Output: group cols, `n_union_kept`, `n_both`, `est_union`,
    * `est_jaccard`, `est_intersection` (= rounded jaccard × rounded
    * union, so every emitted figure is engine-replayable arithmetic
    * over the deterministic hashes).
    *
    * Everything is codegen'd array arithmetic over the two k-length
    * sketch columns — one group equi-join between sketch frames, no
    * re-scan of either corpus. Sketches must share `k` and the
    * hasher.
    */
  def kmvOverlap(
      a: DataFrame,
      b: DataFrame,
      groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val joined = a.withColumnRenamed("kmv", "__ka")
      .join(b.withColumnRenamed("kmv", "__kb"), groupCols)
    overlapFrom(joined, k, groupCols.map(col))
  }

  /** All-pairs overlap matrix from ONE frame's per-group sketches —
    * "which sources duplicate each other", the dedup-planning audit
    * run before deciding what to cross-dedup. One corpus pass builds
    * the per-group sketch; the groups×groups/2 pairing happens on the
    * k-hash sketch rows only (tiny — it broadcasts), never on data.
    * Output one row per unordered pair with the same estimate columns
    * as [[kmvOverlap]], keyed `left_<group>` / `right_<group>`.
    */
  def kmvOverlapMatrix(
      df: DataFrame,
      groupCol: String,
      valueCol: Column,
      k: Int,
      hasher: (Column, Column) => Column = h64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val sk = kmvSketch(df, Seq(groupCol), valueCol, k, hasher)
    val lg = s"left_$groupCol"
    val rg = s"right_$groupCol"
    val pairs = sk.select(col(groupCol).as(lg), col("kmv").as("__ka"))
      .join(broadcast(sk.select(col(groupCol).as(rg), col("kmv").as("__kb"))),
        col(lg) < col(rg))
    overlapFrom(pairs, k, Seq(col(lg), col(rg)))
  }

  /** Shared overlap-estimate algebra over two k-min sketch array
    * columns `__ka`/`__kb` (see [[kmvOverlap]] for semantics). */
  private def overlapFrom(
      joined: DataFrame,
      k: Int,
      keyCols: Seq[Column]): DataFrame = {
    val domain = math.pow(2, 60)
    joined
      .withColumn("__u",
        slice(array_sort(array_union(col("__ka"), col("__kb"))), 1, k))
      .withColumn("n_union_kept", size(col("__u")).cast("long"))
      .withColumn("n_both",
        size(filter(col("__u"),
          x => array_contains(col("__ka"), x) && array_contains(col("__kb"), x)))
          .cast("long"))
      .withColumn("est_union",
        roundPinned(
          when(col("n_union_kept") < k, col("n_union_kept").cast("double"))
            .otherwise(lit((k - 1) * domain) / element_at(col("__u"), -1)),
          4))
      .withColumn("est_jaccard",
        roundPinned(col("n_both").cast("double") / col("n_union_kept"), 4))
      .withColumn("est_intersection",
        roundPinned(col("est_jaccard") * col("est_union"), 4))
      // Directional containment — the question dedup actually asks
      // ("what fraction of A is already inside B"): intersection
      // estimate over each side's own KMV cardinality estimate,
      // capped at 1 (independent estimators can disagree slightly).
      .withColumn("__ea",
        when(size(col("__ka")) < k, size(col("__ka")).cast("double"))
          .otherwise(lit((k - 1) * domain) / element_at(col("__ka"), -1)))
      .withColumn("__eb",
        when(size(col("__kb")) < k, size(col("__kb")).cast("double"))
          .otherwise(lit((k - 1) * domain) / element_at(col("__kb"), -1)))
      .withColumn("est_containment_left",
        roundPinned(least(col("est_intersection") / roundPinned(col("__ea"), 4), lit(1.0)), 4))
      .withColumn("est_containment_right",
        roundPinned(least(col("est_intersection") / roundPinned(col("__eb"), 4), lit(1.0)), 4))
      .select(keyCols ++ Seq(col("n_union_kept"), col("n_both"),
        col("est_union"), col("est_jaccard"), col("est_intersection"),
        col("est_containment_left"), col("est_containment_right")): _*)
  }

  /** CountMin sketch counter grid: `(row, bucket, cnt)` with `d`
    * hash rows × `w` buckets. Point estimates are
    * `min over rows of cnt[row][bucket_row(x)]` — always ≥ the true
    * count, within `εN` with probability depending on (d, w).
    */
  def countMinSketch(
      df: DataFrame,
      itemCol: Column,
      d: Int,
      w: Int,
      hasher: (Column, Column) => Column = h64): DataFrame =
    df.select(
        explode(array((0 until d).map(lit): _*)).as("row"),
        itemCol.as("__x"))
      .select(
        col("row"),
        pmod(hasher(concat(lit("cm"), col("row")), col("__x")), lit(w)).as("bucket"))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Heavy hitters: CountMin point-estimates for `candidates` (one
    * column named like `itemCol`'s alias `item`), top `k` by estimated
    * count (count desc, item asc — a total order). The candidate set
    * bounds driver-visible output; at corpus scale feed it a sample
    * or a prior round's survivors, never the full distinct domain.
    */
  def countMinTopK(
      df: DataFrame,
      itemCol: Column,
      candidates: DataFrame,
      k: Int,
      d: Int = 3,
      w: Int = 256,
      hasher: (Column, Column) => Column = h64): DataFrame = {
    val sketch = countMinSketch(df, itemCol, d, w, hasher)
    // LEFT join + coalesce(cnt, 0): a grid cell no input item hashed to
    // simply has count 0 — canonical CountMin estimates an absent
    // candidate as 0, it doesn't drop it (an inner join would, and
    // would also take the min over only the populated subset of a
    // candidate's d cells). The grid is at most d×w rows — broadcast.
    candidates
      .select(col("item"))
      .distinct()
      .select(
        col("item"),
        explode(array((0 until d).map(lit): _*)).as("row"))
      .withColumn(
        "bucket",
        pmod(hasher(concat(lit("cm"), col("row")), col("item")), lit(w)))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("item")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_count"))
      .orderBy(col("est_count").desc, col("item"))
      .limit(k)
  }

  /** Grouped quantiles at the given probabilities. `exact=true` uses
    * linear-interpolated `percentile` (oracle-reproducible, shuffles
    * group values); `exact=false` uses `approx_percentile`
    * (bounded-memory, estimate).
    */
  def quantiles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      probs: Seq[Double],
      exact: Boolean = true): DataFrame = {
    val qs = probs.zipWithIndex.map { case (p, i) =>
      val q =
        if (exact) percentile(valueCol, lit(p))
        else percentile_approx(valueCol, lit(p), lit(10000))
      roundPinned(q, 4).as(s"q_$i")
    }
    df.groupBy(groupCols.map(col): _*).agg(qs.head, qs.tail: _*)
  }

  /** Equi-depth segmentation: label every row by which side of the
    * dataset's own quantile cutpoints its value falls on —
    * `labels(i)` for `value ≤ q(probs(i))`, the last label above the
    * top cut. The data-driven complement to
    * [[Expectations.histogram]]'s fixed grid (user-value tiers, spam
    * score bands, any "top third by X" policy).
    *
    * Cutpoints round to 4 decimals BEFORE bucketing (the repo-wide
    * convention), so the segment boundary is the same literal value
    * in any engine. One aggregation computes all cutpoints; they ride
    * back as a broadcast 1-row frame — no second shuffle of the data,
    * rows stream past the cuts in one codegen'd projection.
    */
  def segmentByQuantiles(
      df: DataFrame,
      valueCol: Column,
      probs: Seq[Double],
      labels: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(probs.nonEmpty, "need at least one cutpoint")
    require(probs == probs.sorted && probs.distinct == probs,
      s"probs must be strictly increasing: $probs")
    require(labels.size == probs.size + 1,
      s"need ${probs.size + 1} labels for ${probs.size} cutpoints, got ${labels.size}")
    require(!df.columns.contains("segment"),
      "segmentByQuantiles appends output column segment; rename the existing")
    val cuts = quantiles(df, Seq.empty, valueCol, probs, exact)
    val seg = probs.indices.reverse.foldLeft(lit(labels.last): Column) {
      (acc, i) => when(valueCol <= col(s"q_$i"), lit(labels(i))).otherwise(acc)
    }
    df.crossJoin(broadcast(cuts))
      .withColumn("segment", seg)
      .drop(probs.indices.map(i => s"q_$i"): _*)
  }

  /** Grouped robust location/scale + outlier accounting: per group,
    * the median, the MAD (median absolute deviation — the robust
    * sigma: ~50% breakdown vs the mean/stddev's 0%), and how many
    * rows sit beyond `nSigmas` robust z-scores
    * (`|x − med| > nSigmas · 1.4826 · MAD`, the normal-consistent
    * scaling). The feature-QA staple in front of model training: a
    * fat-fingered unit change or a log-vs-linear mixup shifts the
    * outlier count violently while classical stddev just absorbs it.
    *
    * Two grouped exact-percentile passes (median, then MAD over the
    * deviations — the med must materialize before deviations exist),
    * each shuffling the group's values (the exact contract, same as
    * [[quantiles]]; bounded groups). Cutoffs round to 4 decimals
    * before comparing (the repo-wide convention) so the outlier
    * boundary is the same literal in any engine.
    *
    * @return (group cols..., n, med, mad, n_outliers)
    */
  def robustStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      nSigmas: Double = 3.5): DataFrame = {
    require(nSigmas > 0, s"nSigmas must be positive: $nSigmas")
    require(groupCols.nonEmpty, "robustStats needs at least one group column")
    val v = valueCol.cast("double")
    // + 0.0 after each round: a median in (-0.00005, 0) rounds to
    // +0.0 under Spark's HALF_UP but -0.0 under DuckDB's round — the
    // fold pins zero's sign on both engines (repo-wide convention).
    val meds = df.groupBy(groupCols.map(col): _*)
      .agg((roundPinned(percentile(v, lit(0.5)), 4)).as("med"))
    val mads = df.join(broadcast(meds), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        first(col("med")).as("med"),
        (roundPinned(percentile(abs(v - col("med")), lit(0.5)), 4)).as("mad"))
    df.join(broadcast(mads), groupCols)
      .withColumn("__cut", roundPinned(lit(nSigmas * 1.4826) * col("mad"), 4))
      .groupBy(groupCols.map(col): _*)
      .agg(
        first(col("n")).as("n"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"),
        sum(when(abs(v - col("med")) > col("__cut"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Winsorization: clip `valueCol` to its own per-group
    * [pLow, pHigh] exact quantiles — the standard heavy-tail taming
    * for features and reward/quality scores (clipping preserves row
    * count where trimming biases the sample). Quantile bounds round
    * to 4 decimals before clipping, so the clip boundary replays as
    * the same literal in any engine. One grouped percentile pass
    * (exact contract, bounded groups) + one broadcast-joined codegen'd
    * clip projection; the data streams once.
    */
  def winsorize(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      pLow: Double = 0.05,
      pHigh: Double = 0.95,
      outCol: String = "winsorized"): DataFrame = {
    require(pLow >= 0 && pHigh <= 1 && pLow < pHigh,
      s"need 0 <= pLow < pHigh <= 1: $pLow, $pHigh")
    require(!df.columns.contains(outCol),
      s"winsorize appends output column $outCol; rename the existing")
    require(groupCols.nonEmpty, "winsorize needs at least one group column")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(
        roundPinned(percentile(valueCol.cast("double"), lit(pLow)), 4).as("__ql"),
        roundPinned(percentile(valueCol.cast("double"), lit(pHigh)), 4).as("__qh"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(outCol,
        least(greatest(valueCol.cast("double"), col("__ql")), col("__qh")))
      .drop("__ql", "__qh")
  }

  // -------------------------------------------------------- HyperLogLog

  /** Published HLL bias constant α_m (Flajolet et al. 2007). Single
    * source for the op AND the oracle generator, so the two engines
    * embed the identical double. */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** HyperLogLog register sketch: `(group cols..., bucket, r, b)` —
    * one row per PRESENT bucket with the max leading-zero rank ρ of the
    * 60-bit hashes landing there. `bucket` is the hash's low `b`
    * bits; ρ = (leading zeros of the remaining W = 60−b bits within
    * that width) + 1, computed as `W + 1 − length(bin(w))` — the
    * binary-string length is the bit length in BOTH engines, so the
    * sketch replays bit-exactly (`bin(13) = "1101"` in Spark and
    * DuckDB alike). Absent buckets mean ρ = 0 and are NOT
    * materialized; [[hllEstimate]] accounts for them arithmetically.
    *
    * vs [[kmvSketch]]: HLL needs NO distinct pass (max ρ is
    * idempotent under duplicates) and its state is ≤ 2^b 2-int rows
    * per group regardless of cardinality — the cheaper shape when the
    * per-group value stream is huge and dirty. KMV keeps exact counts
    * below k and supports overlap estimation; HLL's standard error
    * (~1.04/√m) is fixed by `b`.
    *
    * 100 TB shape: one codegen'd hash projection, then ONE
    * map-side-combined max aggregation to ≤ groups × 2^b rows — no
    * distinct, no window, no explode beyond the caller's own
    * tokenization.
    */
  def hllSketch(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      b: Int = 6,
      hasher: (Column, Column) => Column = h64): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be in [4, 16]: $b")
    require(!groupCols.contains("b"),
      "hllSketch reserves output column name 'b' for the register width")
    val m = 1 << b
    val bigW = 60 - b
    val h = hasher(lit("hll"), valueCol)
    val w = shiftright(h, b)
    val rho = when(w === 0L, lit(bigW + 1))
      .otherwise(lit(bigW + 1) - length(bin(w)))
    df.select(
        groupCols.map(col) ++ Seq(
          pmod(h, lit(m.toLong)).cast("int").as("bucket"),
          rho.cast("int").as("__rho")): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("__rho")).as("r"))
      // The register-index width rides WITH the sketch: bucket ids and
      // ρ widths from different b are incompatible, and a merge or
      // estimate that mixed them would silently return garbage —
      // hllMerge/hllEstimate validate this column instead of trusting
      // the caller to re-supply the right parameter.
      .withColumn("b", lit(b))
  }

  /** Merge HLL sketch frames: per (group, bucket) the max ρ — exactly
    * the sketch one pass over the combined data would build, so daily
    * partials fold into the whole-corpus estimate without a rescan
    * (property-specced against the single-pass sketch).
    */
  def hllMerge(a: DataFrame, other: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(other)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      // Width agreement is checked per merged register (any register
      // both sides touch with different b raises here) and again —
      // globally per group — by hllEstimate's min/max-b guard, which
      // catches frames whose bucket sets don't collide.
      .agg(max(col("r")).as("r"),
        min(col("b")).as("__bmin"), max(col("b")).as("__bmax"))
      .withColumn("b",
        when(col("__bmin") === col("__bmax"), col("__bmin"))
          .otherwise(raise_error(format_string(
            "hllMerge: register width mismatch: sketches carry b in [%d, %d]",
            col("__bmin"), col("__bmax")))))
      .drop("__bmin", "__bmax")

  /** Distinct-count estimate from a register sketch: the standard
    * estimator `α_m·m²/Σ_j 2^(−ρ_j)` with linear counting
    * (`m·ln(m/V)`, V = zero registers) in the small range. The
    * register sum is computed in INTEGER space — each present bucket
    * contributes `2^(W+1−ρ)` (an exact long, ρ ≤ W+1), absent buckets
    * contribute `2^(W+1)` — so the only sum in the estimator is
    * order-free and the estimate replays bit-exactly; ln enters only
    * the small-range branch and the output is rounded to 4 decimals.
    * Output: group cols, `m_buckets`, `n_present`, `est_distinct`.
    */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String], b: Int): DataFrame = {
    require(b >= 4 && b <= 16, s"b must be in [4, 16]: $b")
    val m = 1 << b
    val bigW = 60 - b
    val unit = 1L << (bigW + 1) // 2^(W+1): the ρ=0 contribution
    val alpha = hllAlpha(m)
    val agg = sketch
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("int").as("n_present"),
        sum(expr(s"shiftright(CAST($unit AS BIGINT), r)")).as("__qsum"),
        // register-width audit: every row of the group must carry the
        // b this estimator was asked to decode — estimating a sketch
        // built with a different b yields silent garbage (bucket ids
        // and ρ widths disagree), so that is an ERROR, not a number.
        min(col("b")).as("__bmin"), max(col("b")).as("__bmax"))
    val s = (lit(m) - col("n_present")).cast("double") +
      col("__qsum").cast("double") / lit(unit.toDouble)
    val raw = lit(alpha) * lit(m) * lit(m) / s
    val v = lit(m) - col("n_present")
    val est = when(raw <= lit(2.5 * m) && v > 0,
      lit(m) * log(lit(m.toDouble) / v)).otherwise(raw)
    val bOk = col("__bmin") === lit(b) && col("__bmax") === lit(b)
    agg
      .withColumn("m_buckets", lit(m))
      // the guard lives INSIDE the output column so column pruning
      // can never optimize the validation away
      .withColumn("est_distinct",
        when(bOk, roundPinned(est, 4)).otherwise(raise_error(format_string(
          s"hllEstimate: asked to decode b=$b but sketch carries b in [%d, %d]",
          col("__bmin"), col("__bmax")))))
      .select(groupCols.map(col) ++ Seq(
        col("m_buckets"), col("n_present"), col("est_distinct")): _*)
  }

  // ------------------------------------------- log-histogram quantiles

  /** Mergeable HDR-style log-scale histogram — the QUANTILE sketch
    * beside [[hllSketch]] (distincts), [[kmvSketch]] (overlap) and
    * CMS (heavy hitters): per group, bounded bucket counts from which
    * any percentile reads back with ≤ 2^(−subBits) relative error.
    * The 100 TB swap for [[quantiles]]' exact contract: exact grouped
    * percentiles shuffle every value; this shuffles ≤ buckets ×
    * groups counts, merges across days/sources by ADDING counts, and
    * persists like any tiny frame.
    *
    * Binning is INTEGER-EXACT, no transcendental anywhere: the value
    * quantizes to `q = round(x·scale)` and the bucket is
    * `(m, sub)` where `m = bit_length(q)` — `length(bin(q))`, the
    * same cross-engine-exact trick as the HLL rank — and `sub` is the
    * next `subBits` bits below the leading one (values with
    * `m ≤ subBits + 1` are EXACT: the bucket is the value itself).
    * Both engines agree on every boundary bit-for-bit.
    *
    * Non-negative contract: NULLs and negatives are excluded
    * (lengths, latencies, sizes, scores — the columns histograms are
    * for); `n_dropped` in the companion audit is the caller's job via
    * a count diff if the data can go negative.
    *
    * @return (group cols..., m, sub, lb, n) — lb is the bucket's
    *         inclusive lower bound in ORIGINAL units (lb_q / scale)
    */
  def logHistogram(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      subBits: Int = 3,
      scale: Double = 1e6): DataFrame = {
    require(subBits >= 0 && subBits <= 16, s"subBits must be in [0, 16]: $subBits")
    require(scale > 0, s"scale must be positive: $scale")
    val reserved = Set("m", "sub", "lb", "n")
    require(groupCols.forall(!reserved.contains(_)),
      s"logHistogram reserves output columns ${reserved.mkString("/")}; rename the group column")
    logBucketed(df.select(
      groupCols.map(col) :+ quantized(valueCol, scale).as("__q"): _*), subBits)
      .withColumn("__lbq",
        when(col("m") <= subBits + 1, col("sub"))
          .otherwise(expr(
            s"shiftleft(CAST(1 AS BIGINT), m - 1) + shiftleft(sub, m - 1 - $subBits)")))
      .groupBy(groupCols.map(col) ++ Seq(col("m"), col("sub")): _*)
      .agg(first(col("__lbq")).as("__lbq"), count(lit(1)).as("n"))
      .withColumn("lb", col("__lbq").cast("double") / lit(scale))
      .drop("__lbq")
  }

  /** Quantize to integer `scale` units, NaN-safe: ANSI mode makes a
    * bare `cast(NaN as long)` an ERROR, so NaN degrades to NULL (and
    * is then excluded like any other undefined value).
    */
  private[ops] def quantized(valueCol: Column, scale: Double): Column = {
    val d = valueCol.cast("double")
    when(isnan(d), lit(null)).otherwise(roundPinned(d * lit(scale))).cast("long")
  }

  /** Shared bit-length binning: rows with a quantized `__q` column
    * gain `(m, sub)` (and lose NULL/negative rows) — the single
    * source for [[logHistogram]] and per-row bucket lookups
    * ([[Curriculum.phaseAssign]] joins rows back to the histogram on
    * exactly these columns).
    */
  private[ops] def logBucketed(withQ: DataFrame, subBits: Int): DataFrame = {
    val mask = (1L << subBits) - 1L
    withQ
      .filter(col("__q").isNotNull && col("__q") >= 0)
      .withColumn("m", length(bin(col("__q"))).cast("int"))
      .withColumn("sub",
        when(col("m") <= subBits + 1, col("__q"))
          .otherwise(expr(s"shiftright(__q, m - 1 - $subBits) & $mask")))
  }

  /** Quantile read-back from a [[logHistogram]] (or a count-summed
    * merge of several): for each requested q, the lower bound of the
    * first bucket whose cumulative count reaches `ceil(q · total)` —
    * deterministic, replayable, error bounded by the bucket width.
    * One bounded-size window pass per group.
    *
    * @return (group cols..., q, est) — est in original value units
    */
  def histQuantiles(
      hist: DataFrame,
      groupCols: Seq[String],
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(v => v > 0 && v <= 1),
      s"quantiles must be in (0, 1]: $qs")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("m"), col("sub"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__tot", sum(col("n")).over(tot))
    qs.map { p =>
      cum
        .filter(col("__cum") >= ceil(lit(p) * col("__tot").cast("double")))
        .groupBy(groupCols.map(col): _*)
        .agg(min_by(col("lb"), struct(col("m"), col("sub"))).as("est"))
        .withColumn("q", lit(p))
        .select(groupCols.map(col) ++ Seq(col("q"), col("est")): _*)
    }.reduce(_ unionByName _)
  }

  /** One-call sketch + estimate. */
  def hllDistinct(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      b: Int = 6,
      hasher: (Column, Column) => Column = h64): DataFrame =
    hllEstimate(hllSketch(df, groupCols, valueCol, b, hasher), groupCols, b)
}
