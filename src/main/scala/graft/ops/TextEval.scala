package graft.ops

import graft.functions.GraftFunctions.roundPinned
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reference-based text eval metrics — the BLEU/ROUGE half of the
  * eval stack beside the retrieval metrics ([[RetrievalEval]]) and the
  * classifier reports ([[ClassifierEval]]): given a candidate and a
  * reference text per row, score the n-gram overlap (Papineni et al.
  * 2002; Lin 2004) and the character edit distance. What a
  * generation/summarization/augmentation pipeline publishes per
  * example at eval time, and what a data pipeline runs to quantify
  * how much a transformation (truncation, masking, paraphrase,
  * OCR/decode round-trip) degraded its corpus.
  *
  * Scale shape — the textbook per-row implementation builds both
  * n-gram multisets in memory per example and intersects them
  * (O(len²) higher-order lambdas per row, no partial aggregation);
  * here grams EXPLODE to (id, n, gram, count) rows and the clipped
  * overlap `Σ min(count_cand, count_ref)` is one inner equi-join +
  * map-side-combined sum per (id, n) — the same bucketed shape as
  * every dedup/retrieval op in this repo, so a 100 TB eval set
  * streams: no per-row quadratic work, no skew (grams carry the id).
  *
  * Determinism: everything is INTEGER counts and rational divisions;
  * the only non-rational step is the BLEU geometric mean, composed as
  * nested `sqrt` (IEEE correctly-rounded in every engine — the repo's
  * pow/exp-free convention), and the brevity penalty is reported as
  * the raw `len_ratio` column instead of `exp(1−r)` (exp is the one
  * transcendental with cross-engine last-ulp risk; the ratio carries
  * the same information monotonically).
  */
object TextEval {

  /** Space-joined n-grams of a token array; documents shorter than n
    * contribute NO n-grams (empty array, not a padded fallback —
    * precision/recall denominators must count real grams only).
    */
  private[ops] def evalGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Per-row n-gram overlap metrics of `candCol` against `refCol`,
    * for n = 1..maxN: modified (clipped) precision `p<n>`, ROUGE-N
    * recall `r<n>` and F1 `f<n>` for n ≤ 2, smoothed BLEU
    * (`bleu_sqrt`, add-1-smoothed precisions composed by nested
    * sqrt — method-1 smoothing keeps short candidates finite), and
    * `len_ratio` (candidate/reference token length, the
    * brevity-penalty signal). Rows keep `idCol`; token counts ride as
    * `cand_tokens`/`ref_tokens`. All ratios rounded to 4.
    *
    * NULL candidate or reference texts are excluded (no defined
    * overlap), like every eval op here excludes undefined rows.
    *
    * `idCol` MUST be unique per row (ADVICE r21): gram extraction
    * orders a per-id window by token position, so duplicate ids give
    * tied positions — `lead()` then interleaves tokens from different
    * rows into nondeterministic cross-row grams. Every caller in this
    * repo passes a primary key; an aggregate-eval over repeated ids
    * should pre-concatenate or re-key first.
    */
  def ngramOverlap(
      df: DataFrame,
      idCol: String,
      candCol: Column,
      refCol: Column,
      maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1, 8]: $maxN")
    val reserved = Set("cand_tokens", "ref_tokens", "len_ratio", "bleu_sqrt") ++
      (1 to maxN).flatMap(n => Seq(s"p$n", s"r$n", s"f$n"))
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"ngramOverlap appends ${reserved.toSeq.sorted.mkString("/")}; " +
        s"rename: ${shadowing.mkString(", ")}")
    // Keyed pre-repartition before the ~(2·maxN)× gram fanout, the
    // [[Dedup.shinglesExploded]] convention: the scan's partitioning
    // (2 fat partitions at bench scale) otherwise caps the dominant
    // explode+count stage at scan parallelism (measured r21: the one
    // heavy stage ran in 2 tasks, 2.5 s of its 2.6 s execRun). The
    // shuffle moves the input once so the 8× fanout spreads over
    // every core; explicit count because AQE would coalesce the
    // bytes-small exchange right back.
    val base = df
      .filter(candCol.isNotNull && refCol.isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        TextAnalysis.tokens(candCol).as("__ct"),
        TextAnalysis.tokens(refCol).as("__rt"))

    // ONE tagged gram stream for BOTH sides, then a single
    // (id, n, gram) aggregation producing both counts (r21, guide
    // §2.4): the previous shape built a gram-count pipeline per side
    // and referenced each in TWO join branches (overlap + totals), so
    // the explode+count subtree executed four times and the plan
    // carried 22 Exchanges. The clipped overlap Σ min(c_cnt, r_cnt)
    // is preserved exactly — a gram absent from one side has that
    // count 0 and least() contributes 0, which is precisely what the
    // old INNER join on (id, n, gram) contributed for it; per-(id, n)
    // totals are the same sums the old per-side groupBys produced,
    // and an (id, n) present on only one side appears here with the
    // other side's counts at 0, matching the old full join + fill(0).
    // Grams are built RELATIONALLY (posexplode → per-doc lead() window
    // → concat_ws), the [[Dedup.shinglesExploded]] pattern, instead of
    // the array-lambda [[evalGrams]]: higher-order lambdas evaluate
    // INTERPRETED per element, and under 32 concurrent tasks the
    // allocation-heavy interpreted path measured 5-16× the CPU of the
    // same logical work (r21: 2.4 s of CPU at 2 tasks became 12.7 s
    // isolated / 39.5 s in-suite at 32 — wall followed). The window
    // runs on the id-partitioned exchange above, so no extra shuffle;
    // every expression here is codegen'd. Gram semantics are
    // identical: position i contributes the n-gram tokens[i..i+n-1]
    // exactly when the (n−1)-th lead exists — matching evalGrams'
    // "len ≥ n" slices (concat_ws would silently IGNORE null leads
    // and emit a truncated gram, hence the explicit isNotNull gate).
    def gramSide(toksCol: String, side: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(idCol).orderBy("__pos")
      val leads = base
        .select(col(idCol), posexplode(col(toksCol)).as(Seq("__pos", "__t0")))
        .select(col(idCol) +: col("__t0") +:
          (1 until maxN).map(j => lead(col("__t0"), j).over(w).as(s"__t$j")): _*)
      val gramStructs = array((1 to maxN).map { n =>
        val g = concat_ws(" ", (0 until n).map(j => col(s"__t$j")): _*)
        val gated = if (n == 1) g else when(col(s"__t${n - 1}").isNotNull, g)
        struct(lit(n).as("n"), gated.as("gram"))
      }: _*)
      leads
        .select(col(idCol), explode(gramStructs).as("__e"))
        .select(col(idCol), col("__e.n").as("n"), col("__e.gram").as("gram"),
          lit(side).as("__side"))
        .filter(col("gram").isNotNull)
    }

    val totals = gramSide("__ct", 0).unionByName(gramSide("__rt", 1))
      .groupBy(col(idCol), col("n"), col("gram"))
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("c_cnt"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("r_cnt"))
      .groupBy(col(idCol), col("n"))
      .agg(
        sum(least(col("c_cnt"), col("r_cnt"))).as("ov"),
        sum(col("c_cnt")).as("ct"),
        sum(col("r_cnt")).as("rt"))

    def per(n: Int, c: String) = max(when(col("n") === n, col(c))).as(s"__${c}_$n")
    val aggs = (1 to maxN).flatMap(n => Seq(per(n, "ov"), per(n, "ct"), per(n, "rt")))
    val wide = totals.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)

    def ratio(num: Column, den: Column): Column =
      when(den > 0, roundPinned(num.cast("double") / den.cast("double"), 4))
    def ovN(n: Int) = coalesce(col(s"__ov_$n"), lit(0L))
    def ctN(n: Int) = coalesce(col(s"__ct_$n"), lit(0L))
    def rtN(n: Int) = coalesce(col(s"__rt_$n"), lit(0L))
    // add-1 smoothed precision for the BLEU composite (never 0/0)
    def smooth(n: Int): Column =
      (ovN(n) + lit(1L)).cast("double") / (ctN(n) + lit(1L)).cast("double")
    val bleuCore = (1 to maxN).map(smooth).reduce(_ * _)
    // nested sqrt = the 2^k-th root; maxN is pinned to a power of two
    // for the composite (p1..p4 default) — other maxN still get
    // per-n columns, just no composite
    val bleu =
      if (maxN == 4) Some(roundPinned(sqrt(sqrt(bleuCore)), 4))
      else if (maxN == 2) Some(roundPinned(sqrt(bleuCore), 4))
      else if (maxN == 1) Some(roundPinned(bleuCore, 4))
      else None
    val f1 = (n: Int) => {
      val p = ovN(n).cast("double") / ctN(n).cast("double")
      val r = ovN(n).cast("double") / rtN(n).cast("double")
      when(ctN(n) > 0 && rtN(n) > 0 && ovN(n) > 0,
        roundPinned(lit(2.0) * p * r / (p + r), 4))
        .otherwise(when(ctN(n) > 0 && rtN(n) > 0, lit(0.0)))
    }
    val metricCols =
      (1 to maxN).map(n => ratio(ovN(n), ctN(n)).as(s"p$n")) ++
      (1 to math.min(2, maxN)).flatMap(n => Seq(
        ratio(ovN(n), rtN(n)).as(s"r$n"), f1(n).as(s"f$n"))) ++
      bleu.map(_.as("bleu_sqrt")).toSeq
    // the token counts ARE the unigram totals already pivoted into
    // `wide` — every token is one 1-gram and token arrays are never
    // empty — so deriving them here saves a third scan+tokenization
    // of the input and a whole join
    wide.select(col(idCol) +:
        ctN(1).as("cand_tokens") +: rtN(1).as("ref_tokens") +:
        roundPinned(ctN(1).cast("double") / rtN(1).cast("double"), 4)
          .as("len_ratio") +:
        metricCols: _*)
  }

  /** Character-level edit-distance eval between two text columns:
    * exact Levenshtein distance (Spark's codegen'd built-in; DuckDB
    * replays the identical DP) plus the normalized similarity
    * `1 − dist / max(len)` — the fuzzy-match score string
    * reconciliation and OCR/decode round-trip checks publish. NULLs
    * excluded. O(|a|·|b|) per row: cap the pair set upstream like any
    * quadratic screen (this scores PAIRS, it does not generate them).
    */
  def editSimilarity(
      df: DataFrame,
      idCols: Seq[String],
      a: Column,
      b: Column): DataFrame = {
    val reserved = Set("edit_dist", "edit_sim")
    val shadowing = df.columns.filter(reserved)
    require(shadowing.isEmpty,
      s"editSimilarity appends ${reserved.mkString("/")}; " +
        s"rename: ${shadowing.mkString(", ")}")
    df.filter(a.isNotNull && b.isNotNull)
      .select(idCols.map(col) :+
        levenshtein(a, b).cast("long").as("edit_dist") :+
        when(greatest(length(a), length(b)) > 0,
          roundPinned(lit(1.0) -
            levenshtein(a, b).cast("double") /
            greatest(length(a), length(b)).cast("double"), 4))
          .otherwise(lit(1.0)).as("edit_sim"): _*)
  }
}
