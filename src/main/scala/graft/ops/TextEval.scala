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
    val base = df
      .filter(candCol.isNotNull && refCol.isNotNull)
      .select(col(idCol),
        TextAnalysis.tokens(candCol).as("__ct"),
        TextAnalysis.tokens(refCol).as("__rt"))

    // one exploded gram frame per side spanning all n: (id, n, gram, cnt)
    def gramCounts(toksCol: String, as: String): DataFrame =
      base
        .select(col(idCol) +: (1 to maxN).map(n =>
          evalGrams(col(toksCol), n).as(s"__g$n")): _*)
        .select(col(idCol), explode(array((1 to maxN).map(n =>
          struct(lit(n).as("n"), col(s"__g$n").as("grams"))): _*)).as("__e"))
        .select(col(idCol), col("__e.n").as("n"),
          explode(col("__e.grams")).as("gram"))
        .groupBy(col(idCol), col("n"), col("gram"))
        .agg(count(lit(1)).as(as))

    val cand = gramCounts("__ct", "c_cnt")
    val ref = gramCounts("__rt", "r_cnt")
    // clip: grams absent from either side contribute zero overlap, so
    // INNER equi-join on (id, n, gram) — the frame never exceeds the
    // smaller side's distinct grams
    val overlap = cand.join(ref, Seq(idCol, "n", "gram"))
      .groupBy(col(idCol), col("n"))
      .agg(sum(least(col("c_cnt"), col("r_cnt"))).as("ov"))
    val totals = cand.groupBy(col(idCol), col("n"))
      .agg(sum(col("c_cnt")).as("ct"))
      .join(ref.groupBy(col(idCol), col("n")).agg(sum(col("r_cnt")).as("rt")),
        Seq(idCol, "n"), "full")
      .join(overlap, Seq(idCol, "n"), "left")
      .na.fill(0L, Seq("ov", "ct", "rt"))

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
