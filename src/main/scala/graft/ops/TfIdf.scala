package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis.tokens
import graft.functions.GraftFunctions.roundPinned

/** Corpus-level term statistics: TF-IDF keyword extraction and
  * unigram-language-model surprisal scoring — the corpus-statistics
  * complement to [[TextAnalysis]]'s per-document signals (a
  * training-data pipeline uses these for keyword indexing and for
  * "looks like nothing else in the corpus" quality cuts).
  *
  * 100 TB design notes: corpus aggregates (document frequencies,
  * unigram counts) are map-side-combined `groupBy` aggregations whose
  * result is vocabulary-sized, not corpus-sized; they re-join to
  * per-document rows BY TERM — a broadcast when the vocabulary is
  * small, one hash shuffle when it isn't — and the scalar corpus
  * totals ride along as a 1-row cross join (Catalyst broadcasts it),
  * never a driver `collect`. Per-doc top-k uses a rank-filter window,
  * which Spark rewrites to WindowGroupLimit (partial top-k before the
  * shuffle).
  */
object TfIdf {

  /** (id, term) exploded token rows behind a keyed pre-explode
    * repartition with an EXPLICIT partition count: from a single-file
    * (or few-split) source, AQE coalesces the bytes-small pre-explode
    * exchange to one partition — it can't see the fanout — and the
    * whole tokenization serializes (measured 25.3s → 4.5s on a
    * 50k-doc 10× stress corpus). The keyed exchange also
    * pre-satisfies every downstream per-id aggregation and window.
    */
  private def tokenRows(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("term"))

  /** (term, df) document frequencies: number of docs containing each
    * term. One explode + distinct + count — vocabulary-sized output.
    */
  def docFrequencies(df: DataFrame, textCol: String, idCol: String): DataFrame =
    tokenRows(df, textCol, idCol)
      .distinct()
      .groupBy("term")
      .agg(count(lit(1)).as("df"))

  /** Inverted-index build — the search-side artifact of a curated
    * corpus: one row per term with exact document frequency, total
    * term frequency, and a BOUNDED posting list (the `maxPostings`
    * lowest doc ids containing the term, ascending, comma-joined).
    *
    * The bound is the 100 TB design point: a stopword's full posting
    * list is corpus-sized, so an unbounded `collect_list` per term is
    * a driver-OOM-by-another-name. Postings prune through a
    * rank-filter window (Spark rewrites it to WindowGroupLimit: each
    * map task keeps `maxPostings` rows per term BEFORE the shuffle),
    * so the term exchange moves O(vocabulary × maxPostings) rows at
    * any corpus size, while df/tf_total aggregate exactly over
    * everything with map-side partials. The per-(doc, term) frame
    * feeds both branches and reuses the pre-explode id partitioning —
    * its groupBy adds no exchange.
    *
    * Output: (term, df, tf_total, postings).
    */
  def invertedIndex(
      df: DataFrame,
      textCol: String,
      idCol: String,
      maxPostings: Int): DataFrame = {
    require(maxPostings >= 1, "maxPostings must be >= 1")
    val perDoc = graft.CachedFrames.persistOnce(
      tokenRows(df, textCol, idCol)
        .groupBy(col(idCol), col("term"))
        .agg(count(lit(1)).as("__tf")))
    val stats = perDoc.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("__tf").as("tf_total"))
    val w = Window.partitionBy("term").orderBy(col(idCol))
    val postings = perDoc
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= maxPostings)
      .groupBy("term")
      .agg(array_join(
        transform(array_sort(collect_list(col(idCol))), _.cast("string")),
        ",").as("postings"))
    stats.join(postings, Seq("term"))
  }

  /** Per-document top-`topK` terms by smoothed TF-IDF:
    * `tf · (ln((N+1)/(df+1)) + 1)`, tf = term count / doc length.
    * Scores are rounded to 4 decimals BEFORE ranking (ties then break
    * on the term string) so rankings are reproducible across engines —
    * `ln` is not exactly rounded in every math library, and an
    * ulp-level difference must not reorder the cut.
    *
    * Output: (id, term, tfidf, rk), rk in 1..topK.
    */
  def topTerms(df: DataFrame, textCol: String, idCol: String, topK: Int): DataFrame = {
    val tok = tokenRows(df, textCol, idCol)
    val nDocs = df.select(countDistinct(col(idCol)).as("__n"))
    val dfreq = docFrequencies(df, textCol, idCol)
    val tc = tok.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__c"))
    val dl = tok.groupBy(col(idCol)).agg(count(lit(1)).as("__len"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    tc.join(dl, Seq(idCol))
      .join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn(
        "tfidf",
        roundPinned(
          (col("__c").cast("double") / col("__len")) *
            (log((col("__n").cast("double") + 1) / (col("df") + 1)) + 1),
          4))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col(idCol), col("term"), col("tfidf"), col("rk"))
  }

  /** DSIR-style importance weights for data selection (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * per-document mean log-ratio of token likelihood under a TARGET
    * unigram model vs the SOURCE (corpus) model, add-1 smoothed over
    * the union vocabulary:
    *
    *   avg over tokens t of
    *     ln((target_count(t)+1)/(target_total+V))
    *   - ln((corpus_count(t)+1)/(corpus_total+V))
    *
    * Higher = more target-like; rank/filter on `avg_logratio` to
    * select corpus documents that resemble the target domain. Output:
    * (idCol, avg_logratio, n_tokens), rounded to 4 decimals so the
    * ranking is reproducible across engines.
    *
    * 100 TB shape: both models are vocabulary-sized map-side-combined
    * aggregations; the corpus token stream joins them BY TERM (hash
    * join on a vocabulary-sized build side — Catalyst/AQE broadcasts
    * when it fits); the three scalar statistics (two totals + union
    * vocabulary size) ride along as an explicitly-broadcast 1-row
    * frame. The target corpus is small by construction (a curated
    * domain sample), so its model never dominates; the corpus is
    * streamed exactly once past the per-doc aggregation.
    */
  def importanceWeights(
      corpus: DataFrame,
      target: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val tok = tokenRows(corpus, textCol, idCol)
    val ttok = target.select(explode(tokens(col(textCol))).as("term"))
    // Both models cache: each feeds its term-join AND the scalar
    // totals below, and without the persist every consumer re-scans
    // the corpus through the explode (vocabulary-sized frames — cheap
    // to hold, released by the caller's CachedFrames.unpersistAll()).
    val corpusCounts = graft.CachedFrames.persistOnce(
      tok.groupBy("term").agg(count(lit(1)).as("__cc")))
    val targetCounts = graft.CachedFrames.persistOnce(
      ttok.groupBy("term").agg(count(lit(1)).as("__tc")))
    // One broadcast 1-row frame with every scalar the score needs —
    // all three derive from the CACHED vocabulary-sized models (totals
    // are the sums of the counts), so no extra corpus scan.
    val scalars =
      corpusCounts.agg(coalesce(sum("__cc"), lit(0L)).as("__ct"))
        .crossJoin(targetCounts.agg(coalesce(sum("__tc"), lit(0L)).as("__tt")))
        .crossJoin(
          corpusCounts.select("term").union(targetCounts.select("term"))
            .distinct().select(count(lit(1)).as("__v")))
    tok
      .join(corpusCounts, Seq("term"))
      .join(targetCounts, Seq("term"), "left")
      .crossJoin(broadcast(scalars))
      .groupBy(col(idCol))
      .agg(
        roundPinned(avg(
          log((coalesce(col("__tc"), lit(0L)).cast("double") + 1) /
            (col("__tt") + col("__v"))) -
          log((col("__cc").cast("double") + 1) / (col("__ct") + col("__v")))
        ), 4).as("avg_logratio"),
        count(lit(1)).as("n_tokens"))
  }

  /** Per-document mean unigram log-probability under the corpus's own
    * unigram model: `avg over tokens of ln(count(term) / total)`.
    * More negative = more surprising relative to the corpus; a cheap
    * outlier/garbage signal that needs no external model.
    */
  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = tokenRows(df, textCol, idCol)
    val counts = tok.groupBy("term").agg(count(lit(1)).as("__tc"))
    val total = tok.select(count(lit(1)).as("__total"))
    tok
      .join(counts, Seq("term"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(
        roundPinned(avg(log(col("__tc").cast("double") / col("__total"))), 4)
          .as("avg_logprob"),
        count(lit(1)).as("n_tokens"))
  }

  /** Shared per-term frame of [[tokenJsDivergence]] /
    * [[divergingTerms]]: the two corpora's unigram distributions
    * full-outer-joined on term, with each term's Jensen–Shannon
    * contribution (nats) QUANTIZED to a 1e-9 fixed-point long — the
    * [[graft.ops.Curation.calibration]] exactness trick: from here
    * every aggregate is an exact integer sum, so the divergence total
    * is ORDER-EXACT cross-engine despite the `ln` terms. Totals ride
    * one broadcast 1-row frame (derived from the vocabulary-sized
    * count frames, not a second corpus scan); 0·ln(0/m) is 0 by the
    * `pa > 0` guards, and m > 0 always (a joined term appears in at
    * least one side).
    */
  private def jsTermFrame(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    val ca = tokenRows(a, textCol, idCol).groupBy("term").agg(count(lit(1)).as("__ca"))
    val cb = tokenRows(b, textCol, idCol).groupBy("term").agg(count(lit(1)).as("__cb"))
    val totals = ca.agg(coalesce(sum("__ca"), lit(0L)).cast("double").as("__na"))
      .crossJoin(cb.agg(coalesce(sum("__cb"), lit(0L)).cast("double").as("__nb")))
    // try_divide: an EMPTY side has total 0, and under ANSI a plain
    // division throws even inside the un-taken when() branch (m
    // references both sides). NULL propagates through the term math
    // instead, and the callers surface the degenerate case as a NULL
    // divergence rather than a crash or a silent 0.
    val pa = try_divide(col("__ca").cast("double"), col("__na"))
    val pb = try_divide(col("__cb").cast("double"), col("__nb"))
    val m = (pa + pb) / 2.0
    val contribNats = lit(0.5) *
      (when(col("__ca") > 0, pa * log(pa / m)).otherwise(lit(0.0)) +
        when(col("__cb") > 0, pb * log(pb / m)).otherwise(lit(0.0)))
    ca.join(cb, Seq("term"), "full_outer")
      .select(
        col("term"),
        coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
      .crossJoin(broadcast(totals))
      .withColumn("__cq", roundPinned(contribNats * 1e9).cast("long"))
  }

  /** Jensen–Shannon divergence between two corpora's unigram token
    * distributions — the distribution-shift audit of a training MIX
    * (is this source's language like the rest of the blend? did this
    * month's crawl drift from last month's?). JS = ½KL(p‖m) + ½KL(q‖m)
    * with m = (p+q)/2: symmetric, finite on disjoint supports
    * (unlike KL), and in [0, 1] in bits — 0 = identical distributions,
    * 1 = disjoint vocabularies. The feature-level sibling of
    * [[graft.ops.Expectations.psiReport]], over the open token
    * vocabulary instead of fixed numeric bins.
    *
    * Scale shape: two map-side-combined vocabulary-sized count
    * aggregates, one vocabulary-sized full-outer join, totals on a
    * broadcast 1-row frame — the corpus streams once per side and
    * nothing downstream exceeds vocabulary size. Exactness: per-term
    * contributions quantize to 1e-9 fixed-point longs before the sum
    * (see [[jsTermFrame]]), so the total replays bit-for-bit in any
    * engine with `ln`.
    *
    * Output: one row — (n_terms union vocabulary, total_a, total_b,
    * js_bits). An empty side makes the divergence undefined (its
    * distribution doesn't exist): js_bits degrades to NULL, never a
    * silent 0 — the [[graft.ops.Curation.binaryEval]] degeneracy
    * convention.
    */
  def tokenJsDivergence(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      idCol: String): DataFrame =
    jsTermFrame(a, b, textCol, idCol)
      .agg(
        count(lit(1)).as("n_terms"),
        coalesce(sum("__ca"), lit(0L)).as("total_a"),
        coalesce(sum("__cb"), lit(0L)).as("total_b"),
        coalesce(sum("__cq"), lit(0L)).as("__jsq"))
      .select(
        col("n_terms"), col("total_a"), col("total_b"),
        when(col("total_a") > 0 && col("total_b") > 0,
          roundPinned(col("__jsq") / 1e9 / lit(Ln2), 6)).as("js_bits"))

  /** The term-level drill-down of [[tokenJsDivergence]]: the k terms
    * contributing MOST to the divergence (count on each side +
    * contribution in bits), descending with a deterministic term
    * tie-break — the table an operator reads to see WHAT shifted
    * (a new domain's jargon, a spam token, a template artifact).
    * Prunes via TakeOrderedAndProject: each partition retains k rows,
    * no global sort at any vocabulary size.
    */
  def divergingTerms(
      a: DataFrame,
      b: DataFrame,
      textCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    jsTermFrame(a, b, textCol, idCol)
      .select(
        col("term"),
        col("__ca").as("count_a"),
        col("__cb").as("count_b"),
        roundPinned(col("__cq") / 1e9 / lit(Ln2), 9).as("contrib_bits"))
      .orderBy(col("contrib_bits").desc, col("term"))
      .limit(k)
  }

  /** ln 2 as the exact double literal, embedded (rather than computed)
    * so the Spark plan and the DuckDB oracle divide by bit-identical
    * constants.
    */
  private val Ln2: Double = 0.6931471805599453

  /** (id, w1, bigram) adjacent-token pair rows, built INSIDE the row
    * by a `transform` over the token array (no positional self-join:
    * pairing by explode + join on (id, pos+1) would shuffle the
    * corpus twice and rebuild what adjacency already gives us for
    * free). Same keyed pre-explode repartition as [[tokenRows]], same
    * AQE-fanout rationale. Docs with fewer than two tokens produce no
    * rows.
    */
  private def bigramRows(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(expr(
        """transform(
          |  slice(__toks, 1, greatest(size(__toks) - 1, 0)),
          |  (x, i) -> struct(
          |    x AS w1,
          |    element_at(__toks, i + 2) AS w2,
          |    concat(x, ' ', element_at(__toks, i + 2)) AS bigram))"""
          .stripMargin)).as("__b"))
      .select(col(idCol), col("__b.w1"), col("__b.w2"), col("__b.bigram"))

  /** Per-document mean bigram log-probability under the corpus's own
    * bigram model: `avg over adjacent pairs of ln(c(w1 w2) / c(w1 ·))`
    * — the CCNet-class language-model perplexity filter (more negative
    * = less like fluent corpus text), one modeling order above
    * [[unigramLogProb]] and a far sharper garbage/boilerplate signal
    * (token salads have plausible unigrams but improbable bigrams).
    * Self-scored, so every document bigram exists in the model and no
    * smoothing is needed; conditionals are exact count ratios,
    * engine-replayable. Docs with fewer than two tokens emit no row.
    *
    * Scale shape: pair construction is a per-row projection; both
    * model tables (bigram counts, prefix counts) are
    * vocabulary-of-pairs-sized map-side-combined aggregates that
    * re-join BY KEY — the corpus pair stream is never shuffled except
    * for those model joins, and the final per-doc agg reuses the
    * pre-explode id partitioning.
    */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val bg = bigramRows(df, textCol, idCol)
    // One model aggregation keyed by (w1, bigram); the prefix marginal
    // c(w1·) is the SUM of pair counts per w1 — derived from the
    // CACHED pair-vocabulary-sized model, so the corpus pair stream is
    // aggregated once, not twice (released by the caller's
    // CachedFrames.unpersistAll()).
    val pairCounts = graft.CachedFrames.persistOnce(
      bg.groupBy("w1", "bigram").agg(count(lit(1)).as("__c2")))
    val prefixCounts = pairCounts.groupBy("w1").agg(sum("__c2").as("__c1"))
    bg
      .join(pairCounts.drop("w1"), Seq("bigram"))
      .join(prefixCounts, Seq("w1"))
      .groupBy(col(idCol))
      .agg(
        roundPinned(avg(log(col("__c2").cast("double") / col("__c1"))), 4)
          .as("avg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Per-document mean bigram log-probability under an interpolated
    * KNESER-NEY model (Kneser & Ney, ICASSP 1995; the Chen–Goodman
    * 1998 formulation with one fixed discount) — the serious form of
    * the [[bigramLogProb]] perplexity filter:
    *
    *   P(w2|w1) = (max(c(w1 w2) − D, 0) + D·N1+(w1·)·P_cont(w2)) / c(w1·)
    *   P_cont(w2) = N1+(·w2) / N1+(··)
    *
    * where N1+(w1·)/N1+(·w2) count DISTINCT continuations/contexts
    * and N1+(··) the distinct bigram types. The continuation
    * distribution is KN's insight: "francisco" is frequent but
    * follows almost nothing except "san", so its reserved mass is
    * tiny where a raw-unigram backoff would inflate it. Per context
    * the model is exactly normalized (Σ over the vocabulary = 1 —
    * spec-pinned), unlike add-k. Self-scored (every scored bigram is
    * in the model), so the discounting never hits a zero count; the
    * interpolation still separates formulaic high-count adjacency
    * from one-off co-occurrence, which is what the filter ranks by.
    *
    * Scale shape, same contract as [[bigramLogProb]]: pair
    * construction is a per-row projection; ONE cached
    * pair-types-sized aggregate feeds all four model tables (pair
    * counts, prefix marginals + distinct-continuation counts,
    * distinct-context counts, the scalar type total riding a
    * broadcast 1-row frame); scoring re-joins the corpus pair stream
    * BY KEY.
    */
  def kneserNeyLogProb(
      df: DataFrame,
      textCol: String,
      idCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1): $discount")
    val bg = bigramRows(df, textCol, idCol)
    val pairCounts = graft.CachedFrames.persistOnce(
      bg.groupBy("w1", "w2", "bigram").agg(count(lit(1)).as("__c2")))
    val prefix = pairCounts.groupBy("w1")
      .agg(sum("__c2").as("__c1"), count(lit(1)).as("__n1f"))
    val continuation = pairCounts.groupBy("w2").agg(count(lit(1)).as("__n1r"))
    val types = broadcast(pairCounts.agg(count(lit(1)).as("__t")))
    val p = (greatest(col("__c2").cast("double") - lit(discount), lit(0.0)) +
      lit(discount) * col("__n1f").cast("double") *
        (col("__n1r").cast("double") / col("__t").cast("double"))) /
      col("__c1").cast("double")
    bg
      .join(pairCounts.select("bigram", "__c2"), Seq("bigram"))
      .join(prefix, Seq("w1"))
      .join(continuation, Seq("w2"))
      .crossJoin(types)
      .groupBy(col(idCol))
      .agg(
        roundPinned(avg(log(p)), 4).as("avg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  // ----------------------------------------------------------------- BM25

  /** BM25 full-text retrieval: for each query string, the top-`k`
    * corpus documents by Okapi BM25 with the Lucene non-negative idf:
    *
    *   score(q, d) = Σ_{t ∈ q ∩ d}
    *     ln(1 + (N − df(t) + 0.5)/(df(t) + 0.5)) ·
    *     tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * The retrieval closure of [[invertedIndex]] — the corpus a
    * pipeline curates is also the corpus its eval/RAG stack searches.
    *
    * 100 TB shape: the per-(doc, term) tf frame streams from ONE
    * corpus pass (cached — doc lengths are its per-doc rollup, so the
    * corpus never tokenizes twice); the query-term set broadcasts
    * (queries are human-scale by definition), so only matching (doc,
    * term) rows survive the semi-structure before any shuffle; df
    * joins by term (vocabulary-sized build side); the two scalar
    * corpus stats (N, avgdl) ride as an explicitly-broadcast 1-row
    * frame. The per-query top-k is a rank-filter window → Spark's
    * WindowGroupLimit prunes map-side before the qid exchange.
    *
    * Scores round to 4 decimals BEFORE ranking (ties break on doc id)
    * so an ulp-level `ln` difference can never reorder the cut across
    * engines — the [[topTerms]] determinism contract.
    *
    * Output: (qid, rank, doc, n_terms, score_r), rank 1..k.
    */
  def bm25Search(
      corpus: DataFrame,
      queries: DataFrame,
      textCol: String,
      idCol: String,
      queryIdCol: String,
      queryTextCol: String,
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(k1 >= 0 && b >= 0 && b <= 1, s"bad BM25 params: k1=$k1, b=$b")
    val perDoc = graft.CachedFrames.persistOnce(
      tokenRows(corpus, textCol, idCol)
        .groupBy(col(idCol), col("term"))
        .agg(count(lit(1)).as("__tf")))
    val dl = perDoc.groupBy(col(idCol)).agg(sum("__tf").as("__dl"))
    val dfreq = perDoc.groupBy("term").agg(count(lit(1)).as("__df"))
    val scalars = dl.agg(
      count(lit(1)).cast("double").as("__n"),
      avg(col("__dl").cast("double")).as("__avgdl"))
    val qTerms = queries
      .select(
        col(queryIdCol).as("qid"),
        explode(tokens(col(queryTextCol))).as("term"))
      .distinct()
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + 0.5) / (col("__df") + 0.5))
    val tfNorm = (col("__tf") * (k1 + 1)) /
      (col("__tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("__dl") / col("__avgdl")))
    val w = Window.partitionBy("qid")
      .orderBy(col("score_r").desc, col(idCol))
    perDoc
      .join(broadcast(qTerms), Seq("term"))
      .join(dfreq, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(scalars))
      .groupBy(col("qid"), col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        roundPinned(sum(idf * tfNorm), 4).as("score_r"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col(idCol).as("doc"),
        col("n_terms"), col("score_r"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
    * hybrid-retrieval combiner: given N per-query rankings (each
    * `(qid, doc, rank)` with rank 1-based), score every candidate
    * `Σ_lists 1/(k0 + rank)` and re-rank. Rank-based fusion needs no
    * score calibration between lists, which is exactly why it's the
    * default for fusing lexical (BM25) with vector (cosine) retrieval
    * — their score scales are incomparable but their RANKS are not.
    * `k0 = 60` is the published default; `n_lists` reports how many
    * input rankings surfaced each candidate (agreement signal).
    *
    * Inputs are already top-k-bounded per query (queries × k rows
    * each), so the union + groupBy + rank window all operate on
    * retrieval-sized data regardless of corpus size — fusion adds no
    * corpus-scale work whatsoever. Scores round to 6 decimals before
    * ranking (sums of exact 1/(k0+r) rationals; ties break on doc).
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(topK >= 1, s"topK must be >= 1: $topK")
    require(k0 >= 1, s"k0 must be >= 1: $k0")
    val u = rankings
      .map(_.select(col("qid"), col("doc"), col("rank")))
      .reduce(_ unionByName _)
    val w = Window.partitionBy("qid").orderBy(col("rrf_r").desc, col("doc"))
    u.groupBy("qid", "doc")
      .agg(
        count(lit(1)).as("n_lists"),
        roundPinned(sum(lit(1.0) / (lit(k0) + col("rank"))), 6).as("rrf_r"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("rank"), col("doc"), col("n_lists"), col("rrf_r"))
  }

  // ------------------------------------------------- log-odds classifier

  /** Train a token log-odds quality classifier from a labeled POSITIVE
    * corpus (curated/high-quality exemplars) and a NEGATIVE corpus
    * (raw crawl) — the classic "looks like the reference corpus"
    * quality filter, as a Bernoulli model over token PRESENCE:
    *
    *   weight(t) = ln((df_pos(t)+α)/(N_pos+2α))
    *             − ln((df_neg(t)+α)/(N_neg+2α))
    *
    * Positive weight = evidence for the positive class. Add-α
    * smoothing keeps one-sided terms finite; the model is the
    * vocabulary-union frame (term, df_pos, df_neg, weight) — two
    * map-side-combined doc-frequency passes and one vocabulary-sized
    * full-outer join, with the two corpus sizes riding as a broadcast
    * 1-row frame. Weights are stored UNROUNDED; [[scoreTokenLogOdds]]
    * rounds once at the end (rounding per-term would compound).
    */
  def trainTokenLogOdds(
      pos: DataFrame,
      neg: DataFrame,
      textCol: String,
      idCol: String,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val dfPos = docFrequencies(pos, textCol, idCol)
      .withColumnRenamed("df", "df_pos")
    val dfNeg = docFrequencies(neg, textCol, idCol)
      .withColumnRenamed("df", "df_neg")
    val sizes = pos.select(countDistinct(col(idCol)).as("__np"))
      .crossJoin(neg.select(countDistinct(col(idCol)).as("__nn")))
    dfPos.join(dfNeg, Seq("term"), "full_outer")
      .na.fill(0L, Seq("df_pos", "df_neg"))
      .crossJoin(broadcast(sizes))
      .select(
        col("term"), col("df_pos"), col("df_neg"),
        (log((col("df_pos") + alpha) / (col("__np") + 2 * alpha)) -
          log((col("df_neg") + alpha) / (col("__nn") + 2 * alpha))).as("weight"))
  }

  /** Score documents under a [[trainTokenLogOdds]] model: per doc, the
    * sum of weights of its DISTINCT matched terms plus `prior` (the
    * class log-prior; 0 = balanced). Terms outside the training
    * vocabulary contribute 0 — with balanced corpora the two smoothed
    * "unseen" likelihoods nearly cancel, and dropping them keeps the
    * score a pure function of the model frame. `is_positive` is the
    * `score > 0` decision a quality gate filters on.
    *
    * One corpus tokenization pass; the model joins by term (broadcast
    * when the vocabulary fits — it is vocabulary-sized, not
    * corpus-sized). Output: (id, n_terms, n_matched, score_r,
    * is_positive), score rounded to 4 decimals.
    */
  def scoreTokenLogOdds(
      df: DataFrame,
      model: DataFrame,
      textCol: String,
      idCol: String,
      prior: Double = 0.0): DataFrame =
    tokenRows(df, textCol, idCol)
      .distinct()
      .join(model.select(col("term"), col("weight")), Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        count(col("weight")).as("n_matched"),
        roundPinned(sum(coalesce(col("weight"), lit(0.0))) + prior, 4).as("score_r"))
      .withColumn("is_positive", col("score_r") > 0)

  /** Fused train+score for the dominant quality-gate shape, where the
    * positive and negative training corpora PARTITION the scored
    * corpus itself (`isPos` rows vs the rest — e.g. lang == "en"
    * exemplars against everything else). Result-identical to
    * `scoreTokenLogOdds(df, trainTokenLogOdds(df.filter(isPos),
    * df.filter(!isPos), …), …)` — same document frequencies, same
    * smoothing, same rounding; `n_matched == n_terms` because the
    * training vocabulary IS the corpus vocabulary under the partition
    * contract. A NULL `isPos` counts as negative (mirror of the
    * generic call, where such rows land in the `neg` frame).
    *
    * The win is pass count, which is what dominates at corpus scale:
    * the generic composition tokenizes the corpus THREE times (df_pos,
    * df_neg, score) plus two class-size scans; this path tokenizes
    * ONCE into a persisted distinct (id, class, term) frame and
    * derives both document frequencies, both class sizes, and the
    * per-doc score from it (MiningScaleProbe records the measured
    * before/after — the VERDICT r14 #4 logOddsClassifier outlier).
    */
  def classifyTokenLogOddsPartitioned(
      df: DataFrame,
      isPos: Column,
      textCol: String,
      idCol: String,
      alpha: Double = 1.0,
      prior: Double = 0.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")
    val flagged = df.select(
      col(idCol),
      coalesce(isPos.cast("boolean"), lit(false)).as("__pos"),
      col(textCol))
    val tok = graft.CachedFrames.persistOnce(
      flagged
        .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
        .select(col(idCol), col("__pos"), explode(tokens(col(textCol))).as("term"))
        .distinct())
    // class sizes from the raw frame, not the token rows: a zero-token
    // doc still counts toward its class size, exactly as the generic
    // trainTokenLogOdds counts it
    val sizes = flagged.agg(
      countDistinct(when(col("__pos"), col(idCol))).as("__np"),
      countDistinct(when(!col("__pos"), col(idCol))).as("__nn"))
    val model = tok
      .groupBy("term")
      .agg(
        count(when(col("__pos"), lit(1))).as("df_pos"),
        count(when(!col("__pos"), lit(1))).as("df_neg"))
      .crossJoin(broadcast(sizes))
      .select(
        col("term"),
        (log((col("df_pos") + alpha) / (col("__np") + 2 * alpha)) -
          log((col("df_neg") + alpha) / (col("__nn") + 2 * alpha))).as("weight"))
    tok.join(model, Seq("term"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        count(col("weight")).as("n_matched"),
        roundPinned(sum(col("weight")) + prior, 4).as("score_r"))
      .withColumn("is_positive", col("score_r") > 0)
  }
}
