package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Text-analysis operators for LLM training-data pipelines: tokenize /
  * normalize, document statistics, quality scoring, stopword-profile
  * language identification, and a BPE-ish regex token counter.
  *
  * The reference (`/root/reference/yelp_etl/pipeline/clean.py`) stops
  * at string repair; these extend the engine toward corpus curation.
  * Everything here is a pure `Column` expression over Catalyst
  * built-ins — codegen'd, no UDFs, no shuffle — so each op costs one
  * map-side pass regardless of scale.
  *
  * Cross-engine hashing: [[h64]] is an md5-derived 60-bit hash that
  * DuckDB/any ANSI engine reproduces bit-for-bit
  * (`('0x' || substr(md5(seed || '|' || x), 1, 15))::BIGINT`), which is
  * what lets MinHash/SimHash results hash-match an external oracle.
  * For production throughput prefer [[fastH64]] (xxhash64, one
  * codegen'd call, no hex round-trip) — the dedup ops take the hasher
  * as a parameter.
  */
object TextAnalysis {

  /** Whitespace tokenization of lower-cased text. */
  def tokens(text: Column): Column = split(lower(text), " ", -1)

  /** Deterministic cross-engine 60-bit hash (md5 hex prefix → long).
    * 15 hex chars = 60 bits, always non-negative, fits a long.
    * Implemented as the fused [[graft.functions.Md5PrefixLongExpr]] —
    * bit-identical to `conv(substring(md5(..), 1, 15), 16, 10)` (the
    * DuckDB-reproducible formula) without the hex-string round trip.
    */
  def h64(seed: Column, x: Column): Column =
    graft.functions.Md5PrefixLongExpr.md5PrefixLong(
      concat(seed.cast("string"), lit("|"), x), 15)

  /** Composed built-in form of [[h64]] (equivalence-spec reference). */
  private[graft] def h64Composed(seed: Column, x: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit("|"), x)), 1, 15), 16, 10)
      .cast("long")

  /** Production-speed hasher (not oracle-reproducible): xxhash64. */
  def fastH64(seed: Column, x: Column): Column = xxhash64(seed, x)

  /** 28-bit cross-engine base hash (md5 hex[1..7] → long). MinHash
    * derives its k permutations from ONE base hash per shingle via
    * affine maps mod a prime (see [[graft.ops.Dedup.minhashA]]), so
    * the md5 cost is paid once per shingle, not once per (shingle,
    * seed). 28-bit base × 30-bit multiplier stays under 2^58 — no
    * overflow in either engine's 64-bit signed arithmetic.
    */
  def baseHash(x: Column): Column =
    graft.functions.Md5PrefixLongExpr.md5PrefixLong(x, 7)

  /** Composed built-in form of [[baseHash]] (equivalence-spec reference). */
  private[graft] def baseHashComposed(x: Column): Column =
    conv(substring(md5(x), 1, 7), 16, 10).cast("long")

  /** Production-speed base hash: xxhash64 folded to 28 bits. */
  def fastBaseHash(x: Column): Column =
    pmod(xxhash64(x), lit(1L << 28))

  /** Word n-gram shingles. Documents shorter than `n` tokens collapse
    * to a single whole-text shingle so every doc has ≥1 shingle (an
    * empty shingle set would make MinHash undefined).
    *
    * PERFORMANCE TRAP: this single-Column form embeds the full
    * `split(lower(text))` subtree inside the `transform` lambda, so
    * Catalyst re-evaluates the tokenization once per shingle element —
    * O(tokens²) work per document. Hot paths must tokenize in a
    * separate projection and call [[shinglesOfTokens]] on the
    * materialized attribute instead (see [[graft.ops.Dedup.signatures]]).
    */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), lower(text), n)

  /** [[shingles]] over an already-materialized token-array column.
    * `toks` and `lowered` should be plain attribute references (or
    * cheap expressions): inside the per-element lambda only `slice` on
    * the attribute runs, so tokenization happens once per row.
    */
  def shinglesOfTokens(toks: Column, lowered: Column, n: Int): Column =
    when(size(toks) < n, array(lowered))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Distinct-n corpus diversity report — the standard
    * generation/corpus diversity metric (distinct-1, distinct-2 of Li
    * et al. 2016): per group and n-gram order, the distinct-to-total
    * n-gram ratio. A template-stamped or mode-collapsed source shows a
    * cratered distinct-2 long before eyeballing finds it; the metric
    * is the cheap corpus-level screen in front of the per-document
    * repetition ops ([[graft.ops.Dedup.spanDuplication]] etc.).
    *
    * Documents shorter than n contribute no n-grams (the textbook
    * definition — no whole-text fallback here, unlike [[shingles]]
    * where an empty shingle set would break MinHash).
    *
    * Scale shape: ONE scan — every requested n rides one
    * `(n, gram)`-struct explode — into a map-side-combinable count +
    * a distinct aggregation per (group, n). The exact distinct is the
    * oracle-checkable form; at corpus scale swap the distinct count
    * for [[graft.ops.Sketches.hllDistinct]] over the same exploded
    * frame and keep the totals.
    *
    * @return (group cols..., n, total_ngrams, distinct_ngrams,
    *         distinct_ratio) — ratio NULL on zero totals
    */
  def ngramDiversity(
      df: DataFrame,
      textCol: String,
      groupCols: Seq[String],
      ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"ns must be >= 1: $ns")
    val toks = col("__toks")
    val gramsOf = (n: Int) =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => struct(lit(n).as("n"), concat_ws(" ", slice(toks, i, lit(n))).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
    val exploded = df
      .select(groupCols.map(col) :+ tokens(col(textCol)).as("__toks"): _*)
      .select(groupCols.map(col) :+
        explode(concat(ns.map(gramsOf): _*)).as("__e"): _*)
    exploded
      .groupBy(groupCols.map(col) :+ col("__e.n").as("n"): _*)
      .agg(
        count(lit(1)).as("total_ngrams"),
        count_distinct(col("__e.g")).as("distinct_ngrams"))
      .withColumn("distinct_ratio",
        roundPinned(try_divide(col("distinct_ngrams").cast("double"),
          col("total_ngrams")), 6))
  }

  /** BPE-ish token count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a cheap proxy for
    * subword tokenizer counts that needs no vocabulary.
    */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(bpeTokenPattern)).cast("long")

  /** Document statistics bundle (all derived from one pass over the
    * text column):
    * n_chars, n_tokens, n_types (distinct tokens), alpha_ratio,
    * avg_token_len, bpe_tokens.
    */
  def stats(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    val nChars = length(text).cast("long")
    val nTokens = size(t).cast("long")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    // Σ token lengths without the interpreted per-element `aggregate`
    // HOF (r22): tokens are split(lower(text), " ") — exactly
    // size(t) − 1 single-space separators — so the sum is
    // length(lower(text)) − (size(t) − 1), all codegen'd.
    val tokLenSum = (length(lower(text)) - size(t) + lit(1)).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "n_types" -> size(array_distinct(t)).cast("long"),
      "alpha_ratio" -> roundPinned(alpha / nChars.cast("double"), 4),
      "avg_token_len" -> roundPinned(tokLenSum.cast("double") / nTokens.cast("double"), 4),
      "bpe_tokens" -> bpeTokenCount(text))
  }

  /** Quality predicate over the [[stats]] columns — the standard
    * pre-training heuristics (length band + mostly-alphabetic + sane
    * token lengths). Composable `Column`, usable directly in
    * `df.filter`.
    */
  def qualityPredicate(
      nTokens: Column,
      alphaRatio: Column,
      avgTokenLen: Column): Column =
    nTokens >= 5 && nTokens <= 5000 &&
      alphaRatio >= 0.5 &&
      avgTokenLen >= 2.0 && avgTokenLen <= 20.0

  /** Character k-grams of an already-lowered text column. `lowered`
    * should be a materialized attribute: the per-element lambda then
    * runs one `substr` per gram instead of re-lowering the whole text
    * per gram (same re-evaluation trap as [[shingles]]).
    */
  def charGramsOfLowered(lowered: Column, k: Int): Column =
    when(length(lowered) < k, array(lowered))
      .otherwise(transform(
        sequence(lit(1), length(lowered) - (k - 1)),
        i => lowered.substr(i, lit(k))))

  /** Character k-grams of the lower-cased text (the winnowing input
    * unit — robust to word-boundary edits, unlike word shingles).
    * Hot paths should lower in a separate projection and call
    * [[charGramsOfLowered]].
    */
  def charGrams(text: Column, k: Int): Column =
    charGramsOfLowered(lower(text), k)

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD 2003)
    * as (id, fp) pairs: hash every char `k`-gram, slide a window of
    * `w` hashes, keep each window's minimum, dedupe. Guarantee: any
    * shared substring of length ≥ `k + w − 1` between two documents
    * yields at least one shared fingerprint.
    *
    * Relational shape — posexplode grams → window `min` over (doc,
    * pos) with a `w`-row frame → distinct — rather than nested array
    * lambdas: a single-Column formulation re-evaluates the md5 gram
    * array once per window when Catalyst inlines it into an inferred
    * predicate (measured O(len²) hashes/row, >500× slower, interpreted
    * eval). Here each gram hashes exactly once; the only shuffle is
    * the per-doc window partition, and state per partition is one doc.
    */
  def winnowingFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 4,
      hasher: Column => Column = fastBaseHash): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Hash-partition by id BEFORE the ~len-fold explode: the shuffle
    // moves one row per doc (not per gram), spreads the gram hashing
    // across all cores even when the source is a single file split,
    // and already satisfies the window's required distribution — so
    // the exploded rows are never shuffled at all. The explicit
    // partition count matters: AQE would coalesce a bytes-small
    // pre-explode shuffle to one partition, blind to the ~len-fold
    // row fanout the explode is about to apply.
    //
    // Grams are built RELATIONALLY (explode a position sequence, then
    // substr — both codegen'd) rather than with the array-lambda
    // charGrams form: Spark higher-order functions evaluate
    // interpreted per element, which measured as the dominant cost of
    // this operator (same finding as Dedup.shinglesExploded).
    val base = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), lower(col(textCol)).as("__lt"))
    val short = base.filter(length(col("__lt")) < k)
      .select(col(idCol), lit(0).as("pos"), col("__lt").as("gram"))
    val long = base.filter(length(col("__lt")) >= k)
      .select(col(idCol), col("__lt"),
        explode(sequence(lit(1), length(col("__lt")) - (k - 1))).as("__p"))
      .select(col(idCol), (col("__p") - 1).as("pos"),
        col("__lt").substr(col("__p"), lit(k)).as("gram"))
    val grams = long.union(short)
      .select(col(idCol), col("pos"), hasher(col("gram")).as("h"))
    val byPos = Window.partitionBy(idCol).orderBy("pos")
    val frame = byPos.rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("wmin", min(col("h")).over(frame))
      // a window is "full" iff a (w−1)-ahead row exists; truncated
      // trailing windows are dropped, except pos 0 which stands in for
      // the single whole-doc window of short (< w grams) docs — frame
      // truncation makes its min the whole-doc min. Both window
      // functions share one sort/pass (same partition + order spec).
      .withColumn("full", lead(col("h"), w - 1).over(byPos).isNotNull)
      .filter(col("full") || col("pos") === 0)
      .select(col(idCol), col("wmin").as("fp"))
      .distinct()
  }

  /** Per-document n-gram occurrence summary: total grams, distinct
    * grams, and the top gram's count — the raw material of
    * repetition-based quality filters. Built on the codegen'd
    * relational [[Dedup.shinglesExploded]] (n=1 degenerates to plain
    * tokens); the exploded rows arrive pre-partitioned by id, so BOTH
    * groupBys run without any further shuffle — one exchange total,
    * then purely local aggregation at any scale.
    */
  def gramStats(df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    Dedup.shinglesExploded(df, textCol, idCol, n)
      .groupBy(col(idCol), col("__sh"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("__c")).as("total"),
        count(lit(1)).as("n_distinct"),
        max(col("__c")).as("top"))

  /** Repetition profile per document — the Gopher-style "repetitive
    * content" signals over tokens and bigrams:
    * `top_token_frac` / `top_bigram_frac` (share of the most frequent
    * gram) and `dup_token_frac` / `dup_bigram_frac` (share of gram
    * occurrences that are repeats), plus the composite
    * `is_repetitive` flag. Both gram pipelines are pre-partitioned by
    * id, so the final join needs no exchange either.
    */
  def repetitionProfile(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    def fracs(n: Int, label: String) =
      gramStats(df, textCol, idCol, n).select(
        col(idCol),
        roundPinned(col("top") / col("total"), 4).as(s"top_${label}_frac"),
        roundPinned((col("total") - col("n_distinct")) / col("total"), 4).as(s"dup_${label}_frac"))
    fracs(1, "token")
      .join(fracs(2, "bigram"), Seq(idCol))
      .withColumn("is_repetitive",
        repetitivePredicate(col("dup_token_frac"), col("dup_bigram_frac")))
  }

  /** Vocabulary-coverage (OOV-rate) report: per document, how many of
    * its tokens fall outside a reference vocabulary — the "will the
    * tokenizer shred this into bytes" check run before training
    * against a fixed token budget, and a cheap fit signal between a
    * corpus and an existing model's vocab. `vocab` carries one `token`
    * column (e.g. [[Curation.vocabulary]]'s top-k, or a tokenizer's
    * exported wordlist).
    *
    * Output: (id, n_tokens, n_oov, oov_rate), rate rounded to 4.
    *
    * Scale shape: one keyed pre-explode exchange (the AQE-fanout
    * guard every explode here uses), one LEFT join against the
    * vocabulary (vocabulary-sized build side — broadcasts when it
    * fits, which a real tokenizer vocab of 10⁴–10⁶ entries always
    * does), and a per-doc aggregate that reuses the pre-explode id
    * partitioning — document text moves through exactly one exchange
    * end to end.
    */
  def oovRate(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocab: DataFrame): DataFrame = {
    require(vocab.columns.contains("token"),
      s"vocab needs a 'token' column, has: ${vocab.columns.mkString(", ")}")
    val tok = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
    tok
      .join(vocab.select(col("token"), lit(1).as("__in")).distinct(),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("__in").isNull, 1)).as("n_oov"))
      .withColumn("oov_rate",
        roundPinned(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** Vocabulary encoding — the materialization step between a curated
    * corpus and a training run: every document's token sequence mapped
    * to vocabulary ids IN ORDER (`rank` from the vocab table; OOV
    * tokens encode as −1, counted separately — pair with [[oovRate]]
    * to decide whether the vocab is fit before encoding). Output:
    * (id, ids [comma-joined string — cross-engine-comparable, the
    * X60 postings convention], n_tokens, n_oov).
    *
    * Order preservation is the core correctness burden: tokens
    * posexplode WITH their position, join the vocabulary (broadcast at
    * any real vocab size), and reassemble via `array_sort` over
    * (pos, id) structs — `collect_list` alone guarantees no order.
    * One keyed pre-explode exchange; the regroup reuses it; the vocab
    * join adds none.
    */
  def encodeTokens(
      df: DataFrame,
      textCol: String,
      idCol: String,
      vocab: DataFrame): DataFrame = {
    require(vocab.columns.contains("token") && vocab.columns.contains("rank"),
      s"vocab needs (token, rank) columns, has: ${vocab.columns.mkString(", ")}")
    val tok = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "token")))
    tok
      .join(vocab.select("token", "rank").distinct(), Seq("token"), "left")
      .withColumn("__tid", coalesce(col("rank").cast("long"), lit(-1L)))
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tid")))),
            _.getField("__tid").cast("string")),
          ",").as("ids"),
        count(lit(1)).as("n_tokens"),
        count(when(col("__tid") === -1L, 1)).as("n_oov"))
  }

  /** Repetition cut on the duplicate-mass fractions (length-robust: a
    * short all-distinct doc scores 0, unlike top-gram share, which is
    * 1/n even for perfectly varied text): heavy token reuse or
    * repeated bigrams mark boilerplate/spam candidates.
    */
  def repetitivePredicate(dupTokenFrac: Column, dupBigramFrac: Column): Column =
    dupTokenFrac > 0.3 || dupBigramFrac > 0.15

  /** Stopword profiles for the n-gram-free language-ID heuristic.
    * Order matters: ties resolve to the earlier language.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un"),
    "es" -> Seq("el", "la", "de", "y", "los", "que", "una"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "den"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和"))

  /** Per-language stopword hit counts. */
  def langScores(text: Column): Seq[(String, Column)] = {
    val t = tokens(text)
    langProfiles.map { case (lang, words) =>
      s"score_$lang" -> size(filter(t, tok => tok.isin(words: _*))).cast("long")
    }
  }

  /** Predicted language: argmax of the stopword scores with
    * deterministic first-wins tie-break in profile order; all-zero →
    * "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val scores = langScores(text).map(_._2)
    val top = greatest(scores: _*)
    val langs = langProfiles.map(_._1)
    langs.zip(scores).foldRight(lit("und")) { case ((lang, s), acc) =>
      when(top > 0 && s === top, lit(lang)).otherwise(acc)
    }
  }
}
