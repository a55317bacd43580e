package graft.queries

import graft.Tables
import graft.ops.{Bpe, Curation, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Oracle-checked queries for the corpus-curation operators
  * ([[graft.ops.Curation]]): split assignment, stratified sampling,
  * PII redaction, benchmark decontamination, sequence packing, and
  * vocabulary building over the `documents` table.
  *
  * Conventions as everywhere: md5-derived hashers passed explicitly
  * (ops default to xxhash64), unique ORDER BY keys, identical column
  * names in both engines.
  */
object CurationQueries {

  private val benchCut = 25 // doc_id < benchCut plays the "benchmark set"
  private val packBudget = 512L
  private val vocabK = 100
  private val lineBanMax = 200L // lines in more docs than this are boilerplate
  private val bpeMerges = 8 // X105: learned merge steps (oracle chains 8 CTEs)
  private val bpeVocabK = 200

  /** Deterministic multi-line page synthesis for the line-dedup
    * queries (mirrored literally in the oracle SQL): chrome line
    * shared by ALL docs, the unique body, a `doc_id % 3` footer
    * variant, and a copyright line shared by all docs.
    */
  private def withSyntheticLines(df: DataFrame): DataFrame =
    df.withColumn("raw", concat_ws("\n",
      lit("home about products contact"),
      col("text"),
      concat(lit("subscribe to newsletter "), (col("doc_id") % 3).cast("string")),
      lit("copyright 2026 example corp all rights reserved")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = scala.collection.immutable.ListMap(

    // X120: the source-fair quality gate vs the global cut, side by
    // side — gate on within-source percent_rank and every source
    // keeps its best quarter; gate on the pooled 75th percentile and
    // low-scoring sources starve. One row per source shows both
    // counts; score = n_chars (deterministic, engine-shared).
    "q_fair_gate" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val fairKept = Curation
        .fairGate(d, Seq("source"), col("n_chars"), keepFrac = 0.25)
        .groupBy("source").agg(count(lit(1)).as("kept_fair"))
      val thr = d.agg(
        roundPinned(percentile(col("n_chars").cast("double"), lit(0.75)), 4).as("__thr"))
      val globalKept = d.crossJoin(broadcast(thr))
        .filter(col("n_chars").cast("double") >= col("__thr"))
        .groupBy("source").agg(count(lit(1)).as("kept_global"))
      d.groupBy("source").agg(count(lit(1)).as("n"))
        .join(fairKept, Seq("source"), "left")
        .join(globalKept, Seq("source"), "left")
        .select(col("source"), col("n"),
          coalesce(col("kept_fair"), lit(0L)).as("kept_fair"),
          coalesce(col("kept_global"), lit(0L)).as("kept_global"))
        .orderBy("source")
    }),

    // X123: T5-style span corruption — ~15% of tokens masked by a
    // pure (doc, pos) hash, runs collapsed to <extra_id_N> sentinels,
    // sentinel-prefixed targets. The denoising-objective data prep,
    // deterministic under retries and engines.
    "q_span_corrupt" -> ((s, dir) => {
      Curation.spanCorrupt(
          Tables.documents(s, dir), "text", "doc_id",
          maskRate = 0.15, seed = 5L, hasher = TextAnalysis.h64)
        .orderBy("doc_id")
    }),

    // Deterministic hash split: every doc gets a bucket and a named
    // split; re-running on any partitioning reproduces it exactly.
    "q_split_assign" -> ((s, dir) => {
      Curation.assignSplit(
          Tables.documents(s, dir),
          "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          seed = 42L,
          hasher = TextAnalysis.h64)
        .select("doc_id", "bucket", "split")
        .orderBy("doc_id")
    }),

    // Group-integrity (leakage-safe) splits: the hash decision on the
    // SOURCE key, so a site's near-identical pages can never straddle
    // train/test — one (source, split) row per source proves it.
    "q_split_group" -> ((s, dir) => {
      Curation.assignSplitBy(
          Tables.documents(s, dir).select("doc_id", "source"),
          "source",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
          seed = 7L,
          hasher = TextAnalysis.h64)
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "split")
    }),

    // Per-language down-sampling at deterministic rates.
    "q_stratified_sample" -> ((s, dir) => {
      Curation.stratifiedSample(
          Tables.documents(s, dir),
          "doc_id", "lang",
          Seq("en" -> 0.5, "fr" -> 0.25),
          defaultRate = 0.1,
          seed = 7L,
          hasher = TextAnalysis.h64)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }),

    // PII scrub over text with deterministically synthesized PII (the
    // same build-the-junk-then-repair pattern as q_string_repair: the
    // redaction chain is what's compared, constructed identically in
    // both engines).
    "q_pii_redact" -> ((s, dir) => {
      val raw = concat(
        col("text"), lit(" contact "), col("lang"), lit(".user"),
        col("doc_id").cast("string"), lit("@mail"),
        col("doc_id").cast("string"), lit(".example.org or 555-123-4567 at 10."),
        (col("doc_id") % 200).cast("string"), lit(".0.99 now"))
      val countCols = Curation.piiCounts(col("raw")).map { case (n, c) => c.as(n) }
      Tables.documents(s, dir)
        .withColumn("raw", raw)
        .select(
          col("doc_id") +: Curation.redactPii(col("raw")).as("redacted") +: countCols: _*)
        .orderBy("doc_id")
    }),

    // Whole-table PII exposure scan: the clean text column and a
    // synthetic PII-laden column audited side by side in ONE
    // aggregation pass — per-column category totals + rows-with-any.
    "q_pii_scan" -> ((s, dir) => {
      val raw = concat(
        col("text"), lit(" contact "), col("lang"), lit(".user"),
        col("doc_id").cast("string"), lit("@mail"),
        col("doc_id").cast("string"), lit(".example.org or 555-123-4567 at 10."),
        (col("doc_id") % 200).cast("string"), lit(".0.99 now"))
      Curation.piiScan(
          Tables.documents(s, dir).withColumn("raw", raw),
          Seq("text", "raw"))
        .orderBy("column")
    }),

    // Benchmark decontamination: corpus docs sharing >= 2 distinct
    // word-trigram shingles with a "benchmark" doc (doc_id < 25).
    "q_decontaminate" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Curation.decontaminate(
          d.filter(col("doc_id") >= benchCut),
          d.filter(col("doc_id") < benchCut),
          "text", "doc_id", shingleN = 3, minShared = 2L)
        .orderBy("doc_id", "bench_id")
    }),

    // Same contamination check through the Bloom-prefiltered scale
    // path: bit-identical output by construction (false positives die
    // in the exact verify join), so it shares q_decontaminate's oracle.
    "q_decontaminate_bloom" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Curation.decontaminateBloom(
          d.filter(col("doc_id") >= benchCut),
          d.filter(col("doc_id") < benchCut),
          "text", "doc_id", shingleN = 3, minShared = 2L)
        .orderBy("doc_id", "bench_id")
    }),

    // Concat-and-chunk packing by BPE-ish token budget.
    "q_pack_sequences" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), TextAnalysis.bpeTokenCount(col("text")).as("n_tokens"))
      Curation.packSequences(d, "doc_id", "n_tokens", packBudget)
        .select("doc_id", "n_tokens", "pack_id", "pack_offset")
        .orderBy("doc_id")
    }),

    // Corpus vocabulary: top-100 tokens by frequency, total-ordered.
    "q_vocab_topk" -> ((s, dir) => {
      Curation.vocabulary(Tables.documents(s, dir), "text", vocabK)
        .select("token", "freq", "rank")
        .orderBy("rank")
    }),

    // X105 BPE tokenizer induction: the learned merge table. One
    // corpus pass builds the word-count table; every merge step is a
    // vocabulary-sized explode + map-side-combined sum + a 1-row
    // argmax collect — the oracle replays all 8 steps as chained
    // CTEs (the q_pagerank iteration-replay pattern).
    "q_bpe_merges" -> ((s, dir) => {
      val (merges, _) = Bpe.train(Tables.documents(s, dir), "text", bpeMerges)
      Bpe.mergesFrame(s, merges).orderBy("step")
    }),

    // The post-merge segmented vocabulary (top words): training's
    // final word table IS the corpus encoding.
    "q_bpe_vocab" -> ((s, dir) => {
      val (_, vocab) = Bpe.train(Tables.documents(s, dir), "text", bpeMerges)
      val top = vocab.orderBy(col("n").desc, col("word")).limit(bpeVocabK)
      top
        .withColumn("rank",
          row_number().over(Window.orderBy(col("n").desc, col("word"))).cast("int"))
        // single-space display of the double-space internal form
        .withColumn("sym", regexp_replace(col("sym"), "  ", " "))
        .select("rank", "word", "n", "sym")
        .orderBy("rank")
    }),

    // Applying the learned tokenizer to the corpus: subword counts +
    // the first-12-subword prefix per document, as one shuffle-free
    // projection over the merge-chain lambda.
    "q_bpe_encode" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val (merges, _) = Bpe.train(docs, "text", bpeMerges)
      Bpe.encode(docs, "text", merges)
        .select(col("doc_id"), size(col("bpe_tokens")).as("n_subwords"),
          concat_ws(" ", slice(col("bpe_tokens"), 1, 12)).as("prefix"))
        .filter(col("n_subwords") > 0)
        .orderBy("doc_id")
    }),

    // X113: tokenizer fertility by language — subwords-per-word under
    // the learned tokenizer, the metric that shows which languages
    // the vocabulary serves poorly (and pay longer sequences for it).
    // Shares the cached training with the other q_bpe_* queries.
    "q_bpe_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val (merges, _) = Bpe.train(docs, "text", bpeMerges)
      Bpe.fertility(docs, "text", merges, "lang").orderBy("lang")
    }),

    // X57 line-level boilerplate removal. The fixture corpus is
    // single-line word soup, so multi-line pages are synthesized
    // deterministically in BOTH engines (the q_pii_redact
    // build-the-junk-then-repair pattern): shared site chrome +
    // unique body + a 3-variant footer. At sf0.01 (500 docs,
    // maxDocs=200) the chrome/copyright lines (500 docs each) are
    // banned while the ~167-doc footer variants survive — a mixed
    // keep/drop outcome, not a degenerate all-or-nothing.
    "q_dedup_lines" -> ((s, dir) => {
      Curation.dedupLines(
          withSyntheticLines(Tables.documents(s, dir)),
          "raw", "doc_id", maxDocs = lineBanMax,
          hasher = TextAnalysis.baseHash)
        .orderBy("doc_id")
    }),

    // Weighted sampling without replacement: 100 docs drawn with
    // probability proportional to token count via the deterministic
    // exponential race (no RNG; same ids win on any partitioning).
    "q_weighted_sample" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_tokens"))
      Curation.weightedSample(
          d, "doc_id", "n_tokens", k = 100, seed = 42L,
          hasher = TextAnalysis.h64)
        .orderBy("doc_id")
    }),

    // Per-source token-budget cap: walk each source in doc_id order
    // accumulating token counts; keep the prefix within an 800-token
    // budget — enforced per-domain contribution capping with an exact
    // cumulative audit trail.
    "q_token_budget" -> ((s, dir) => {
      Curation.tokenBudget(
          Tables.documents(s, dir).select("doc_id", "source", "text"),
          "text", "source", budgetTokens = 800L, orderCol = col("doc_id"))
        .filter(col("kept"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    }),

    // The census behind the ban decision: every line shared by >1
    // document with its exact document frequency — what a production
    // pipeline logs to tune the threshold.
    "q_line_freq" -> ((s, dir) => {
      Curation.lineDocFrequency(
          withSyntheticLines(Tables.documents(s, dir)),
          "raw", "doc_id",
          hasher = TextAnalysis.baseHash)
        .filter(col("n_docs") > 1)
        .orderBy("line")
    }),

    // Source-weighted token-budget mixing: 50/25/25 over three sources,
    // 2000-token budget (allocations 1000/500/500).
    "q_mix_sources" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      Curation.mixSources(
          d, "doc_id", "source", "n_tokens",
          Seq("src0" -> 0.5, "src1" -> 0.25, "src7" -> 0.25),
          tokenBudget = mixBudget, seed = 13L, hasher = TextAnalysis.h64)
        .select("doc_id", "source", "n_tokens", "mix_tokens_before")
        .orderBy("doc_id")
    }),

    // X111: temperature-scaled mixing weights (p_s ∝ n_s^(1/T), the
    // mT5 recipe) at T=2 — the table that DECIDES q_mix_sources'
    // weights argument: natural share, flattened weight, and the
    // oversample factor an operator checks against duplication harm.
    "q_temperature_weights" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
      Curation.temperatureWeights(d, "source", "n_tokens", temperature = 2.0)
        .orderBy("source")
    }))

  private val mixBudget = 2000L

  private def decontaminateOracle: String =
    s"""WITH docs AS (
       |  SELECT doc_id, lower(text) AS t FROM documents
       |), tok AS (
       |  SELECT doc_id, t, string_split(t, ' ') AS toks FROM docs
       |), sh AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) < 3 THEN [t]
       |         ELSE list_transform(generate_series(1, len(toks)-2),
       |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END AS shingles
       |  FROM tok
       |), ex AS (
       |  SELECT doc_id, unnest(list_distinct(shingles)) AS sh FROM sh
       |), hits AS (
       |  SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS n_shared
       |  FROM ex c JOIN ex b ON c.sh = b.sh
       |  WHERE c.doc_id >= $benchCut AND b.doc_id < $benchCut
       |  GROUP BY 1, 2
       |)
       |SELECT doc_id, bench_id, n_shared FROM hits
       |WHERE n_shared >= 2 ORDER BY doc_id, bench_id""".stripMargin

  /** Shared CTE for the line-dedup oracles: the synthetic multi-line
    * page (mirrors [[withSyntheticLines]] literally) exploded into
    * (doc_id, line, pos) via DuckDB's zipped unnests.
    */
  private val lineCte =
    """WITH raw AS (
      |  SELECT doc_id,
      |    'home about products contact' || chr(10) || text || chr(10)
      |      || 'subscribe to newsletter ' || (doc_id % 3)::VARCHAR || chr(10)
      |      || 'copyright 2026 example corp all rights reserved' AS raw
      |  FROM documents
      |), lines AS (
      |  SELECT doc_id,
      |    unnest(string_split(raw, chr(10))) AS line,
      |    unnest(generate_series(1, len(string_split(raw, chr(10))))) AS pos
      |  FROM raw
      |)""".stripMargin

  /** X105 BPE replay: `w0` is the word-count table with per-character
    * symbol sequences; each step chains (pair counts from `w{i-1}`) →
    * (1-row argmax, ties by pair string) → (padded literal replace —
    * left-to-right non-overlapping in DuckDB's `replace` exactly as
    * in the JVM's `regexp_replace` with a quoted pattern). Symbols
    * join on DOUBLE spaces so adjacent matches never consume a shared
    * delimiter — replace-all is then exactly the textbook greedy scan
    * (see [[graft.ops.Bpe.applyMerge]]). The q_pagerank
    * iteration-replay pattern, generated per step. Each `w\$i` takes
    * its merge via LEFT JOIN ON TRUE (not CROSS JOIN): when a step
    * finds no pairs (every word already one symbol before nMerges),
    * `m\$i` is empty and a cross join would empty `w\$i` and every
    * later CTE — the coalesce carries `w{i-1}` through unchanged,
    * mirroring [[graft.ops.Bpe.train]]'s early stop.
    */
  private def bpeCtes: String = {
    val sb = new StringBuilder(
      """WITH w0 AS (
        |  SELECT word, count(*)::BIGINT AS n,
        |    trim(regexp_replace(word, '(.)', '\1  ', 'g')) AS sym
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word
        |)""".stripMargin)
    for (i <- 1 to bpeMerges) sb ++= s""", p$i AS (
        |  SELECT pair, sum(n)::BIGINT AS cnt FROM (
        |    SELECT n, unnest(list_transform(range(1, len(s)), j -> s[j] || ' ' || s[j+1])) AS pair
        |    FROM (SELECT n, string_split(sym, '  ') AS s FROM w${i - 1})
        |  ) GROUP BY pair
        |), m$i AS (
        |  SELECT $i AS step, pair, cnt FROM p$i ORDER BY cnt DESC, pair LIMIT 1
        |), w$i AS (
        |  SELECT w.word, w.n,
        |    coalesce(trim(replace(' ' || w.sym || ' ',
        |      ' ' || split_part(m.pair, ' ', 1) || '  ' || split_part(m.pair, ' ', 2) || ' ',
        |      ' ' || replace(m.pair, ' ', '') || ' ')), w.sym) AS sym
        |  FROM w${i - 1} w LEFT JOIN m$i m ON TRUE
        |)""".stripMargin
    sb.toString
  }

  def oracleSql: Map[String, String] = Map(
    "q_span_corrupt" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS tok,
        |    unnest(generate_series(0, len(string_split(lower(text), ' ')) - 1)) AS pos
        |  FROM documents
        |), m AS (
        |  SELECT doc_id, pos, tok,
        |    ('0x' || substr(md5('5|' || doc_id::VARCHAR || '|' || pos::VARCHAR), 1, 15))::BIGINT % 10000 < 1500 AS masked
        |  FROM t
        |), s1 AS (
        |  SELECT *, masked AND NOT coalesce(
        |    lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), false) AS fst
        |  FROM m
        |), s2 AS (
        |  SELECT *, sum(CASE WHEN fst THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos) AS span
        |  FROM s1
        |), p AS (
        |  SELECT *,
        |    CASE WHEN NOT masked THEN tok
        |         WHEN fst THEN '<extra_id_' || span || '>' END AS corr,
        |    CASE WHEN fst THEN '<extra_id_' || span || '> ' || tok
        |         WHEN masked THEN tok END AS tgt
        |  FROM s2
        |)
        |SELECT doc_id,
        |  coalesce(string_agg(corr, ' ' ORDER BY pos), '') AS corrupted,
        |  coalesce(string_agg(tgt, ' ' ORDER BY pos), '') AS targets,
        |  count(*)::BIGINT AS n_tokens,
        |  sum(CASE WHEN masked THEN 1 ELSE 0 END)::BIGINT AS n_masked,
        |  max(span)::BIGINT AS n_spans
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_fair_gate" ->
      """WITH d AS (
        |  SELECT source, n_chars::DOUBLE AS sc FROM documents
        |), pr AS (
        |  SELECT source, sc,
        |    percent_rank() OVER (PARTITION BY source ORDER BY sc) AS pct
        |  FROM d
        |), fair AS (
        |  SELECT source, count(*)::BIGINT AS kept_fair
        |  FROM pr WHERE pct >= 0.75e0 GROUP BY 1
        |), thr AS (
        |  SELECT round(quantile_cont(sc, 0.75), 4) AS t FROM d
        |), gkept AS (
        |  SELECT source, count(*)::BIGINT AS kept_global
        |  FROM d, thr WHERE sc >= t GROUP BY 1
        |), base AS (
        |  SELECT source, count(*)::BIGINT AS n FROM d GROUP BY 1
        |)
        |SELECT b.source, b.n,
        |  coalesce(f.kept_fair, 0)::BIGINT AS kept_fair,
        |  coalesce(g.kept_global, 0)::BIGINT AS kept_global
        |FROM base b
        |LEFT JOIN fair f ON f.source = b.source
        |LEFT JOIN gkept g ON g.source = b.source
        |ORDER BY b.source""".stripMargin,
    "q_bpe_merges" -> (bpeCtes +
      s"""
         |SELECT step, pair, cnt FROM (${(1 to bpeMerges).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")})
         |ORDER BY step""".stripMargin),
    "q_bpe_vocab" -> (bpeCtes +
      s"""
         |SELECT rank, word, n, sym FROM (
         |  SELECT CAST(row_number() OVER (ORDER BY n DESC, word) AS INTEGER) AS rank,
         |    word, n, replace(sym, '  ', ' ') AS sym
         |  FROM w$bpeMerges
         |) WHERE rank <= $bpeVocabK ORDER BY rank""".stripMargin),
    // X113: every corpus word instance joins its trained-vocabulary
    // row (training corpus ≡ encode corpus, so the join is total);
    // per-word subword counts come from the merged symbol string,
    // grouped by lang — exact long sums, single divisions. The LEFT
    // JOIN from the distinct-lang base mirrors the engine's
    // zero-word-group contract: a lang whose docs are all empty still
    // emits its row with 0 counts and NULL ratios (an inner join
    // would silently drop it and row-count-mismatch the compare).
    "q_bpe_fertility" -> (bpeCtes +
      s""", encw AS (
         |  SELECT lang, list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
         |  FROM documents
         |), langs AS (
         |  SELECT DISTINCT lang FROM documents
         |), enc AS (
         |  SELECT lang, unnest(ws) AS word FROM encw
         |), persub AS (
         |  SELECT e.lang,
         |    len(string_split(replace(w.sym, '  ', ' '), ' '))::BIGINT AS nsub,
         |    length(e.word)::BIGINT AS nchar
         |  FROM enc e JOIN w$bpeMerges w ON w.word = e.word
         |)
         |SELECT l.lang, count(p.nsub)::BIGINT AS n_words,
         |  coalesce(sum(p.nsub), 0)::BIGINT AS n_subwords,
         |  CASE WHEN count(p.nsub) > 0
         |    THEN round(sum(p.nsub)::DOUBLE / count(p.nsub)::DOUBLE, 6) END AS fertility,
         |  CASE WHEN coalesce(sum(p.nsub), 0) > 0
         |    THEN round(sum(p.nchar)::DOUBLE / sum(p.nsub)::DOUBLE, 6) END AS chars_per_subword
         |FROM langs l LEFT JOIN persub p ON p.lang = l.lang
         |GROUP BY l.lang ORDER BY l.lang""".stripMargin),

    "q_bpe_encode" -> (bpeCtes +
      s""", encw AS (
         |  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS ws
         |  FROM documents
         |), enc AS (
         |  SELECT doc_id, unnest(range(1, len(ws)+1)) AS idx, ws FROM encw
         |), seq AS (
         |  SELECT e.doc_id, string_agg(replace(w.sym, '  ', ' '), ' ' ORDER BY e.idx) AS syms
         |  FROM (SELECT doc_id, idx, ws[idx] AS word FROM enc) e
         |  JOIN w$bpeMerges w ON w.word = e.word
         |  GROUP BY e.doc_id
         |)
         |SELECT doc_id, CAST(len(string_split(syms, ' ')) AS INTEGER) AS n_subwords,
         |  array_to_string(list_slice(string_split(syms, ' '), 1, 12), ' ') AS prefix
         |FROM seq ORDER BY doc_id""".stripMargin),
    "q_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS bucket
        |  FROM documents
        |)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 8000 THEN 'train'
        |       WHEN bucket < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_split_group" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    ('0x' || substr(md5('7|' || source), 1, 15))::BIGINT % 10000 AS bucket
        |  FROM documents
        |), s AS (
        |  SELECT source,
        |    CASE WHEN bucket < 8000 THEN 'train'
        |         WHEN bucket < 9000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM b
        |)
        |SELECT source, split, count(*) AS n
        |FROM s GROUP BY 1, 2 ORDER BY source, split""".stripMargin,
    "q_stratified_sample" ->
      """WITH b AS (
        |  SELECT doc_id, lang,
        |    ('0x' || substr(md5('7|' || doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS bkt
        |  FROM documents
        |)
        |SELECT doc_id, lang FROM b
        |WHERE bkt < CASE WHEN lang = 'en' THEN 5000
        |                 WHEN lang = 'fr' THEN 2500
        |                 ELSE 1000 END
        |ORDER BY doc_id""".stripMargin,
    "q_pii_scan" ->
      """WITH raw AS (
        |  SELECT doc_id, text,
        |    text || ' contact ' || lang || '.user' || doc_id::VARCHAR || '@mail'
        |      || doc_id::VARCHAR || '.example.org or 555-123-4567 at 10.'
        |      || (doc_id % 200)::VARCHAR || '.0.99 now' AS raw
        |  FROM documents
        |), e AS (
        |  SELECT 'text' AS pii_col, text AS v FROM raw
        |  UNION ALL
        |  SELECT 'raw' AS pii_col, raw AS v FROM raw
        |)
        |SELECT pii_col AS "column", count(v) AS n_rows,
        |  CAST(sum(len(regexp_extract_all(v, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
        |  CAST(sum(len(regexp_extract_all(v, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b'))) AS BIGINT) AS n_ips,
        |  CAST(sum(len(regexp_extract_all(v, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b'))) AS BIGINT) AS n_phones,
        |  count(CASE WHEN len(regexp_extract_all(v, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |              + len(regexp_extract_all(v, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b'))
        |              + len(regexp_extract_all(v, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) > 0
        |        THEN 1 END) AS n_rows_with_pii
        |FROM e GROUP BY 1 ORDER BY "column"""".stripMargin,
    "q_pii_redact" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' contact ' || lang || '.user' || doc_id::VARCHAR || '@mail'
        |      || doc_id::VARCHAR || '.example.org or 555-123-4567 at 10.'
        |      || (doc_id % 200)::VARCHAR || '.0.99 now' AS raw
        |  FROM documents
        |)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '[IP]', 'g'),
        |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g') AS redacted,
        |  len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        |  len(regexp_extract_all(raw, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b'))::BIGINT AS n_ips,
        |  len(regexp_extract_all(raw, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b'))::BIGINT AS n_phones
        |FROM raw ORDER BY doc_id""".stripMargin,
    "q_weighted_sample" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_tokens,
        |    round(-ln(((('0x' || substr(md5('42|' || doc_id::VARCHAR), 1, 15))::BIGINT
        |                % 1073741824) + 1)::DOUBLE / 1073741825.0)
        |          / n_tokens, 6) AS skey
        |  FROM t WHERE n_tokens > 0
        |  ORDER BY skey, doc_id LIMIT 100
        |)
        |SELECT doc_id, n_tokens, skey FROM r ORDER BY doc_id""".stripMargin,
    "q_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (
        |      PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM t
        |)
        |SELECT doc_id, source, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin,
    "q_dedup_lines" ->
      (lineCte +
        """, banned AS (
        |  SELECT line FROM lines GROUP BY line
        |  HAVING count(DISTINCT doc_id) > 200
        |), flagged AS (
        |  SELECT l.doc_id, l.pos, l.line, b.line IS NOT NULL AS banned
        |  FROM lines l LEFT JOIN banned b USING (line)
        |)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN NOT banned THEN line END,
        |                      chr(10) ORDER BY pos), '') AS clean_text,
        |  count(CASE WHEN NOT banned THEN 1 END)::BIGINT AS n_kept,
        |  count(CASE WHEN banned THEN 1 END)::BIGINT AS n_dropped
        |FROM flagged GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "q_line_freq" ->
      (lineCte +
        """
        |SELECT line, count(DISTINCT doc_id)::BIGINT AS n_docs
        |FROM lines GROUP BY line
        |HAVING count(DISTINCT doc_id) > 1
        |ORDER BY line""".stripMargin),
    "q_decontaminate" -> decontaminateOracle,
    // bit-identical path, same oracle (see the query's comment)
    "q_decontaminate_bloom" -> decontaminateOracle,
    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
        |  FROM t
        |)
        |SELECT doc_id, n_tokens, cum // 512 AS pack_id, cum % 512 AS pack_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_vocab_topk" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
        |), f AS (
        |  SELECT token, count(*) AS freq FROM tok WHERE token <> '' GROUP BY token
        |), r AS (
        |  SELECT token, freq,
        |    CAST(row_number() OVER (ORDER BY freq DESC, token) AS INTEGER) AS rank
        |  FROM f
        |)
        |SELECT token, freq, rank FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,
    // The window form is the semantic spec: per-source running token
    // sum in seeded-hash order, keep while the exclusive prefix is
    // under the source's allocation (straddler kept). The engine
    // computes the same prefix sums via partition offsets instead of
    // one window task per source.
    "q_mix_sources" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |    len(string_split(lower(text), ' '))::BIGINT AS n_tokens,
         |    ('0x' || substr(md5('13|' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
         |  FROM documents
         |  WHERE source IN ('src0', 'src1', 'src7')
         |), c AS (
         |  SELECT doc_id, source, n_tokens,
         |    CAST(COALESCE(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      AS mix_tokens_before
         |  FROM t
         |)
         |SELECT doc_id, source, n_tokens, mix_tokens_before FROM c
         |WHERE mix_tokens_before <
         |  CASE source WHEN 'src0' THEN 1000 ELSE 500 END
         |ORDER BY doc_id""".stripMargin,

    // X111: each p^(1/T) quantizes to a 1e-12 fixed-point BIGINT
    // before the normalizing sum, so the weights replay order-exactly;
    // T=2 routes through sqrt, which IEEE 754 requires to be correctly
    // rounded in BOTH engines — bit-exact by mandate, where pow is
    // only 1-ulp-accurate.
    "q_temperature_weights" ->
      s"""WITH t AS (
         |  SELECT source, len(string_split(lower(text), ' '))::BIGINT AS nt
         |  FROM documents
         |), s AS (
         |  SELECT source, sum(nt)::BIGINT AS n FROM t GROUP BY 1
         |), tot AS (
         |  SELECT coalesce(sum(n), 0)::BIGINT AS nn FROM s
         |), w AS (
         |  SELECT source, n, nn,
         |    round(sqrt(n::DOUBLE / nn::DOUBLE) * 1e12)::BIGINT AS wq
         |  FROM s CROSS JOIN tot
         |), sw AS (
         |  SELECT coalesce(sum(wq), 0)::BIGINT AS sumw FROM w
         |)
         |SELECT source, n AS n_tokens,
         |  round(n::DOUBLE / nn::DOUBLE, 6) AS natural_share,
         |  round(wq::DOUBLE / sumw::DOUBLE, 6) AS weight,
         |  round((wq::DOUBLE * nn::DOUBLE) / (sumw::DOUBLE * n::DOUBLE), 6)
         |    AS oversample
         |FROM w CROSS JOIN sw ORDER BY source""".stripMargin)
}
