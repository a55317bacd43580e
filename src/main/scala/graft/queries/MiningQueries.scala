package graft.queries

import graft.Tables
import graft.ops.{Cdc, Curation, Dedup, Expectations, Pca, Similarity, Sketches, TextAnalysis, TfIdf}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Oracle-checked queries for the round-14 corpus-mining operators:
  * exact duplicated-span accounting/stripping (X85 —
  * [[graft.ops.Dedup.spanDuplication]]), hard-negative mining (X86 —
  * [[graft.ops.Similarity.hardNegatives]]), overlapping token-window
  * chunking (X87 — [[graft.ops.Curation.chunkDocuments]]), and
  * k-anonymity auditing (X88 — [[graft.ops.Curation.kAnonymityClasses]]).
  *
  * Conventions as everywhere: md5-derived hashers passed explicitly
  * (ops default to xxhash64), unique ORDER BY keys, identical column
  * names in both engines.
  */
object MiningQueries {

  private val spanW = 5 // duplicated-span gram width (tokens)
  private val chunkTokens = 40
  private val chunkOverlap = 10
  private val chunkStep = chunkTokens - chunkOverlap
  private val hnK = 5
  private val hnQueryIds = 8 // query set = vec_id < 8
  private val embeddingDim = 64
  private val pcaK = 8
  private val pcaIters = 24
  private val mmrK = 5
  private val mmrPoolK = 12
  private val mmrLambda = 0.7
  private val bitextK = 4
  private val bitextThreshold = 1.0
  private val jlOutDim = 16
  private val anonK = 5L
  private val benchCut = 25 // vec_id < 25 plays the "benchmark set"
  private val semConThreshold = 0.35

  /** 60-bit cross-engine gram hasher for the span oracles (the ops
    * default to xxhash64 in production).
    */
  private val oracleHash: Column => Column =
    c => graft.functions.Md5PrefixLongExpr.md5PrefixLong(c, 15)

  /** Deterministic cross-doc boilerplate synthesis for the span
    * queries (mirrored literally in the oracle SQL): every doc gets a
    * 7-token newsletter line shared by ALL docs, a `doc_id % 3` footer
    * variant shared within each mod group, and a copyright line shared
    * by all docs — guaranteed duplicated spans with known extents,
    * overlapping-gram runs (every w-gram inside the shared tail is
    * duplicated, so the interval union logic is actually exercised),
    * and engine-identical tokenization (single spaces throughout).
    */
  private def withSpanText(df: DataFrame): DataFrame =
    df.withColumn("raw", concat_ws(" ",
      col("text"),
      lit("subscribe to our newsletter for daily updates"),
      concat(lit("footer variant "), (col("doc_id") % 3).cast("string"),
        lit(" alpha beta gamma delta")),
      lit("copyright 2026 example corp all rights reserved")))

  /** The same synthesis as a DuckDB expression over `documents.text`. */
  private val spanTextSql: String =
    "text || ' subscribe to our newsletter for daily updates footer variant ' || " +
      "(doc_id % 3)::VARCHAR || " +
      "' alpha beta gamma delta copyright 2026 example corp all rights reserved'"

  /** Shared DuckDB prelude for both span queries: tokenized docs,
    * positioned `spanW`-gram hashes (NULL-propagating `||` drops the
    * truncated trailing windows the Spark side filters on its last
    * lead), and the ≥2-doc duplicated-occurrence set with interval
    * ends.
    */
  /** WITH-prelude building `gh(doc_id, pos, h)` positioned gram
    * hashes from a raw-text SQL expression over `documents`.
    */
  private def spanGramSql(rawSql: String): String = {
    val leads = (1 until spanW)
      .map(j => s"lead(tok, $j) OVER w")
      .mkString(" || ' ' || ")
    s"""WITH d AS (
       |  SELECT doc_id, $rawSql AS raw FROM documents
       |), toks AS (
       |  SELECT doc_id, string_split(lower(raw), ' ') AS toks FROM d
       |), pos AS (
       |  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
       |  FROM toks
       |), gr AS (
       |  SELECT doc_id, pos, tok || ' ' || $leads AS gram
       |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
       |), gh AS (
       |  SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
       |  FROM gr WHERE gram IS NOT NULL
       |)""".stripMargin
  }

  private def spanPreludeSql: String =
    s"""${spanGramSql(spanTextSql)}, dup AS (
       |  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM gh GROUP BY 1)
       |  WHERE nd >= 2
       |), occ AS (
       |  SELECT doc_id, pos, pos + $spanW AS e FROM gh
       |  WHERE h IN (SELECT h FROM dup)
       |)""".stripMargin

  /** Shared DuckDB fragment: exact double-fold dot product. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, ${embeddingDim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  /** Customer quasi-identifier set for the k-anonymity queries:
    * (nation, segment, $1000 balance band) — coarse enough that most
    * classes clear k=5, fine enough that some don't.
    */
  private def customerQid(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("bal_band", floor(col("c_acctbal") / 1000))

  private val qidSql =
    "SELECT c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band FROM customer"

  def queries: Map[String, (SparkSession, String) => DataFrame] = scala.collection.immutable.ListMap(

    // X85: per-doc duplicated-span accounting. The synthetic shared
    // tail means every doc has a known duplicated region; natural
    // cross-doc 5-gram repeats in the corpus body add to it.
    "q_span_dedup" -> ((s, dir) => {
      Dedup.spanDuplication(
          withSpanText(Tables.documents(s, dir)),
          "raw", "doc_id",
          windowTokens = spanW, minDocs = 2L, hasher = oracleHash)
        .orderBy("doc_id")
    }),

    // X92: intra-doc span self-repetition — every doc gets its own
    // first 6 tokens appended (a guaranteed repeated run), so loop
    // coverage is non-trivial for all docs, plus natural repeats.
    "q_span_self" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
        .withColumn("raw", concat(col("text"), lit(" "),
          concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 6))))
      Dedup.spanSelfRepetition(
          d, "raw", "doc_id",
          windowTokens = spanW, minOccurrences = 2L, hasher = oracleHash)
        .orderBy("doc_id")
    }),

    // X85b: strip the duplicated spans, keep the unique remainder in
    // original token order (hash-exact reassembled text).
    "q_span_strip" -> ((s, dir) => {
      Dedup.stripDuplicatedSpans(
          withSpanText(Tables.documents(s, dir)),
          "raw", "doc_id",
          windowTokens = spanW, minDocs = 2L, hasher = oracleHash)
        .orderBy("doc_id")
    }),

    // X86: top-5 different-label neighbors for each of the 8 query
    // vectors — the contrastive-training hard-negative set.
    "q_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(
          emb, emb.filter(col("vec_id") < hnQueryIds),
          "vec_id", "embedding", "label", hnK)
        .withColumn("sim_r", roundPinned(col("sim"), 4)).drop("sim")
        .orderBy("qid", "rank")
    }),

    // X87: overlapping token-window chunks (40 tokens, 10 overlap).
    "q_chunk_docs" -> ((s, dir) => {
      Curation.chunkDocuments(
          Tables.documents(s, dir), "text", "doc_id",
          chunkTokens = chunkTokens, overlapTokens = chunkOverlap)
        .orderBy("doc_id", "chunk_id")
    }),

    // X88: per-class k-anonymity audit over the customer QI set.
    "q_k_anonymity" -> ((s, dir) => {
      Curation.kAnonymityClasses(
          customerQid(s, dir),
          Seq("c_nationkey", "c_mktsegment", "bal_band"), anonK)
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    }),

    // X88b: the one-row release-gate summary.
    "q_k_anonymity_report" -> ((s, dir) => {
      Curation.kAnonymityReport(
        customerQid(s, dir),
        Seq("c_nationkey", "c_mktsegment", "bal_band"), anonK)
    }),

    // X89: BM25 retrieval — 5 queries (each the first 4 tokens of a
    // low-id doc) against the whole corpus, top-5 docs each.
    "q_bm25_search" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      TfIdf.bm25Search(
          d, bm25Queries(d), "text", "doc_id", "query_id", "qtext", k = bmK)
        .orderBy("qid", "rank")
    }),

    // X87 ∘ X89: the RAG ingestion+retrieval path — chunk the corpus,
    // retrieve top-3 CHUNKS per query. One lazy plan, one oracle.
    "q_rag_retrieval" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val chunks = Curation.chunkDocuments(
          d, "text", "doc_id", chunkTokens = chunkTokens, overlapTokens = chunkOverlap)
        .select(
          (col("doc_id") * 100 + col("chunk_id")).as("chunk_uid"),
          col("chunk_text"))
      TfIdf.bm25Search(
          chunks, bm25Queries(d), "chunk_text", "chunk_uid", "query_id", "qtext", k = 3)
        .orderBy("qid", "rank")
    }),

    // X90: token log-odds quality classifier — train on en vs non-en
    // docs, score the whole corpus (the model should rediscover the
    // language split it was trained on).
    // Kept on the GENERIC train∘score pair deliberately: the fused
    // 1-pass variant (classifyTokenLogOddsPartitioned) halves corpus
    // SCANS — decisive on a cluster where scans dominate — but on
    // this page-cache-hot single node its token-frame cache
    // materialization costs more than the two extra codegen scans it
    // saves (measured 2×: TimeQuery 1.00 s fused vs the 0.46 s
    // generic floor; MiningScaleProbe records both series). TfIdfSpec
    // pins result-equality, so either path is swappable per cost
    // model.
    "q_quality_classifier" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val model = TfIdf.trainTokenLogOdds(
        d.filter(col("lang") === "en"),
        d.filter(col("lang") =!= "en"),
        "text", "doc_id")
      TfIdf.scoreTokenLogOdds(d, model, "text", "doc_id").orderBy("doc_id")
    }),

    // X101: keyed pseudonymization — identifier columns replaced with
    // stable md5(secret|value) tokens; joinability survives, values
    // don't.
    "q_pseudonymize" -> ((s, dir) => {
      Curation.pseudonymizeColumns(
          Tables.customer(s, dir).select("c_custkey", "c_name", "c_mktsegment"),
          Seq("c_name"), secret = "s3cr3t-2026", tokenLen = 16)
        .orderBy("c_custkey")
    }),

    // X106: ε-DP histogram release — the Laplace mechanism over
    // q_histogram's fixed grid. Per-bucket noise is the md5-backbone
    // inverse-CDF draw (replayable here; a production release passes
    // a fresh cryptographically-random secret per publication), every
    // grid bucket is released including empty ones, clamped at 0.
    "q_dp_histogram" -> ((s, dir) => {
      Curation.dpHistogram(
          Tables.lineitem(s, dir), col("l_extendedprice"),
          lo = 0.0, hi = 110000.0, nBuckets = 22,
          epsilon = 0.5, secret = "dp-2026")
        .orderBy("bucket")
    }),

    // X102: PSI drift timeline — weekly event-value distribution vs
    // the first week, one query for the whole monitoring series.
    "q_drift_timeline" -> ((s, dir) => {
      Expectations.psiTimeline(
          Tables.events(s, dir), "ts", col("value"),
          lo = 0.0, hi = 500.0, nBuckets = 20)
        .orderBy("period")
    }),

    // X100: semantic decontamination — embedding-cosine screen of the
    // corpus (vec_id >= 25) against the "benchmark" vectors
    // (vec_id < 25); paraphrase leakage the n-gram screen (X25)
    // cannot see. Flagged pairs, hash-exact.
    "q_semantic_contamination" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.semanticContamination(
          e.filter(col("vec_id") >= benchCut),
          e.filter(col("vec_id") < benchCut),
          "vec_id", "embedding", threshold = semConThreshold)
        .withColumn("sim_r", roundPinned(col("sim"), 4)).drop("sim")
        .orderBy("doc_id", "bench_id")
    }),

    // X100b: the survivor side — corpus rows with no semantic match.
    "q_decontaminate_semantic" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.decontaminateSemantic(
          e.filter(col("vec_id") >= benchCut),
          e.filter(col("vec_id") < benchCut),
          "vec_id", "embedding", threshold = semConThreshold)
        .select("vec_id", "label")
        .orderBy("vec_id")
    }),

    // X98: LSH banding planner — the candidate-probability grid for
    // three (k, bands) configs across nine Jaccard levels.
    "q_lsh_plan" -> ((s, dir) => {
      Dedup.lshPlan(
          s,
          configs = Seq((16, 8), (16, 4), (32, 8)),
          jaccards = (1 to 9).map(_ / 10.0))
        .orderBy("k", "bands", "jaccard")
    }),

    // X91: snapshot diff — synthesize the change feed between two
    // full orders snapshots (deterministic deletes/updates/inserts
    // built identically in both engines).
    "q_snapshot_diff" -> ((s, dir) => {
      val (before, after) = diffSnapshots(s, dir)
      Cdc.snapshotDiff(before, after, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    }),

    // X93: hybrid retrieval — BM25 text ranking ⊕ embedding cosine
    // ranking (vec_id ≡ doc_id in the testdata), fused by reciprocal
    // rank. Score scales are incomparable; ranks fuse.
    "q_hybrid_retrieval" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val e = Tables.embeddings(s, dir)
      val textRank = TfIdf.bm25Search(
          d, bm25Queries(d), "text", "doc_id", "query_id", "qtext", k = bmK)
        .select("qid", "doc", "rank")
      val vecRank = Similarity.bruteForceTopK(
          e, e.filter(col("vec_id") < bmQueryIds), "vec_id", "embedding", bmK)
        .select(col("qid"), col("nid").as("doc"), col("rank"))
      TfIdf.rrfFuse(Seq(textRank, vecRank), topK = bmK)
        .orderBy("qid", "rank")
    }),

    // X94: l-diversity — attribute-disclosure audit per (nation,
    // segment) class over a coarse wealth-tier sensitive attribute.
    "q_l_diversity" -> ((s, dir) => {
      Curation.lDiversityClasses(
          Tables.customer(s, dir)
            .withColumn("tier", floor(col("c_acctbal") / 2000)),
          Seq("c_nationkey", "c_mktsegment"), "tier", l = 4L)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // X95: t-closeness — per-class total-variation distance of the
    // sensitive distribution from the table's, same QI/sensitive set
    // as q_l_diversity (the triad audits one release together).
    "q_t_closeness" -> ((s, dir) => {
      Curation.tClosenessClasses(
          Tables.customer(s, dir)
            .withColumn("tier", floor(col("c_acctbal") / 2000)),
          Seq("c_nationkey", "c_mktsegment"), "tier", t = 0.25)
        .orderBy("c_nationkey", "c_mktsegment")
    }),

    // X96: PCA whitening of the embedding corpus — now a HASH-EXACT
    // oracle row (was rows-only through r15): the fit is the
    // replayable variant (quantized integer moments + fixed-order
    // power iteration, [[graft.ops.Pca.fitReplayable]]), whose every
    // double op the DuckDB oracle replays through a recursive CTE —
    // no eigensolver needed on either side. Output is k scalar DOUBLE
    // columns (never array<double>: that crashed the r14 driver
    // compare, and a string dump would couple the two engines'
    // double-formatting). The MLlib eigensolver fit stays the
    // production path (PcaSpec).
    "q_pca_whiten" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val model = Pca.fitReplayable(
        e, "embedding", embeddingDim, pcaK, pcaIters)
      // same valid-vector convention as the fit (incl. exact length)
      val valid = col("embedding").isNotNull &&
        !exists(col("embedding"), _.isNull) &&
        size(col("embedding")) === embeddingDim
      e.filter(valid)
        .select(col("vec_id") +:
          Pca.replayableWhitened(col("embedding"), model): _*)
        .orderBy("vec_id")
    }),

    // X127: the dim-reduction ∘ similarity composition a 100 TB
    // retrieval stack actually runs — whiten to 8 dims with the
    // replayable PCA fit, then cosine top-k in the REDUCED space
    // (64→8 dims cuts per-pair cost 8×; at corpus scale the reduced
    // vectors feed the LSH/IVF routes unchanged). Hash-exact: the
    // rounded projections are already engine-agreed (X96), and the
    // reduced-space cosine uses the same pinned folds as every ANN
    // oracle. The fit's quantized-moments frame is persistOnce-shared
    // with q_pca_whiten, so the suite pays the moments pass once.
    "q_pca_topk" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val model = Pca.fitReplayable(
        e, "embedding", embeddingDim, pcaK, pcaIters)
      val valid = col("embedding").isNotNull &&
        !exists(col("embedding"), _.isNull) &&
        size(col("embedding")) === embeddingDim
      val proj = e.filter(valid)
        .select(col("vec_id") +:
          Pca.replayableWhitened(col("embedding"), model): _*)
      val rv = proj.select(col("vec_id"),
        array((1 to pcaK).map(i => col(s"pc$i")): _*).as("rvec"))
      Similarity.bruteForceTopKDouble(
          rv, rv.filter(col("vec_id") < hnQueryIds), "vec_id", "rvec", mmrK)
        .select(col("qid"), col("rank"), col("nid"),
          (roundPinned(col("sim"), 4)).as("sim_r"))
        .orderBy("qid", "rank")
    }),

    // X115: MMR diversified re-rank — per query, 5 picks from the
    // 12-deep cosine shortlist trading relevance against redundancy
    // (λ=0.7). Every pick and score replays in DuckDB: fused-cosine
    // relevance, exact max over the selected set, pinned combine
    // order. The corpus appears only in the shortlist build.
    "q_mmr_rerank" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.mmrRerank(
          e, e.filter(col("vec_id") < hnQueryIds), "vec_id", "embedding",
          k = mmrK, poolK = mmrPoolK, lambda = mmrLambda)
        .orderBy("qid", "rank")
    }),

    // X116: distinct-n diversity — per ingestion source, the
    // distinct/total unigram and bigram ratios (Li et al. 2016's
    // distinct-1/distinct-2). A template-stamped source craters
    // distinct-2; this is the corpus-level screen in front of the
    // per-document repetition ops. Exact distinct here (oracleable);
    // hllDistinct is the sketch swap at corpus scale.
    "q_ngram_diversity" -> ((s, dir) => {
      TextAnalysis.ngramDiversity(
          Tables.documents(s, dir), "text", Seq("source"), ns = Seq(1, 2))
        .orderBy("source", "n")
    }),

    // X117: margin-based bitext/pair mining (the LASER/CCMatrix
    // criterion) between the label-0 and label-1 embedding sides:
    // cosine normalized by each vector's top-4 neighborhood average,
    // mutual best matches above margin 1.0. The neighborhood sums are
    // quantized longs, so DuckDB replays every margin bit-exactly.
    "q_bitext_mine" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      Similarity.marginMine(
          e.filter(col("label") === 0), e.filter(col("label") === 1),
          "vec_id", "embedding", k = bitextK, threshold = bitextThreshold)
        .orderBy("a_id")
    }),

    // X121: Johnson–Lindenstrauss sign projection 64→16 — the
    // data-independent (no fit pass) companion of X96's PCA; md5-
    // derived ±1 signs, order-pinned folds, k scalar rounded columns.
    "q_jl_project" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val valid = col("embedding").isNotNull &&
        !exists(col("embedding"), _.isNull)
      e.filter(valid)
        .select(col("vec_id") +:
          Pca.jlProject(col("embedding"), embeddingDim, jlOutDim): _*)
        .orderBy("vec_id")
    }),

    // X90 ∘ X80: the production quality gate — classifier score →
    // corpus-own top-quartile cut → keep. Two caches, each with two
    // consumers: the FUSED classifier's token frame feeds model and
    // score (here the cache pays off even locally — the gate reads
    // the classifier TWICE via the quantile cut + row stream, and
    // caching cuts the whole pipeline to one tokenization; measured
    // 1.14 s vs the r14 generic-path floor of 1.32 s), and the scored
    // frame itself persists for the cut + stream pair.
    "q_quality_gate" -> ((s, dir) => {
      val scored = graft.CachedFrames.persistOnce(
        TfIdf.classifyTokenLogOddsPartitioned(
            Tables.documents(s, dir), col("lang") === "en", "text", "doc_id")
          .select("doc_id", "score_r"))
      Sketches.segmentByQuantiles(
          scored, col("score_r"), Seq(0.75), Seq("below", "top"))
        .filter(col("segment") === "top")
        .orderBy("doc_id")
    })
  )

  /** Deterministic before/after orders snapshots for q_snapshot_diff
    * (mirrored literally in the oracle SQL): delete every key ≡ 0
    * (mod 97), bump o_totalprice by 1.0 for keys ≡ 0 (mod 31), insert
    * a shifted copy of keys ≡ 0 (mod 113).
    */
  private def diffSnapshots(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, dir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val updated = o.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn(
        "o_totalprice",
        when(col("o_orderkey") % 31 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
    val inserted = o.filter(col("o_orderkey") % 113 === 0)
      .select(
        (col("o_orderkey") + 10000000L).as("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
    (o, updated.unionByName(inserted))
  }

  private val bmK = 5
  private val bmQueryIds = 5

  /** 5 deterministic retrieval queries: the first 4 tokens of docs
    * 0..4 (mirrored in the oracle via list slicing).
    */
  private def bm25Queries(d: DataFrame): DataFrame =
    d.filter(col("doc_id") < bmQueryIds)
      .select(
        col("doc_id").as("query_id"),
        concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 4)).as("qtext"))

  /** DuckDB replay of [[TfIdf.bm25Search]] over a corpus bound by
    * `corpPrelude` as `corp(doc_id, toks)`: tf/dl/df/scalar stats,
    * the 5 first-4-token queries, Lucene-idf BM25 scoring with the
    * EXACT operator association of the Spark expression (constants
    * written as the same unfolded arithmetic so both engines fold
    * them under IEEE round-to-nearest-even), round-then-rank.
    */
  private def bm25OracleSql(corpPrelude: String, k: Int): String =
    s"""$corpPrelude, tf AS (
       |  SELECT doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM corp) GROUP BY 1, 2
       |), dl AS (
       |  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1
       |), stats AS (
       |  SELECT count(*)::DOUBLE AS n, avg(dl::DOUBLE) AS avgdl FROM dl
       |), dfq AS (
       |  SELECT term, count(*) AS df FROM tf GROUP BY 1
       |), qdocs AS (
       |  SELECT doc_id AS qid, string_split(lower(text), ' ') AS toks
       |  FROM documents WHERE doc_id < $bmQueryIds
       |), qd AS (
       |  SELECT DISTINCT qid, term
       |  FROM (SELECT qid, unnest(toks[1:4]) AS term FROM qdocs)
       |), scored AS (
       |  SELECT qd.qid, tf.doc_id, count(*)::BIGINT AS n_terms,
       |    round(sum(
       |      ln(1 + (stats.n - dfq.df + 0.5) / (dfq.df + 0.5)) *
       |      ((tf.tf * (1.2 + 1)) /
       |       (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)))
       |    ), 4) AS score_r
       |  FROM tf
       |  JOIN qd USING (term)
       |  JOIN dfq USING (term)
       |  JOIN dl ON dl.doc_id = tf.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2
       |)
       |SELECT qid,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY score_r DESC, doc_id) AS INTEGER) AS rank,
       |  doc_id AS doc, n_terms, score_r
       |FROM scored
       |QUALIFY rank <= $k
       |ORDER BY qid, rank""".stripMargin

  /** DuckDB replay of [[TfIdf.trainTokenLogOdds]] (en vs non-en) +
    * [[TfIdf.scoreTokenLogOdds]] over `documents`, ending in
    * `sc(doc_id, n_terms, n_matched, score_r)` — shared by the
    * classifier query and the quality-gate composition.
    */
  private val classifierPreludeSql: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents
      |), tokr AS (
      |  SELECT doc_id, lang, unnest(toks) AS term FROM docs
      |), tok AS (
      |  SELECT DISTINCT doc_id, lang, term FROM tokr
      |), dfp AS (
      |  SELECT term, count(*) AS df_pos FROM tok WHERE lang = 'en' GROUP BY 1
      |), dfn AS (
      |  SELECT term, count(*) AS df_neg FROM tok WHERE lang <> 'en' GROUP BY 1
      |), sizes AS (
      |  SELECT count(DISTINCT CASE WHEN lang = 'en' THEN doc_id END) AS np,
      |         count(DISTINCT CASE WHEN lang <> 'en' THEN doc_id END) AS nn
      |  FROM docs
      |), wts AS (
      |  SELECT coalesce(dfp.term, dfn.term) AS term,
      |    ln((coalesce(df_pos, 0) + 1.0) / (np + 2.0)) -
      |    ln((coalesce(df_neg, 0) + 1.0) / (nn + 2.0)) AS weight
      |  FROM dfp FULL OUTER JOIN dfn ON dfp.term = dfn.term CROSS JOIN sizes
      |), sc AS (
      |  SELECT t.doc_id, count(*)::BIGINT AS n_terms,
      |    count(w.weight)::BIGINT AS n_matched,
      |    round(sum(coalesce(w.weight, 0)), 4) AS score_r
      |  FROM tok t LEFT JOIN wts w ON t.term = w.term
      |  GROUP BY 1
      |)""".stripMargin

  /** A double literal DuckDB parses AS DOUBLE. A bare decimal literal
    * (`0.0009732008797355829`) parses as DECIMAL first and the cast
    * to DOUBLE then rounds DIFFERENTLY than the JVM's shortest-repr
    * round-trip — measured 1-ulp divergences that broke bit replay.
    * A scientific-notation literal (`…e0`) parses directly as DOUBLE,
    * correctly rounded, bit-identical to the JVM value.
    */
  private def sqlDouble(x: Double): String = {
    val r = x.toString
    if (r.contains("E") || r.contains("e")) r else r + "e0"
  }

  /** X96 oracle: bit-exact SQL replay of
    * [[graft.ops.Pca.fitReplayable]] + [[graft.ops.Pca.replayableWhitened]].
    *
    * Exactness contract, mirrored step for step with the Scala driver:
    *  - moments: per-term `round(x·1e9)::BIGINT` then integer sums —
    *    order-free, so the engines' different aggregation shapes
    *    cannot diverge;
    *  - covariance/means: the same two divisions then products, in
    *    the same order;
    *  - power iteration: a recursive CTE over (comp, t, cov, v);
    *    every dot is `list_sum(list_transform(...))` — DuckDB's
    *    list_sum is a strict sequential fold (verified against a JVM
    *    left-to-right loop to 4096 elements), matching the driver's
    *    `while` loops; normalization, Rayleigh λ, and rank-one
    *    deflation use identical operation order;
    *  - start vectors: [[graft.ops.Pca.replayStart]]'s integer
    *    recurrence embedded as `e0` DOUBLE literals ([[sqlDouble]]);
    *  - projection: per-row sequential dot, the same
    *    `(dot − off)·scale` shift, `round(…,4) + 0e0` sign-folding.
    */
  private def pcaOracle: String = {
    val pcCols = (1 to pcaK).map(c =>
      s"max(CASE WHEN comp = ${c - 1} THEN p END) AS pc$c").mkString(",\n  ")
    pcaProjCtes +
    s"""
       |SELECT vec_id,
       |  $pcCols
       |FROM proj GROUP BY vec_id ORDER BY vec_id""".stripMargin
  }

  /** Shared CTE prefix of the X96 family: the full replayable-PCA fit
    * + per-(vec, comp) whitened projection `proj(vec_id, comp, p)` —
    * reused verbatim by [[pcaOracle]] (pivot to pc columns) and the
    * X127 composition oracle (reduced-space top-k).
    */
  private def pcaProjCtes: String = {
    val d = embeddingDim
    val starts = "[" + (0 until pcaK).map(c =>
      "[" + Pca.replayStart(c, d).map(sqlDouble).mkString(",") + "]")
      .mkString(",") + "]"
    s"""WITH RECURSIVE valid AS (
       |  SELECT vec_id, embedding AS v FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL)) = 0
       |    AND len(embedding) = $d
       |), nrow AS (SELECT count(*)::BIGINT AS n FROM valid),
       |lin AS (
       |  SELECT i, sum(CAST(round(v[CAST(i+1 AS INTEGER)]::DOUBLE * 1e9) AS BIGINT)) AS q
       |  FROM valid, (SELECT unnest(range(0, $d)) AS i) ii GROUP BY i
       |), quad AS (
       |  SELECT i, j, sum(CAST(round(v[CAST(i+1 AS INTEGER)]::DOUBLE * v[CAST(j+1 AS INTEGER)]::DOUBLE * 1e9) AS BIGINT)) AS q
       |  FROM valid, (SELECT a.i, b.j
       |               FROM (SELECT unnest(range(0, $d)) AS i) a,
       |                    (SELECT unnest(range(0, $d)) AS j) b WHERE b.j >= a.i) pp
       |  GROUP BY i, j
       |), mu AS (
       |  SELECT list(q::DOUBLE / 1e9 / n ORDER BY i) AS m FROM lin, nrow GROUP BY n
       |), ut AS (
       |  SELECT list(q::DOUBLE / 1e9 / (n-1) ORDER BY i, j) AS u FROM quad, nrow GROUP BY n
       |), cov0 AS (
       |  SELECT list_transform(range(0, $d), i ->
       |    list_transform(range(0, $d), j ->
       |      u[CAST(least(i,j)*$d - least(i,j)*(least(i,j)-1)//2 + greatest(i,j)-least(i,j) + 1 AS INTEGER)]
       |        - m[CAST(i+1 AS INTEGER)] * m[CAST(j+1 AS INTEGER)] * n / (n-1))) AS c
       |  FROM ut, mu, nrow
       |), pi AS (
       |  SELECT 0 AS comp, 0 AS t, c, ($starts)[1] AS v FROM cov0
       |  UNION ALL
       |  SELECT
       |    CASE WHEN t < $pcaIters THEN comp ELSE comp + 1 END AS comp,
       |    CASE WHEN t < $pcaIters THEN t + 1 ELSE 0 END AS t,
       |    CASE WHEN t < $pcaIters THEN c ELSE
       |      list_transform(range(0, $d), i -> list_transform(range(0, $d), j ->
       |        c[CAST(i+1 AS INTEGER)][CAST(j+1 AS INTEGER)]
       |          - list_sum(list_transform(range(1, ${d + 1}), i2 ->
       |              v[CAST(i2 AS INTEGER)] * list_sum(list_transform(range(1, ${d + 1}), j2 ->
       |                c[CAST(i2 AS INTEGER)][CAST(j2 AS INTEGER)] * v[CAST(j2 AS INTEGER)]))))
       |            * v[CAST(i+1 AS INTEGER)] * v[CAST(j+1 AS INTEGER)]))
       |    END AS c,
       |    CASE WHEN t < $pcaIters THEN
       |      list_transform(
       |        list_transform(c, row -> list_sum(list_transform(range(1, ${d + 1}), j -> row[CAST(j AS INTEGER)] * v[CAST(j AS INTEGER)]))),
       |        x -> x / sqrt(list_sum(list_transform(
       |          list_transform(c, row -> list_sum(list_transform(range(1, ${d + 1}), j -> row[CAST(j AS INTEGER)] * v[CAST(j AS INTEGER)]))),
       |          y -> y * y))))
       |    ELSE ($starts)[CAST(comp + 2 AS INTEGER)] END AS v
       |  FROM pi
       |  WHERE t < $pcaIters OR comp < ${pcaK - 1}
       |), model AS (
       |  SELECT comp, v,
       |    list_sum(list_transform(range(1, ${d + 1}), i2 ->
       |      v[CAST(i2 AS INTEGER)] * list_sum(list_transform(range(1, ${d + 1}), j2 ->
       |        c[CAST(i2 AS INTEGER)][CAST(j2 AS INTEGER)] * v[CAST(j2 AS INTEGER)])))) AS lam
       |  FROM pi WHERE t = $pcaIters
       |), moff AS (
       |  SELECT comp, v, lam,
       |    list_sum(list_transform(range(1, ${d + 1}), i ->
       |      v[CAST(i AS INTEGER)] * m[CAST(i AS INTEGER)])) AS off,
       |    CASE WHEN lam < 1e-9 THEN 0e0 ELSE 1e0 / sqrt(lam) END AS scl
       |  FROM model, mu
       |), proj AS (
       |  SELECT e.vec_id, mo.comp,
       |    round((list_sum(list_transform(range(1, ${d + 1}), i ->
       |      e.v[CAST(i AS INTEGER)]::DOUBLE * mo.v[CAST(i AS INTEGER)])) - mo.off) * mo.scl, 4) + 0e0 AS p
       |  FROM valid e, moff mo
       |)""".stripMargin
  }

  /** X127 oracle: whitened 8-dim vectors from the shared proj CTEs,
    * then exact cosine top-k in the reduced space — the dot folds and
    * tie rule of the ANN oracles, over the ROUNDED projections (both
    * engines agree on them bit-for-bit, so the composition stays
    * hash-exact).
    */
  private def pcaTopOracle: String = {
    def dot8(a: String, b: String): String =
      s"list_sum(list_transform(range(1, ${pcaK + 1}), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)]))"
    pcaProjCtes +
    s""", rv AS (
       |  SELECT vec_id, list(p ORDER BY comp) AS rvec FROM proj GROUP BY vec_id
       |), qrv AS (
       |  SELECT vec_id AS qid, rvec AS qv FROM rv WHERE vec_id < $hnQueryIds
       |), sc AS (
       |  SELECT q.qid, c.vec_id AS nid,
       |    ${dot8("q.qv", "c.rvec")} /
       |    (sqrt(${dot8("q.qv", "q.qv")}) * sqrt(${dot8("c.rvec", "c.rvec")})) AS sim
       |  FROM rv c CROSS JOIN qrv q WHERE c.vec_id <> q.qid
       |)
       |SELECT qid, CAST(rank AS INTEGER) AS rank, nid, round(sim, 4) + 0e0 AS sim_r
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
       |  FROM sc
       |) WHERE rank <= $mmrK ORDER BY qid, rank""".stripMargin
  }

  /** X115 oracle: the MMR greedy loop as one chained-CTE replay —
    * pool (brute-force cosine shortlist, rank ≤ poolK), then per step
    * `i`: max-sim of every pool row against the selected set,
    * `λ·rel − (1−λ)·maxsim` in the op's pinned order, top-1 by
    * (mmr DESC, nid), union into the selection. Identical constants
    * via [[sqlDouble]].
    */
  private def mmrOracle: String = {
    def cosSql(a: String, b: String): String =
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
    val lam = sqlDouble(mmrLambda)
    val oneMinus = sqlDouble(1.0 - mmrLambda)
    val sb = new StringBuilder(
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |), q AS (
         |  SELECT vec_id AS qid, embedding AS qvec FROM e WHERE vec_id < $hnQueryIds
         |), sc AS (
         |  SELECT q.qid, c.vec_id AS nid, c.embedding AS nvec,
         |    ${cosSql("q.qvec", "c.embedding")} AS rel
         |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.qid
         |), p AS (
         |  SELECT qid, nid, rel, nvec FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY rel DESC, nid) AS rk
         |    FROM sc
         |  ) WHERE rk <= $mmrPoolK
         |), sel1 AS (
         |  SELECT qid, 1 AS rank, nid, rel, mmr, nvec FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, nid) AS rk
         |    FROM (SELECT *, $lam * rel - $oneMinus * 0e0 AS mmr FROM p)
         |  ) WHERE rk = 1
         |)""".stripMargin)
    for (i <- 2 to mmrK) sb ++= s""", ms$i AS (
         |  SELECT p.qid, p.nid, max(${cosSql("p.nvec", "s.nvec")}) AS maxsim
         |  FROM p JOIN sel${i - 1} s ON s.qid = p.qid
         |  GROUP BY 1, 2
         |), pick$i AS (
         |  SELECT qid, $i AS rank, nid, rel, mmr, nvec FROM (
         |    SELECT *, row_number() OVER (PARTITION BY qid ORDER BY mmr DESC, nid) AS rk
         |    FROM (
         |      SELECT p.qid, p.nid, p.rel, p.nvec,
         |        $lam * p.rel - $oneMinus * m.maxsim AS mmr
         |      FROM p JOIN ms$i m ON m.qid = p.qid AND m.nid = p.nid
         |      WHERE NOT EXISTS (
         |        SELECT 1 FROM sel${i - 1} s2 WHERE s2.qid = p.qid AND s2.nid = p.nid)
         |    )
         |  ) WHERE rk = 1
         |), sel$i AS (
         |  SELECT * FROM sel${i - 1} UNION ALL SELECT * FROM pick$i
         |)""".stripMargin
    sb ++= s"""
         |SELECT qid, rank, nid, round(rel, 4) + 0e0 AS rel_r, round(mmr, 4) + 0e0 AS mmr_r
         |FROM sel$mmrK ORDER BY qid, rank""".stripMargin
    sb.toString
  }

  /** X121 oracle: the sign matrix and 1/√outDim scale embed as
    * literals ([[sqlDouble]] / exact ±1e0), the per-row fold is the
    * same left-to-right chain.
    */
  private def jlOracle: String = {
    val scale = sqlDouble(1.0 / math.sqrt(jlOutDim.toDouble))
    val cols = (0 until jlOutDim).map { j =>
      val terms = (0 until embeddingDim).map { i =>
        val s = if (Pca.jlSign(j, i) > 0) "" else "-"
        s"${s}e.embedding[${i + 1}]::DOUBLE"
      }.mkString(" + ")
      s"round(($terms) * $scale, 4) + 0e0 AS jl${j + 1}"
    }.mkString(",\n  ")
    s"""SELECT vec_id,
       |  $cols
       |FROM (
       |  SELECT vec_id, embedding FROM embeddings
       |  WHERE embedding IS NOT NULL AND len(list_filter(embedding, x -> x IS NULL)) = 0
       |) e ORDER BY vec_id""".stripMargin
  }

  def oracleSql: Map[String, String] = Map(
    "q_pca_whiten" -> pcaOracle,
    "q_pca_topk" -> pcaTopOracle,
    "q_mmr_rerank" -> mmrOracle,
    "q_jl_project" -> jlOracle,
    "q_bitext_mine" -> {
      def cosSql(a: String, b: String): String =
        s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"
      def topAvg(side: String, other: String, avg: String): String =
        s"""  SELECT $side, CAST(sum(q) AS BIGINT)::DOUBLE / 1e9 / least(count(*), $bitextK)::DOUBLE AS $avg
           |  FROM (SELECT *, row_number() OVER (PARTITION BY $side ORDER BY sim DESC, $other) AS rk FROM s)
           |  WHERE rk <= $bitextK GROUP BY 1""".stripMargin
      s"""WITH a AS (
         |  SELECT vec_id AS a_id, embedding AS avec FROM embeddings WHERE label = 0
         |), b AS (
         |  SELECT vec_id AS b_id, embedding AS bvec FROM embeddings WHERE label = 1
         |), s AS (
         |  SELECT a_id, b_id, c AS sim, CAST(round(c * 1e9) AS BIGINT) AS q FROM (
         |    SELECT a_id, b_id, ${cosSql("avec", "bvec")} AS c FROM b CROSS JOIN a)
         |), ta AS (
         |${topAvg("a_id", "b_id", "avga")}
         |), tb AS (
         |${topAvg("b_id", "a_id", "avgb")}
         |), m AS (
         |  SELECT s.a_id, s.b_id, s.sim,
         |    s.sim / (ta.avga / ${sqlDouble(2.0)} + tb.avgb / ${sqlDouble(2.0)}) AS margin
         |  FROM s JOIN ta ON ta.a_id = s.a_id JOIN tb ON tb.b_id = s.b_id
         |), r AS (
         |  SELECT *,
         |    row_number() OVER (PARTITION BY a_id ORDER BY margin DESC, b_id) AS fw,
         |    row_number() OVER (PARTITION BY b_id ORDER BY margin DESC, a_id) AS bw
         |  FROM m
         |)
         |SELECT a_id, b_id, round(sim, 4) + 0e0 AS sim_r, round(margin, 4) + 0e0 AS margin_r
         |FROM r WHERE fw = 1 AND bw = 1 AND margin > ${sqlDouble(bitextThreshold)}
         |ORDER BY a_id""".stripMargin
    },
    "q_ngram_diversity" ->
      """WITH t AS (
        |  SELECT source, string_split(lower(text), ' ') AS toks FROM documents
        |), g AS (
        |  SELECT source, 1 AS n, unnest(toks) AS g FROM t
        |  UNION ALL
        |  SELECT source, 2 AS n,
        |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS g
        |  FROM t WHERE len(toks) >= 2
        |)
        |SELECT source, n, count(*)::BIGINT AS total_ngrams,
        |  count(DISTINCT g)::BIGINT AS distinct_ngrams,
        |  round(count(DISTINCT g)::DOUBLE / count(*), 6) AS distinct_ratio
        |FROM g GROUP BY 1, 2 ORDER BY source, n""".stripMargin,
    "q_bm25_search" -> bm25OracleSql(
      "WITH corp AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)",
      bmK),
    "q_rag_retrieval" -> bm25OracleSql(
      s"""WITH t AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
         |), st AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    unnest(generate_series(0, greatest(len(toks) - 1, 0), $chunkStep)) AS start
         |  FROM t
         |), ch AS (
         |  SELECT doc_id * 100 + (start // $chunkStep) AS doc_id,
         |    array_to_string(toks[start + 1 : least(start + $chunkTokens, n)], ' ') AS text
         |  FROM st WHERE start = 0 OR start + $chunkOverlap < n
         |), corp AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM ch
         |)""".stripMargin,
      3),
    "q_quality_classifier" ->
      s"""$classifierPreludeSql
         |SELECT doc_id, n_terms, n_matched, score_r, score_r > 0 AS is_positive
         |FROM sc ORDER BY doc_id""".stripMargin,
    "q_quality_gate" ->
      s"""$classifierPreludeSql, cut AS (
         |  SELECT round(quantile_cont(score_r, 0.75), 4) AS q0 FROM sc
         |)
         |SELECT doc_id, score_r, 'top' AS segment
         |FROM sc CROSS JOIN cut
         |WHERE score_r > q0
         |ORDER BY doc_id""".stripMargin,
    "q_t_closeness" ->
      """WITH q AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS tier
        |  FROM customer
        |), tot AS (
        |  SELECT count(*)::DOUBLE AS nt FROM q
        |), g AS (
        |  SELECT tier, count(*) AS gc FROM q GROUP BY 1
        |), cv AS (
        |  SELECT c_nationkey, c_mktsegment, tier, count(*) AS c
        |  FROM q GROUP BY 1, 2, 3
        |), cn AS (
        |  SELECT c_nationkey, c_mktsegment, tier, c,
        |    sum(c) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n
        |  FROM cv
        |), j AS (
        |  SELECT cn.*, g.gc FROM cn
        |  JOIN g ON cn.tier IS NOT DISTINCT FROM g.tier
        |), a AS (
        |  SELECT c_nationkey, c_mktsegment, max(n)::BIGINT AS n,
        |    sum(abs(c / n - gc / nt)) AS pd,
        |    sum(gc / nt) AS pm
        |  FROM j CROSS JOIN tot GROUP BY 1, 2
        |)
        |SELECT c_nationkey, c_mktsegment, n,
        |  round(0.5 * (pd + 1.0 - pm), 4) AS distance,
        |  round(0.5 * (pd + 1.0 - pm), 4) > 0.25 AS at_risk
        |FROM a ORDER BY 1, 2""".stripMargin,
    "q_hybrid_retrieval" ->
      s"""WITH tr AS (
         |  SELECT qid, doc, rank FROM (
         |    ${bm25OracleSql(
             "WITH corp AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)",
             bmK).replace("\n", "\n    ")}
         |  )
         |), vr AS (
         |  SELECT qid, nid AS doc, rank FROM (
         |    WITH e AS (
         |      SELECT vec_id, embedding FROM embeddings
         |    ), q AS (
         |      SELECT vec_id AS qid, embedding AS qvec FROM e WHERE vec_id < $bmQueryIds
         |    ), scored AS (
         |      SELECT q.qid, c.vec_id AS nid,
         |        ${dotSql("qvec", "c.embedding")} /
         |        (sqrt(${dotSql("qvec", "qvec")}) * sqrt(${dotSql("c.embedding", "c.embedding")})) AS sim
         |      FROM q JOIN e c ON c.vec_id <> q.qid
         |    )
         |    SELECT qid, nid,
         |      CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS INTEGER) AS rank
         |    FROM scored QUALIFY rank <= $bmK
         |  )
         |), u AS (
         |  SELECT qid, doc, rank FROM tr UNION ALL SELECT qid, doc, rank FROM vr
         |), f AS (
         |  SELECT qid, doc, count(*)::BIGINT AS n_lists,
         |    round(sum(1.0 / (60 + rank)), 6) AS rrf_r
         |  FROM u GROUP BY 1, 2
         |)
         |SELECT qid,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf_r DESC, doc) AS INTEGER) AS rank,
         |  doc, n_lists, rrf_r
         |FROM f QUALIFY rank <= $bmK ORDER BY qid, rank""".stripMargin,
    "q_l_diversity" ->
      """WITH q AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS tier
        |  FROM customer
        |)
        |SELECT c_nationkey, c_mktsegment, count(*)::BIGINT AS n,
        |  (count(DISTINCT tier) +
        |   max(CASE WHEN tier IS NULL THEN 1 ELSE 0 END))::BIGINT AS distinct_sensitive,
        |  (count(DISTINCT tier) +
        |   max(CASE WHEN tier IS NULL THEN 1 ELSE 0 END)) < 4 AS at_risk
        |FROM q GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q_pseudonymize" ->
      """SELECT c_custkey,
        |  CASE WHEN c_name IS NULL THEN NULL
        |       ELSE substr(md5('s3cr3t-2026|' || c_name), 1, 16) END AS c_name,
        |  c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_dp_histogram" ->
      """WITH h AS (
        |  SELECT least(greatest(CAST(floor((l_extendedprice::DOUBLE - 0.0) * 22 / 110000.0) AS BIGINT), 0), 21) AS bucket,
        |    count(*) AS n
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
        |), spine AS (
        |  SELECT unnest(range(0, 22)) AS bucket
        |), r AS (
        |  SELECT s.bucket, coalesce(h.n, 0) AS n,
        |    ((('0x' || substr(md5('dp-2026|' || s.bucket::VARCHAR), 1, 15))::BIGINT % 9007199254740992) + 0.5) / 9007199254740992.0 AS u
        |  FROM spine s LEFT JOIN h USING (bucket)
        |)
        |SELECT bucket,
        |  round(0.0 + (bucket * 110000.0) / 22, 6) AS bucket_lo,
        |  round(0.0 + ((bucket + 1) * 110000.0) / 22, 6) AS bucket_hi,
        |  round(greatest(0.0, n + (-(1.0/0.5) * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)))), 4) AS released
        |FROM r ORDER BY bucket""".stripMargin,
    "q_drift_timeline" ->
      """WITH e AS (
        |  SELECT date_trunc('week', ts) AS period,
        |    least(greatest(CAST(floor((value - 0.0) * 20 / 500.0) AS BIGINT), 0), 19) AS bucket
        |  FROM events WHERE value IS NOT NULL
        |), h AS (
        |  SELECT period, bucket, count(*) AS n FROM e GROUP BY 1, 2
        |), fp AS (
        |  SELECT min(period) AS period FROM h
        |), b AS (
        |  SELECT bucket, n AS nb FROM h JOIN fp USING (period)
        |), tbl AS (
        |  SELECT sum(nb) AS tb FROM b
        |), tp AS (
        |  SELECT period, sum(n) AS tp FROM h GROUP BY 1
        |), spine AS (
        |  SELECT p.period, g.bucket
        |  FROM (SELECT DISTINCT period FROM h) p
        |  CROSS JOIN (SELECT unnest(generate_series(0, 19))::BIGINT AS bucket) g
        |), j AS (
        |  SELECT s.period, s.bucket,
        |    (coalesce(b.nb, 0)::DOUBLE + 1) / (tbl.tb + 20) AS p,
        |    (coalesce(h.n, 0)::DOUBLE + 1) / (tp.tp + 20) AS q,
        |    coalesce(h.n, 0) AS n
        |  FROM spine s
        |  LEFT JOIN h ON h.period = s.period AND h.bucket = s.bucket
        |  LEFT JOIN b ON b.bucket = s.bucket
        |  JOIN tp ON tp.period = s.period
        |  CROSS JOIN tbl
        |)
        |SELECT period, sum(n)::BIGINT AS n, round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM j GROUP BY 1 ORDER BY period""".stripMargin,
    "q_semantic_contamination" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings
         |), b AS (
         |  SELECT vec_id AS bench_id, embedding AS bvec FROM e WHERE vec_id < $benchCut
         |), c AS (
         |  SELECT vec_id AS doc_id, embedding AS cvec FROM e WHERE vec_id >= $benchCut
         |), s AS (
         |  SELECT doc_id, bench_id,
         |    ${dotSql("cvec", "bvec")} /
         |    (sqrt(${dotSql("cvec", "cvec")}) * sqrt(${dotSql("bvec", "bvec")})) AS sim
         |  FROM c CROSS JOIN b
         |)
         |SELECT doc_id, bench_id, round(sim, 4) AS sim_r
         |FROM s WHERE sim >= $semConThreshold AND NOT isnan(sim)
         |ORDER BY doc_id, bench_id""".stripMargin,
    "q_decontaminate_semantic" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, label FROM embeddings
         |), b AS (
         |  SELECT vec_id AS bench_id, embedding AS bvec FROM e WHERE vec_id < $benchCut
         |), c AS (
         |  SELECT vec_id, embedding, label FROM e WHERE vec_id >= $benchCut
         |), hit AS (
         |  SELECT DISTINCT vec_id FROM c CROSS JOIN b
         |  WHERE ${dotSql("c.embedding", "bvec")} /
         |    (sqrt(${dotSql("c.embedding", "c.embedding")}) * sqrt(${dotSql("bvec", "bvec")}))
         |    >= $semConThreshold
         |)
         |SELECT vec_id, label FROM c
         |WHERE vec_id NOT IN (SELECT vec_id FROM hit)
         |ORDER BY vec_id""".stripMargin,
    "q_lsh_plan" ->
      """WITH cfg(k, bands) AS (VALUES (16, 8), (16, 4), (32, 8)),
        |j(jaccard) AS (VALUES (0.1), (0.2), (0.3), (0.4), (0.5),
        |                      (0.6), (0.7), (0.8), (0.9))
        |SELECT k, bands, CAST(k // bands AS INTEGER) AS rows_per_band, jaccard,
        |  round(1.0 - pow(1.0 - pow(jaccard, k // bands), bands), 4) AS p_candidate,
        |  round(pow(1.0 / bands, 1.0 / (k // bands)), 4) AS s_curve_threshold
        |FROM cfg CROSS JOIN j
        |ORDER BY k, bands, jaccard""".stripMargin,
    "q_snapshot_diff" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |), aft AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 31 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM o WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice
        |  FROM o WHERE o_orderkey % 113 = 0
        |), j AS (
        |  SELECT coalesce(b.o_orderkey, a.o_orderkey) AS o_orderkey,
        |    b.o_orderstatus AS bs, b.o_totalprice AS bv,
        |    a.o_orderstatus AS s2, a.o_totalprice AS v2,
        |    b.o_orderkey IS NULL AS nob, a.o_orderkey IS NULL AS noa
        |  FROM o b FULL OUTER JOIN aft a ON b.o_orderkey = a.o_orderkey
        |)
        |SELECT o_orderkey,
        |  CASE WHEN nob THEN 'I' WHEN noa THEN 'D' ELSE 'U' END AS change_type,
        |  CASE WHEN nob OR noa THEN '' ELSE concat_ws(',',
        |    CASE WHEN bs IS DISTINCT FROM s2 THEN 'o_orderstatus' END,
        |    CASE WHEN bv IS DISTINCT FROM v2 THEN 'o_totalprice' END) END AS changed_cols,
        |  CASE WHEN noa THEN bs ELSE s2 END AS o_orderstatus,
        |  CASE WHEN noa THEN bv ELSE v2 END AS o_totalprice
        |FROM j
        |WHERE nob OR noa OR bs IS DISTINCT FROM s2 OR bv IS DISTINCT FROM v2
        |ORDER BY o_orderkey""".stripMargin,
    "q_span_dedup" ->
      s"""$spanPreludeSql, cov AS (
         |  SELECT doc_id,
         |    greatest(e - greatest(pos, coalesce(
         |      max(e) OVER (PARTITION BY doc_id ORDER BY pos
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      pos)), 0) AS newcov
         |  FROM occ
         |), agg AS (
         |  SELECT doc_id, sum(newcov)::BIGINT AS covered_tokens,
         |    count(*)::BIGINT AS dup_grams
         |  FROM cov GROUP BY 1
         |)
         |SELECT t.doc_id, len(toks)::BIGINT AS n_tokens,
         |  coalesce(covered_tokens, 0) AS covered_tokens,
         |  coalesce(dup_grams, 0) AS dup_grams,
         |  round(coalesce(covered_tokens, 0)::DOUBLE / len(toks), 4) AS dup_ratio
         |FROM toks t LEFT JOIN agg USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q_span_strip" ->
      s"""$spanPreludeSql, cp AS (
         |  SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + ${spanW - 1})) AS p
         |  FROM occ
         |), kept AS (
         |  SELECT p.doc_id, p.pos, p.tok
         |  FROM pos p LEFT JOIN cp ON cp.doc_id = p.doc_id AND cp.p = p.pos
         |  WHERE cp.p IS NULL
         |), reb AS (
         |  SELECT doc_id, count(*)::BIGINT AS kept_tokens,
         |    string_agg(tok, ' ' ORDER BY pos) AS clean_text
         |  FROM kept GROUP BY 1
         |)
         |SELECT t.doc_id, len(toks)::BIGINT AS n_tokens,
         |  coalesce(kept_tokens, 0) AS kept_tokens,
         |  coalesce(clean_text, '') AS clean_text
         |FROM toks t LEFT JOIN reb USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q_span_self" ->
      s"""${spanGramSql("text || ' ' || array_to_string(string_split(lower(text), ' ')[1:6], ' ')")}, occ AS (
         |  SELECT doc_id, pos, pos + $spanW AS e FROM (
         |    SELECT doc_id, pos, h,
         |      count(*) OVER (PARTITION BY doc_id, h) AS occ
         |    FROM gh)
         |  WHERE occ >= 2
         |), cov AS (
         |  SELECT doc_id,
         |    greatest(e - greatest(pos, coalesce(
         |      max(e) OVER (PARTITION BY doc_id ORDER BY pos
         |                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      pos)), 0) AS newcov
         |  FROM occ
         |), agg AS (
         |  SELECT doc_id, sum(newcov)::BIGINT AS covered_tokens,
         |    count(*)::BIGINT AS rep_grams
         |  FROM cov GROUP BY 1
         |)
         |SELECT t.doc_id, len(toks)::BIGINT AS n_tokens,
         |  coalesce(covered_tokens, 0) AS covered_tokens,
         |  coalesce(rep_grams, 0) AS rep_grams,
         |  round(coalesce(covered_tokens, 0)::DOUBLE / len(toks), 4) AS rep_ratio
         |FROM toks t LEFT JOIN agg USING (doc_id)
         |ORDER BY t.doc_id""".stripMargin,
    "q_hard_negatives" ->
      s"""WITH e AS (
         |  SELECT vec_id, embedding, label FROM embeddings
         |), q AS (
         |  SELECT vec_id AS qid, embedding AS qvec, label AS qlabel
         |  FROM e WHERE vec_id < $hnQueryIds
         |), scored AS (
         |  SELECT q.qid, q.qlabel, c.vec_id AS nid, c.label AS nlabel,
         |    ${dotSql("qvec", "c.embedding")} /
         |    (sqrt(${dotSql("qvec", "qvec")}) * sqrt(${dotSql("c.embedding", "c.embedding")})) AS sim
         |  FROM q JOIN e c ON c.label <> q.qlabel
         |), ranked AS (
         |  SELECT qid, qlabel, nid, nlabel, sim,
         |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
         |  FROM scored WHERE NOT isnan(sim)
         |)
         |SELECT qid, qlabel, CAST(rank AS INTEGER) AS rank, nid, nlabel,
         |  round(sim, 4) AS sim_r
         |FROM ranked WHERE rank <= $hnK ORDER BY qid, rank""".stripMargin,
    "q_chunk_docs" ->
      s"""WITH t AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
         |), s AS (
         |  SELECT doc_id, toks, len(toks) AS n,
         |    unnest(generate_series(0, greatest(len(toks) - 1, 0), $chunkStep)) AS start
         |  FROM t
         |)
         |SELECT doc_id, CAST(start // $chunkStep AS INTEGER) AS chunk_id,
         |  CAST(start AS INTEGER) AS start_tok,
         |  CAST(least(n - start, $chunkTokens) AS INTEGER) AS chunk_tokens,
         |  array_to_string(toks[start + 1 : least(start + $chunkTokens, n)], ' ') AS chunk_text
         |FROM s WHERE start = 0 OR start + $chunkOverlap < n
         |ORDER BY doc_id, chunk_id""".stripMargin,
    "q_k_anonymity" ->
      s"""WITH qid AS ($qidSql)
         |SELECT c_nationkey, c_mktsegment, bal_band,
         |  count(*)::BIGINT AS n, count(*) < $anonK AS at_risk
         |FROM qid GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,
    "q_k_anonymity_report" ->
      s"""WITH qid AS ($qidSql), cls AS (
         |  SELECT count(*)::BIGINT AS n FROM qid
         |  GROUP BY c_nationkey, c_mktsegment, bal_band
         |)
         |SELECT min(n)::BIGINT AS k_anonymity, count(*)::BIGINT AS n_classes,
         |  sum(n)::BIGINT AS n_rows,
         |  count(CASE WHEN n < $anonK THEN 1 END)::BIGINT AS risk_classes,
         |  sum(CASE WHEN n < $anonK THEN n ELSE 0 END)::BIGINT AS risk_rows
         |FROM cls""".stripMargin
  )
}
