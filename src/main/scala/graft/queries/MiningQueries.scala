package graft.queries

import graft.Tables
import graft.ops.{Curation, Dedup, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
  private val anonK = 5L

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
  private def spanPreludeSql: String = {
    val leads = (1 until spanW)
      .map(j => s"lead(tok, $j) OVER w")
      .mkString(" || ' ' || ")
    s"""WITH d AS (
       |  SELECT doc_id, $spanTextSql AS raw FROM documents
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
       |), dup AS (
       |  SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS nd FROM gh GROUP BY 1)
       |  WHERE nd >= 2
       |), occ AS (
       |  SELECT doc_id, pos, pos + $spanW AS e FROM gh
       |  WHERE h IN (SELECT h FROM dup)
       |)""".stripMargin
  }

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
        .withColumn("sim_r", round(col("sim"), 4)).drop("sim")
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
    })
  )

  def oracleSql: Map[String, String] = Map(
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
         |  FROM scored
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
