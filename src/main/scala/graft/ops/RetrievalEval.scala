package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Retrieval-quality metrics — recall@k / MRR / nDCG@k per query —
  * over any ranked result set with a graded ground-truth set: the
  * missing evaluation leg of the retrieval stack (BM25 `q_bm25_search`,
  * LSH ANN `q_ann_topk`, hybrid RRF `q_hybrid_retrieval` all produce
  * rankings; `q_ann_recall` checks overlap only). Every retrieval
  * system ships with exactly this eval loop.
  *
  * Exactness contract (oracle-replayable like the rest of the ANN
  * family): DCG terms use ln(rank+1)/ln2 with [[Ln2]] embedded as the
  * SAME double literal in both engines, each term is quantized to a
  * long (`round(term·1e9)`) so the per-query sums are order-free
  * integer sums, and nDCG divides the two quantized sums directly
  * (the 1e9 scale cancels). MRR and recall are exact rationals.
  *
  * Scale shape: both inputs are (query, doc) frames bounded by
  * queryset × k rows — two map-side-combined grouped aggregations and
  * one broadcast-size join keyed on the query id. No scan of the
  * corpus itself: evaluation cost is independent of corpus size.
  */
object RetrievalEval {

  /** ln 2, embedded as the same double literal in op and oracle. */
  val Ln2: Double = 0.6931471805599453

  /** Per-query retrieval metrics of `results` against `truth`.
    *
    * @param results system ranking: (queryCol, docCol, rankCol),
    *                rank 1-based; rows with rank > k are ignored
    * @param truth   graded relevance: (queryCol, docCol, gradeCol),
    *                grade > 0 (non-positive grades are dropped);
    *                queries absent from `truth` are not evaluated.
    *                (query, doc) pairs must be UNIQUE — a duplicated
    *                truth row would double-count its DCG term and
    *                inflate n_relevant, the same contract every
    *                qrels-format eval tool assumes
    * @param k       evaluation cutoff
    * @return one row per truth query:
    *         (queryCol, n_relevant, n_hits, recall_r, mrr_r, ndcg_r)
    *         where recall_r = hits/|truth| (so it caps below 1 when
    *         |truth| > k), mrr_r = 1/rank of the first relevant hit
    *         (0 when none), ndcg_r = DCG@k/IDCG@k with linear gains
    */
  def retrievalMetrics(
      results: DataFrame,
      truth: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      gradeCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val res = results.select(
        col(queryCol).as("__q"), col(docCol).as("__d"),
        col(rankCol).cast("int").as("__rk"))
      .filter(col("__rk") <= k)
    val tru = truth.select(
        col(queryCol).as("__q"), col(docCol).as("__d"),
        col(gradeCol).cast("double").as("__g"))
      .filter(col("__g") > 0)
    // quantized DCG term at 1-based position `pos` with gain `g`:
    // g / log2(pos+1) = g·ln2 / ln(pos+1), rounded to integer 1e-9 units
    def dcgTermQ(g: org.apache.spark.sql.Column, pos: org.apache.spark.sql.Column) =
      roundPinned(g * lit(Ln2) / log(pos.cast("double") + lit(1.0)) * lit(1e9)).cast("long")
    // ideal ordering: grades descending, doc id as the deterministic tie
    val idealW = Window.partitionBy(col("__q")).orderBy(col("__g").desc, col("__d"))
    val ideal = tru
      .withColumn("__i", row_number().over(idealW))
      .groupBy(col("__q"))
      .agg(
        count(lit(1)).as("n_relevant"),
        sum(when(col("__i") <= k, dcgTermQ(col("__g"), col("__i")))).as("__idcgq"))
    val hits = res.join(tru, Seq("__q", "__d"))
      .groupBy(col("__q"))
      .agg(
        count(lit(1)).as("n_hits"),
        min(col("__rk")).as("__minrk"),
        sum(dcgTermQ(col("__g"), col("__rk"))).as("__dcgq"))
    ideal.join(hits, Seq("__q"), "left")
      .select(
        col("__q").as(queryCol),
        col("n_relevant"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        roundPinned(coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_relevant").cast("double"), 4).as("recall_r"),
        roundPinned(when(col("__minrk").isNull, lit(0.0))
          .otherwise(lit(1.0) / col("__minrk").cast("double")), 4).as("mrr_r"),
        // quantized-sum ratio: the 1e9 scales cancel; IDCG > 0 by the
        // positive-grade filter, try_divide guards the empty edge
        roundPinned(try_divide(
          coalesce(col("__dcgq"), lit(0L)).cast("double"),
          col("__idcgq").cast("double")), 4).as("ndcg_r"))
  }
}
