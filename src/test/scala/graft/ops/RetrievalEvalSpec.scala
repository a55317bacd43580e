package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalEvalSpec extends SparkSpec {
  import spark.implicits._

  // k=2 fixture, hand-derived:
  //   q1 truth: A g=3, B g=2, C g=1 (n_relevant 3, IDCG@2 = 3 + 2/log2(3))
  //   q1 results: rank1=B (hit, g=2), rank2=D (miss), rank3=A (beyond k)
  //     → recall 1/3, MRR 1/1, DCG = 2, nDCG = 2 / 4.2618595… = 0.4693
  //   q2 truth: X g=1; no result rows → all-zero metrics row
  //   q3 appears only in results → not evaluated
  private def truth = Seq(
    ("q1", "A", 3.0), ("q1", "B", 2.0), ("q1", "C", 1.0),
    ("q2", "X", 1.0),
    ("q1", "Z", 0.0) // non-positive grade: dropped
  ).toDF("qid", "doc", "grade")

  private def results = Seq(
    ("q1", "B", 1), ("q1", "D", 2), ("q1", "A", 3),
    ("q3", "A", 1)
  ).toDF("qid", "doc", "rank")

  test("hand-computed recall/MRR/nDCG at k=2, zero row for unanswered query") {
    val out = RetrievalEval.retrievalMetrics(
        results, truth, "qid", "doc", "rank", "grade", k = 2)
      .orderBy("qid")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(out.length == 2) // q3 has no truth → not evaluated
    val q1 = out(0)
    assert(q1 == (("q1", 3L, 1L, 0.3333, 1.0, 0.4693)), s"q1 was $q1")
    val q2 = out(1)
    assert(q2 == (("q2", 1L, 0L, 0.0, 0.0, 0.0)), s"q2 was $q2")
  }

  test("perfect ranking scores 1.0 everywhere; reversed ranking degrades nDCG only") {
    val t = Seq(("q", "A", 2.0), ("q", "B", 1.0)).toDF("qid", "doc", "grade")
    val perfect = Seq(("q", "A", 1), ("q", "B", 2)).toDF("qid", "doc", "rank")
    val pr = RetrievalEval.retrievalMetrics(perfect, t, "qid", "doc", "rank", "grade", 2)
      .select("recall_r", "mrr_r", "ndcg_r").as[(Double, Double, Double)].head()
    assert(pr == ((1.0, 1.0, 1.0)), s"perfect was $pr")
    val reversed = Seq(("q", "B", 1), ("q", "A", 2)).toDF("qid", "doc", "rank")
    val rr = RetrievalEval.retrievalMetrics(reversed, t, "qid", "doc", "rank", "grade", 2)
      .select("recall_r", "mrr_r", "ndcg_r").as[(Double, Double, Double)].head()
    // both docs found (recall 1), first result is relevant (MRR 1),
    // but the graded order is wrong → nDCG < 1
    assert(rr._1 == 1.0 && rr._2 == 1.0 && rr._3 < 1.0, s"reversed was $rr")
  }

  test("deterministic under repartitioning; knob validation") {
    val a = RetrievalEval.retrievalMetrics(
        results, truth, "qid", "doc", "rank", "grade", k = 2)
      .collect().map(_.toString).sorted.toSeq
    val b = RetrievalEval.retrievalMetrics(
        results.repartition(7), truth.repartition(3), "qid", "doc", "rank", "grade", k = 2)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      RetrievalEval.retrievalMetrics(results, truth, "qid", "doc", "rank", "grade", k = 0)
    }
  }

  test("evaluation cost is query-set-shaped: no corpus scan, two grouped aggs") {
    val plan = RetrievalEval.retrievalMetrics(
        results, truth, "qid", "doc", "rank", "grade", k = 2)
      .queryExecution.executedPlan.toString
    // per-query metrics must not plan a window over the whole corpus
    // or a sort-based agg — hash aggs + joins only
    assert(!plan.contains("SortAggregate"), plan)
  }
}
