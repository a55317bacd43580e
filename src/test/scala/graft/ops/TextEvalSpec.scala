package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextEvalSpec extends SparkSpec {
  import spark.implicits._

  // the textbook BLEU example family: candidate repeats a reference
  // word — clipping must cap the unigram credit at the reference count
  private val rows = Seq(
    // id, candidate, reference
    (1L, "the the the the", "the cat sat"),           // clip: p1 = 1/4
    (2L, "the cat sat", "the cat sat"),               // identical: all 1.0
    (3L, "a b c d", "e f g h"),                       // disjoint: all 0
    (4L, "the cat", "the cat sat on the mat")         // short cand, full recall miss
  ).toDF("id", "cand", "ref")

  test("clipped precision, ROUGE recall/F1, and the sqrt BLEU match hand computation") {
    val out = TextEval.ngramOverlap(rows, "id", $"cand", $"ref")
      .collect().map(r => r.getAs[Long]("id") -> r).toMap

    val clip = out(1L)
    assert(clip.getAs[Double]("p1") == 0.25) // "the" clipped at ref count 1
    assert(clip.getAs[Double]("r1") == math.round(1.0 / 3.0 * 1e4) / 1e4)
    assert(clip.getAs[Double]("p2") == 0.0)  // "the the" never in ref

    val same = out(2L)
    assert(same.getAs[Double]("p1") == 1.0 && same.getAs[Double]("p2") == 1.0)
    assert(same.getAs[Double]("r1") == 1.0 && same.getAs[Double]("f1") == 1.0)
    assert(same.getAs[Double]("len_ratio") == 1.0)
    // 3 tokens: p3 = 1/1, no 4-grams on either side -> p4 NULL
    assert(same.getAs[Double]("p3") == 1.0)
    assert(same.isNullAt(same.fieldIndex("p4")))
    // smoothed bleu of a perfect 3-token candidate: every
    // (ov_n+1)/(ct_n+1) term is 1 (including the gram-less n=4), so
    // the composite is exactly 1
    assert(same.getAs[Double]("bleu_sqrt") == 1.0)

    val disj = out(3L)
    assert(disj.getAs[Double]("p1") == 0.0 && disj.getAs[Double]("f1") == 0.0)
    // smoothed: ((1/5)*(1/4)*(1/3)*(1/2))^(1/4)
    val exp = math.sqrt(math.sqrt((1.0 / 5.0) * (1.0 / 4.0) * (1.0 / 3.0) * (1.0 / 2.0)))
    assert(disj.getAs[Double]("bleu_sqrt") == math.round(exp * 1e4) / 1e4)

    val short = out(4L)
    assert(short.getAs[Double]("p1") == 1.0) // both cand tokens in ref
    assert(short.getAs[Double]("r1") == math.round(2.0 / 6.0 * 1e4) / 1e4)
    assert(short.getAs[Double]("len_ratio") == math.round(2.0 / 6.0 * 1e4) / 1e4)
  }

  test("ngramOverlap is partitioning-independent and validates its inputs") {
    val a = TextEval.ngramOverlap(rows, "id", $"cand", $"ref")
      .collect().map(_.toSeq).toSet
    val b = TextEval.ngramOverlap(rows.repartition(7), "id", $"cand", $"ref")
      .collect().map(_.toSeq).toSet
    assert(a == b)
    // NULL candidate rows are excluded, not scored
    val withNull = rows.unionByName(
      Seq((9L, null.asInstanceOf[String], "x")).toDF("id", "cand", "ref"))
    assert(TextEval.ngramOverlap(withNull, "id", $"cand", $"ref")
      .filter($"id" === 9L).count() == 0)
    intercept[IllegalArgumentException] {
      TextEval.ngramOverlap(rows.withColumn("p1", lit(1)), "id", $"cand", $"ref")
    }
    intercept[IllegalArgumentException] {
      TextEval.ngramOverlap(rows, "id", $"cand", $"ref", maxN = 0)
    }
  }

  test("editSimilarity: exact Levenshtein, normalized score, degenerate inputs") {
    val pairs = Seq(
      (1L, "kitten", "sitting"), // classic distance 3
      (2L, "same", "same"),
      (3L, "", ""),              // both empty: similarity 1 by convention
      (4L, "abc", "")
    ).toDF("id", "a", "b")
    val got = TextEval.editSimilarity(pairs, Seq("id"), $"a", $"b")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("edit_dist"), r.getAs[Double]("edit_sim"))).toMap
    assert(got(1L) == (3L, math.round((1.0 - 3.0 / 7.0) * 1e4) / 1e4))
    assert(got(2L) == (0L, 1.0))
    assert(got(3L) == (0L, 1.0))
    assert(got(4L) == (3L, 0.0))
    intercept[IllegalArgumentException] {
      TextEval.editSimilarity(pairs.withColumn("edit_sim", lit(1)), Seq("id"), $"a", $"b")
    }
  }
}
