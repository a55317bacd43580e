package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X85 duplicated-span accounting/stripping
  * ([[Dedup.spanDuplication]] / [[Dedup.stripDuplicatedSpans]]): the
  * correctness burden is the INTERVAL UNION — overlapping duplicated
  * grams must not double-count positions — plus order-preserving
  * reassembly after the strip.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  /** Docs 0 and 1 share the 6-token run "alpha beta gamma delta
    * epsilon zeta" embedded in otherwise-unique text; doc 2 is
    * unrelated; doc 3 is 3 tokens — shorter than the 4-token window.
    * With w=4 the shared run yields 3 duplicated grams per doc at
    * consecutive starts (positions p, p+1, p+2) whose intervals
    * overlap pairwise — union = 6 tokens, NOT 3×4 = 12.
    */
  private def corpus = Seq(
    (0L, "one two alpha beta gamma delta epsilon zeta three four five"),
    (1L, "six seven eight alpha beta gamma delta epsilon zeta nine ten"),
    (2L, "totally unrelated words about query engines and columnar storage"),
    (3L, "too short doc")
  ).toDF("doc_id", "text")

  test("spanDuplication: overlapping duplicated grams union, not sum") {
    val r = Dedup.spanDuplication(corpus, "text", "doc_id", windowTokens = 4)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("covered_tokens"),
         x.getAs[Long]("dup_grams"), x.getAs[Double]("dup_ratio"))).toMap
    assert(r(0L) == ((11L, 6L, 3L, 0.5455)))
    assert(r(1L) == ((11L, 6L, 3L, 0.5455)))
    assert(r(2L) == ((9L, 0L, 0L, 0.0)))
    // < w tokens: no gram can exist, so nothing is duplicated
    assert(r(3L) == ((3L, 0L, 0L, 0.0)))
  }

  test("spanDuplication: disjoint duplicated runs both count") {
    // shared run at the START and at the END, unique middle
    val docs = Seq(
      (0L, "alpha beta gamma delta unique0 middle0 words0 omega psi chi phi"),
      (1L, "alpha beta gamma delta unique1 middle1 words1 omega psi chi phi")
    ).toDF("doc_id", "text")
    val r = Dedup.spanDuplication(docs, "text", "doc_id", windowTokens = 4)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("covered_tokens")).toMap
    // two disjoint 4-token unions
    assert(r(0L) == 8L && r(1L) == 8L)
  }

  test("spanDuplication: minDocs raises the duplication bar") {
    val three = Seq(
      (0L, "common run alpha beta gamma delta end0 x0"),
      (1L, "common run alpha beta gamma delta end1 x1"),
      (2L, "other text entirely here now today ok yes")
    ).toDF("doc_id", "text")
    val atTwo = Dedup.spanDuplication(three, "text", "doc_id", windowTokens = 4, minDocs = 2L)
      .filter(col("covered_tokens") > 0).count()
    val atThree = Dedup.spanDuplication(three, "text", "doc_id", windowTokens = 4, minDocs = 3L)
      .filter(col("covered_tokens") > 0).count()
    assert(atTwo == 2 && atThree == 0)
  }

  test("stripDuplicatedSpans removes exactly the covered run, order intact") {
    val r = Dedup.stripDuplicatedSpans(corpus, "text", "doc_id", windowTokens = 4)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("kept_tokens"), x.getAs[String]("clean_text"))).toMap
    assert(r(0L) == ((5L, "one two three four five")))
    assert(r(1L) == ((5L, "six seven eight nine ten")))
    assert(r(2L)._1 == 9L)
    assert(r(3L) == ((3L, "too short doc")))
  }

  test("stripDuplicatedSpans: a fully-duplicated doc survives as empty, not dropped") {
    val twins = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")
    val r = Dedup.stripDuplicatedSpans(twins, "text", "doc_id", windowTokens = 4)
    assert(r.count() == 2)
    val row = r.filter(col("doc_id") === 0L).head()
    assert(row.getAs[Long]("kept_tokens") == 0L)
    assert(row.getAs[String]("clean_text") == "")
  }

  test("span ops are partitioning-independent") {
    val expected = Dedup.spanDuplication(corpus, "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id").collect().toSeq
    val shuffled = Dedup.spanDuplication(
        corpus.repartition(7, col("text")), "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id").collect().toSeq
    assert(expected == shuffled)
    val e2 = Dedup.stripDuplicatedSpans(corpus, "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id").collect().toSeq
    val s2 = Dedup.stripDuplicatedSpans(
        corpus.repartition(7, col("text")), "text", "doc_id", windowTokens = 4)
      .orderBy("doc_id").collect().toSeq
    assert(e2 == s2)
  }

  test("spanSelfRepetition: intra-doc repeats union; unrepeated docs report zero") {
    val docs = Seq(
      // "a b c d" occurs at pos 0 and pos 5 → union [0,4) ∪ [5,9) = 8 of 10
      (0L, "a b c d x a b c d y"),
      (1L, "all distinct tokens here without any repetition at all")
    ).toDF("doc_id", "text")
    val r = Dedup.spanSelfRepetition(docs, "text", "doc_id", windowTokens = 4)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("covered_tokens"),
         x.getAs[Long]("rep_grams"), x.getAs[Double]("rep_ratio"))).toMap
    assert(r(0L) == ((10L, 8L, 2L, 0.8)))
    assert(r(1L) == ((9L, 0L, 0L, 0.0)))
  }

  test("spanSelfRepetition: a degenerate loop covers the whole doc") {
    val loop = Seq((0L, "spam spam spam spam spam")).toDF("doc_id", "text")
    val r = Dedup.spanSelfRepetition(loop, "text", "doc_id", windowTokens = 2).head()
    assert(r.getAs[Long]("covered_tokens") == 5L && r.getAs[Double]("rep_ratio") == 1.0)
    // at minOccurrences above the actual repeat count, nothing flags
    val r3 = Dedup.spanSelfRepetition(
      Seq((0L, "a b c d x a b c d y")).toDF("doc_id", "text"),
      "text", "doc_id", windowTokens = 4, minOccurrences = 3L).head()
    assert(r3.getAs[Long]("covered_tokens") == 0L)
  }

  test("spanSelfRepetition plans entirely inside the per-doc partitioning") {
    // the occurrence-count window keys on (id, gram) and the union
    // window on id — both satisfied by the one explicit id exchange;
    // a second hash exchange would mean the plan broke the claim
    val docs = Seq((0L, "a b c d a b c d")).toDF("doc_id", "text")
    val plan = Dedup.spanSelfRepetition(docs, "text", "doc_id", windowTokens = 4)
      .queryExecution.executedPlan.toString
    val joinSide = "Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).size
    // one exchange for the gram build (explicit repartition), one for
    // the final n_tokens join's left side at most
    assert(joinSide <= 2, s"unexpected doc_id exchanges:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(__gh"),
      s"no gram-hash shuffle may exist in the self-repetition plan:\n$plan")
  }

  test("span ops validate their knobs") {
    intercept[IllegalArgumentException] {
      Dedup.spanDuplication(corpus, "text", "doc_id", windowTokens = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.spanDuplication(corpus, "text", "doc_id", minDocs = 1L)
    }
    intercept[IllegalArgumentException] {
      Dedup.stripDuplicatedSpans(corpus, "text", "doc_id", minDocs = 0L)
    }
    intercept[IllegalArgumentException] {
      Dedup.spanSelfRepetition(corpus, "text", "doc_id", minOccurrences = 1L)
    }
  }
}
