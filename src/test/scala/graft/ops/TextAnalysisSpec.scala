package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats: hand-computed values on a known sentence") {
    val df = Seq((1L, "The cat, the hat 42!")).toDF("id", "text")
    val row = df
      .select(col("id") +: TextAnalysis.stats(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    assert(row.getAs[Long]("n_chars") == 20L)
    // tokens: the / cat, / the / hat / 42!
    assert(row.getAs[Long]("n_tokens") == 5L)
    assert(row.getAs[Long]("n_types") == 4L)
    // alpha chars: Thecatthehat = 12 of 20
    assert(row.getAs[Double]("alpha_ratio") == 0.6)
    // token lengths 3+4+3+3+3 = 16 / 5
    assert(row.getAs[Double]("avg_token_len") == 3.2)
    // BPE-ish: The cat , the hat 42 ! = 7
    assert(row.getAs[Long]("bpe_tokens") == 7L)
  }

  test("langId: stopword profiles pick the dominant language, und for none") {
    val df = Seq(
      (1L, "the cat sat of the mat and a dog"),
      (2L, "le chat et la table des idées"),
      (3L, "qqq www zzz")).toDF("id", "text")
    val got = df.select(col("id"), TextAnalysis.langId(col("text")).as("lang"))
      .orderBy("id").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "en"), (2L, "fr"), (3L, "und")))
  }

  test("langId tie-break is first profile in order") {
    // "de" scores 1 for both fr and es → fr wins (earlier profile).
    val got = Seq(Tuple1("de xyz")).toDF("text")
      .select(TextAnalysis.langId(col("text"))).head().getString(0)
    assert(got == "fr")
  }

  test("shingles: n-grams for long docs, whole text for short ones") {
    val df = Seq(Tuple1("a b c d")).toDF("text")
    val sh = df.select(TextAnalysis.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val short = Seq(Tuple1("Hi there")).toDF("text")
      .select(TextAnalysis.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(short == Seq("hi there"))
  }

  test("qualityPredicate bands") {
    val df = Seq(
      (1L, Array.fill(10)("words").mkString(" ")), // good
      (2L, "too short"),                           // < 5 tokens
      (3L, Array.fill(10)("!!!!!").mkString(" "))  // no alpha
    ).toDF("id", "text")
    val stats = df.select(
      col("id") +: TextAnalysis.stats(col("text")).map { case (n, c) => c.as(n) }: _*)
    val got = stats
      .select(col("id"),
        TextAnalysis.qualityPredicate(
          col("n_tokens"), col("alpha_ratio"), col("avg_token_len")).as("q"))
      .orderBy("id").as[(Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, true), (2L, false), (3L, false)))
  }

  test("winnowing: shared long substring implies shared fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"cccc dddd $shared eeee"),
      (3L, "completely unrelated content with no overlap at all here")
    ).toDF("id", "text")
    val pairs = TextAnalysis.winnowingFingerprints(df, "id", "text", k = 8, w = 4)
      .as[(Long, Long)].collect()
    val fps = (1L to 3L).map(i => pairs.filter(_._1 == i).map(_._2).toSet)
    // winnowing guarantee: a shared substring of length >= k+w-1 (11)
    // yields at least one shared fingerprint
    assert((fps(0) & fps(1)).nonEmpty, "docs sharing a 44-char substring share no fingerprint")
    assert((fps(0) & fps(2)).size < fps(0).size / 2, "unrelated docs overlap too much")
    // short doc (< k chars) still fingerprints (whole text)
    val short = TextAnalysis.winnowingFingerprints(
        Seq((9L, "tiny")).toDF("id", "text"), "id", "text", 8, 4)
      .collect()
    assert(short.length == 1)
  }

  test("repetitionProfile: hand-computed fractions and the repetitive cut") {
    val df = Seq(
      (1L, "spam spam spam spam"),             // one token 4×, one bigram 3×
      (2L, "all four words differ")            // no repetition at all
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.repetitionProfile(df, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Double]("top_token_frac") == 1.0)
    assert(rows(0).getAs[Double]("dup_token_frac") == 0.75)    // 4 occurrences, 1 distinct
    assert(rows(0).getAs[Double]("top_bigram_frac") == 1.0)    // "spam spam" 3×
    assert(rows(0).getAs[Double]("dup_bigram_frac") == round2(2.0 / 3.0))
    assert(rows(0).getAs[Boolean]("is_repetitive"))
    assert(rows(1).getAs[Double]("top_token_frac") == 0.25)
    assert(rows(1).getAs[Double]("dup_token_frac") == 0.0)
    assert(rows(1).getAs[Double]("dup_bigram_frac") == 0.0)
    assert(!rows(1).getAs[Boolean]("is_repetitive"))
  }

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("oovRate: exact out-of-vocabulary counts, vocab column validated") {
    val docs = Seq(
      (1L, "a b c d"),   // c, d out of vocab
      (2L, "a a b"),     // fully covered
      (3L, "x y")        // fully out
    ).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("token")
    val got = TextAnalysis.oovRate(docs, "text", "doc_id", vocab)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 2L, 0.5)))
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((2L, 2L, 1.0)))
    // duplicate vocab rows must not double-count matched tokens
    val dup = Seq("a", "a", "b").toDF("token")
    assert(TextAnalysis.oovRate(docs, "text", "doc_id", dup)
      .filter(col("doc_id") === 2L).select("n_tokens").as[Long].head() == 3L)
    intercept[IllegalArgumentException] {
      TextAnalysis.oovRate(docs, "text", "doc_id", vocab.toDF("word"))
    }
  }

  test("encodeTokens: order preserved, OOV as -1, repeats share one id") {
    val docs = Seq(
      (1L, "b a b z a"),
      (2L, "z z")
    ).toDF("doc_id", "text")
    val vocab = Seq(("a", 1), ("b", 2)).toDF("token", "rank")
    val got = TextAnalysis.encodeTokens(docs, "text", "doc_id", vocab)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("2,1,2,-1,1", 5L, 1L)))
    assert(got(2L) == (("-1,-1", 2L, 2L)))
    // order survives adversarial partitioning
    val shuffled = TextAnalysis.encodeTokens(
        docs.repartition(7), "text", "doc_id", vocab)
      .filter(col("doc_id") === 1L).select("ids").as[String].head()
    assert(shuffled == "2,1,2,-1,1")
    intercept[IllegalArgumentException] {
      TextAnalysis.encodeTokens(docs, "text", "doc_id", vocab.select("token"))
    }
  }

  test("h64 and baseHash are stable and non-negative") {
    val df = Seq(Tuple1("hello")).toDF("x")
    val r1 = df.select(
      TextAnalysis.h64(lit(0), col("x")),
      TextAnalysis.baseHash(col("x"))).head()
    val r2 = df.select(
      TextAnalysis.h64(lit(0), col("x")),
      TextAnalysis.baseHash(col("x"))).head()
    assert(r1 == r2)
    assert(r1.getLong(0) >= 0 && r1.getLong(1) >= 0)
    assert(r1.getLong(1) < (1L << 28))
  }

  test("ngramDiversity: hand-computed distinct-1/distinct-2; short docs contribute no bigrams") {
    val docs = Seq(
      ("tpl", "buy now buy now"), // 4 unigrams {buy, now}; 3 bigrams {buy now, now buy}
      ("tpl", "buy now"),         // 2 unigrams; 1 bigram {buy now}
      ("var", "alpha beta gamma"),// 3 distinct unigrams; 2 distinct bigrams
      ("var", "delta"))           // 1 unigram; no bigram (shorter than n)
      .toDF("source", "text")
    val out = TextAnalysis.ngramDiversity(docs, "text", Seq("source"))
      .orderBy("source", "n")
      .select("source", "n", "total_ngrams", "distinct_ngrams", "distinct_ratio")
      .as[(String, Int, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("tpl", 1, 6L, 2L, 0.333333),
      ("tpl", 2, 4L, 2L, 0.5),
      ("var", 1, 4L, 4L, 1.0),
      ("var", 2, 2L, 2L, 1.0)))
    // the template-stamped source is separable by its cratered ratios
    assert(out(0)._5 < out(2)._5 && out(1)._5 < out(3)._5)
  }

  test("ngramDiversity is one scan: a single explode feeds every n") {
    val docs = Seq(("s", "a b c")).toDF("source", "text")
    val plan = TextAnalysis.ngramDiversity(docs, "text", Seq("source"), Seq(1, 2, 3))
      .queryExecution.executedPlan.toString
    // one Generate (explode) node, no union of per-n scans
    assert("Generate".r.findAllIn(plan).size == 1, s"one explode expected:\n$plan")
    assert(!plan.contains("Union"), s"no per-n scan union expected:\n$plan")
    intercept[IllegalArgumentException] {
      TextAnalysis.ngramDiversity(docs, "text", Seq("source"), Seq(0))
    }
  }
}
