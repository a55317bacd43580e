package graft.ops

import graft.SparkSpec

class DatasheetSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    ("s1", "en", "a b c"),
    ("s1", "en", "a b c"), // exact dup
    ("s1", "de", "x y"),
    ("s2", null.asInstanceOf[String], "hello") // all-NULL langs source
  ).toDF("source", "lang", "text")

  test("hand-computed datasheet row; all-NULL-lang source survives with NULL mode") {
    val out = Datasheet.corpusDatasheet(corpus, "source", "text", "lang")
      .orderBy("source").collect()
    assert(out.length == 2)
    val s1 = out(0)
    assert(s1.getAs[Long]("n_docs") == 3L)
    assert(s1.getAs[Long]("n_tokens") == 8L)
    assert(s1.getAs[Double]("avg_tokens_r") == 2.6667)
    assert(s1.getAs[Double]("p50_tokens") == 3.0)
    assert(s1.getAs[Long]("n_langs") == 2L)
    assert(s1.getAs[String]("top_lang") == "en")
    assert(s1.getAs[Double]("top_lang_share_r") == 0.6667)
    assert(s1.getAs[Double]("exact_dup_rate_r") == 0.3333)
    val s2 = out(1)
    assert(s2.getAs[Long]("n_docs") == 1L && s2.getAs[Long]("n_langs") == 0L)
    assert(s2.isNullAt(s2.fieldIndex("top_lang")))
    assert(s2.isNullAt(s2.fieldIndex("top_lang_share_r")))
    assert(s2.getAs[Double]("exact_dup_rate_r") == 0.0)
  }

  test("mode tie breaks deterministically by language; dup rate sees whitespace variants as distinct") {
    val tied = Seq(
      ("s", "de", "one two"), ("s", "en", "one  two")).toDF("source", "lang", "text")
    val row = Datasheet.corpusDatasheet(tied, "source", "text", "lang").head()
    assert(row.getAs[String]("top_lang") == "de") // (count desc, lang asc)
    // "one two" vs "one  two" are different bytes: exact dedup keeps both
    assert(row.getAs[Double]("exact_dup_rate_r") == 0.0)
    // double space yields an empty token: 2 + 3 tokens
    assert(row.getAs[Long]("n_tokens") == 5L)
  }
}
