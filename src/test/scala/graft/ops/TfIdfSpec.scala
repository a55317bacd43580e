package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry durian")
  ).toDF("doc_id", "text")

  test("docFrequencies counts docs containing each term, not occurrences") {
    val dfreq = TfIdf.docFrequencies(docs, "text", "doc_id")
      .as[(String, Long)].collect().toMap
    assert(dfreq == Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 2L, "durian" -> 1L))
  }

  test("topTerms ranks rare terms above common ones") {
    val top1 = TfIdf.topTerms(docs, "text", "doc_id", topK = 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    // doc 1: apple appears 2/3 with df=1 — beats banana (df=2)
    assert(top1(1L) == "apple")
    // doc 3: cherry tf=2/3 df=2 vs durian tf=1/3 df=1:
    // cherry: (2/3)(ln(4/3)+1) ≈ 0.858, durian: (1/3)(ln(4/2)+1) ≈ 0.564
    assert(top1(3L) == "cherry")
  }

  test("topTerms emits at most topK rows per doc with contiguous ranks") {
    val out = TfIdf.topTerms(docs, "text", "doc_id", topK = 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("rk").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(out.forall { case (_, n, mx) => n <= 2 && mx <= 2 })
  }

  test("unigramLogProb: docs of common tokens score higher than rare-token docs") {
    val corpus = (Seq.fill(20)((0L, "common common common")) ++
      Seq((100L, "common common common"), (101L, "weird tokens here")))
      .zipWithIndex.map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TfIdf.unigramLogProb(corpus, "text", "doc_id")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    assert(out(20L) > out(21L), s"common-token doc should be less surprising: $out")
  }

  test("unigramLogProb n_tokens matches tokenization") {
    val out = TfIdf.unigramLogProb(docs, "text", "doc_id")
      .select($"doc_id", $"n_tokens").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 3L, 2L -> 2L, 3L -> 3L))
  }

  test("importanceWeights ranks target-like docs above off-domain docs") {
    val corpus = Seq(
      (1L, "law court judge ruling"),
      (2L, "law court judge appeal"),
      (3L, "pizza recipe cheese oven"),
      (4L, "law pizza court cheese")
    ).toDF("doc_id", "text")
    val target = Seq((90L, "law law court court judge ruling appeal"))
      .toDF("doc_id", "text")
    val w = TfIdf.importanceWeights(corpus, target, "text", "doc_id")
      .select($"doc_id", $"avg_logratio").as[(Long, Double)].collect().toMap
    // pure-legal docs score above the mixed doc, which scores above
    // the pure-cooking doc
    assert(w(1L) > w(4L) && w(4L) > w(3L), s"ordering wrong: $w")
    assert(w(2L) > w(3L))
  }

  test("importanceWeights smoothing keeps unseen-in-target tokens finite") {
    val corpus = Seq((1L, "never seen tokens only")).toDF("doc_id", "text")
    val target = Seq((9L, "completely different words")).toDF("doc_id", "text")
    val got = TfIdf.importanceWeights(corpus, target, "text", "doc_id")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got.size == 1)
    val (_, lr, n) = got.head
    assert(!lr.isInfinite && !lr.isNaN && n == 4L)
    // every corpus token is target-unseen: ratio must be negative
    assert(lr < 0, s"unseen tokens should score below zero: $lr")
  }

  test("bigramLogProb: exact conditional ratios, short docs emit no row") {
    val d = docs.union(Seq((4L, "solo")).toDF("doc_id", "text"))
    val got = TfIdf.bigramLogProb(d, "text", "doc_id")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // corpus bigrams: doc1 (apple banana)(banana apple), doc2
    // (banana cherry), doc3 (cherry cherry)(cherry durian) — every
    // pair unique, prefixes: apple 1, banana 2, cherry 2
    assert(got(1L) == ((math.rint(((math.log(1.0) + math.log(0.5)) / 2) * 1e4) / 1e4, 2L)))
    assert(got(2L) == ((math.rint(math.log(0.5) * 1e4) / 1e4, 1L)))
    assert(got(3L) == ((math.rint(math.log(0.5) * 1e4) / 1e4, 2L)))
    // the 1-token doc has no adjacent pair to score
    assert(!got.contains(4L))
  }

  test("bigramLogProb flags token salads that unigramLogProb misses") {
    // fluent docs repeat the same two-word collocations; the salad
    // uses the SAME vocabulary (identical unigram profile) shuffled
    // so its transitions are rare
    val fluent = (0 until 8).map(i => (i.toLong, "the cat sat on the mat"))
    val salad = Seq((99L, "mat the on sat cat the"))
    val corpus = (fluent ++ salad).toDF("doc_id", "text")
    val bi = TfIdf.bigramLogProb(corpus, "text", "doc_id")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    assert(bi(0L) > bi(99L), s"salad must score lower under the bigram model: $bi")
    val uni = TfIdf.unigramLogProb(corpus, "text", "doc_id")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    // unigram model can't separate them (same token multiset)
    assert(uni(0L) == uni(99L))
  }

  test("kneserNeyLogProb: exact driver replay, per-context normalization, salad separation") {
    val fluent = (0 until 8).map(i => (i.toLong, "the cat sat on the mat"))
    val salad = Seq((99L, "mat the on sat cat the"))
    val corpus = (fluent ++ salad).toDF("doc_id", "text")
    val D = 0.75

    // driver-side model from the corpus's bigram multiset
    val allBigrams = (fluent ++ salad).flatMap { case (_, t) =>
      val w = t.split(" "); w.zip(w.tail)
    }
    val c2 = allBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = allBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1f = c2.keys.toSeq.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n1r = c2.keys.toSeq.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val t = c2.size.toDouble
    def p(w1: String, w2: String): Double =
      (math.max(c2((w1, w2)) - D, 0.0) + D * n1f(w1) * (n1r(w2) / t)) / c1(w1)

    // (a) per-context normalization: Σ over the FULL continuation
    // vocabulary is exactly 1 — KN's defining property vs add-k
    val vocab = allBigrams.flatMap(b => Seq(b._1, b._2)).distinct
    c1.keys.foreach { w1 =>
      val total = vocab.map { w2 =>
        (math.max(c2.getOrElse((w1, w2), 0L) - D, 0.0) + D * n1f(w1) * (n1r.getOrElse(w2, 0L) / t)) / c1(w1)
      }.sum
      // mass over unseen-in-corpus continuations is 0 only if n1r
      // covers them; within the closed vocab the sum must hit 1
      assert(math.abs(total - 1.0) < 1e-9, s"context $w1 sums to $total")
    }

    // (b) engine result == driver replay, doc for doc
    val got = TfIdf.kneserNeyLogProb(corpus, "text", "doc_id")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (fluent ++ salad).foreach { case (id, text) =>
      val w = text.split(" ")
      val pairs = w.zip(w.tail)
      val expect = math.rint(pairs.map { case (a, b) => math.log(p(a, b)) }.sum / pairs.size * 1e4) / 1e4
      assert(got(id)._1 == expect && got(id)._2 == pairs.size.toLong, s"doc $id")
    }

    // (c) the salad still scores lower; and KN discounts relative to
    // the raw MLE ratio on every seen bigram (mass reserved)
    assert(got(0L)._1 > got(99L)._1)
    val mle = TfIdf.bigramLogProb(corpus, "text", "doc_id")
      .select($"doc_id", $"avg_logprob").as[(Long, Double)].collect().toMap
    assert(got(0L)._1 <= mle(0L), "KN must not exceed the unsmoothed ratio on fluent text")
    graft.CachedFrames.unpersistAll()
  }

  test("kneserNeyLogProb validates the discount") {
    intercept[IllegalArgumentException] {
      TfIdf.kneserNeyLogProb(docs, "text", "doc_id", discount = 1.0)
    }
  }

  test("invertedIndex: exact df/tf with postings bounded and ascending") {
    val idx = TfIdf.invertedIndex(docs, "text", "doc_id", maxPostings = 10)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(idx("apple") == ((1L, 2L, "1")))     // df counts docs, tf occurrences
    assert(idx("banana") == ((2L, 2L, "1,2")))
    assert(idx("cherry") == ((2L, 3L, "2,3")))
    assert(idx("durian") == ((1L, 1L, "3")))
    graft.CachedFrames.unpersistAll()
    // the bound truncates postings to the LOWEST ids but leaves df/tf exact
    val wide = spark.range(0, 100).select(
      col("id").as("doc_id"), lit("shared unique" + "x").as("text"))
    val bounded = TfIdf.invertedIndex(wide, "text", "doc_id", maxPostings = 3)
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._4))).toMap
    assert(bounded("shared") == ((100L, "0,1,2")))
    graft.CachedFrames.unpersistAll()
  }

  test("bm25Search: the doc containing all query terms outranks partial matches") {
    val corpus = Seq(
      (1L, "spark shuffle partition exchange broadcast"),
      (2L, "spark streaming watermark state store"),
      (3L, "duckdb vectorized execution pipeline"),
      (4L, "shuffle partition skew salt"),
      (5L, "unrelated words entirely here now")
    ).toDF("doc_id", "text")
    val queries = Seq((10L, "spark shuffle partition")).toDF("query_id", "qtext")
    val r = TfIdf.bm25Search(corpus, queries, "text", "doc_id", "query_id", "qtext", k = 3)
      .orderBy("rank").select("doc", "n_terms").as[(Long, Long)].collect().toSeq
    // doc 1 matches all 3 terms; docs 2 and 4 match subsets
    assert(r.head == ((1L, 3L)))
    assert(r.map(_._1).toSet == Set(1L, 2L, 4L))
    graft.CachedFrames.unpersistAll()
  }

  test("bm25Search: length normalization prefers the shorter of two equal-tf docs") {
    val corpus = Seq(
      (1L, "target term here"),
      (2L, "target term here padded with many extra unrelated words making it long"),
      (3L, "filler filler filler")
    ).toDF("doc_id", "text")
    val queries = Seq((1L, "target")).toDF("query_id", "qtext")
    val r = TfIdf.bm25Search(corpus, queries, "text", "doc_id", "query_id", "qtext", k = 2)
      .orderBy("rank").select("doc").as[Long].collect().toSeq
    assert(r == Seq(1L, 2L), "same tf, shorter doc must score higher (b > 0)")
    graft.CachedFrames.unpersistAll()
  }

  test("bm25Search validates params and bounds output to k") {
    val corpus = Seq((1L, "a b"), (2L, "a c"), (3L, "a d")).toDF("doc_id", "text")
    val queries = Seq((1L, "a")).toDF("query_id", "qtext")
    assert(TfIdf.bm25Search(corpus, queries, "text", "doc_id", "query_id", "qtext", k = 2)
      .count() == 2)
    intercept[IllegalArgumentException] {
      TfIdf.bm25Search(corpus, queries, "text", "doc_id", "query_id", "qtext", k = 0)
    }
    intercept[IllegalArgumentException] {
      TfIdf.bm25Search(corpus, queries, "text", "doc_id", "query_id", "qtext", k = 1, b = 1.5)
    }
    graft.CachedFrames.unpersistAll()
  }

  test("log-odds classifier separates the corpora it was trained on") {
    val pos = Seq(
      (1L, "clean prose with careful structure"),
      (2L, "careful clean writing and prose"),
      (3L, "structure and careful prose here")
    ).toDF("doc_id", "text")
    val neg = Seq(
      (11L, "spam spam click here buy"),
      (12L, "buy click spam offer now"),
      (13L, "offer now buy spam click")
    ).toDF("doc_id", "text")
    val model = TfIdf.trainTokenLogOdds(pos, neg, "text", "doc_id")
    // vocabulary is the UNION: one-sided terms carry smoothed weights
    val wts = model.as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(wts("prose") > 0 && wts("spam") < 0)
    assert(wts.contains("structure") && wts.contains("offer"))
    val scored = TfIdf.scoreTokenLogOdds(pos.union(neg), model, "text", "doc_id")
      .select("doc_id", "is_positive").as[(Long, Boolean)].collect().toMap
    assert(Seq(1L, 2L, 3L).forall(scored(_)))
    assert(Seq(11L, 12L, 13L).forall(!scored(_)))
  }

  test("log-odds scoring: out-of-vocabulary terms contribute zero, not a crash") {
    val pos = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val neg = Seq((2L, "gamma delta")).toDF("doc_id", "text")
    val model = TfIdf.trainTokenLogOdds(pos, neg, "text", "doc_id")
    val r = TfIdf.scoreTokenLogOdds(
        Seq((9L, "alpha unseen tokens everywhere")).toDF("doc_id", "text"),
        model, "text", "doc_id")
      .head()
    assert(r.getAs[Long]("n_terms") == 4L && r.getAs[Long]("n_matched") == 1L)
    // score is exactly alpha's weight: ln((1+1)/(1+2)) - ln((0+1)/(1+2))
    val expected = math.log(2.0 / 3.0) - math.log(1.0 / 3.0)
    assert(math.abs(r.getAs[Double]("score_r") - expected) < 1e-3)
    assert(r.getAs[Boolean]("is_positive"))
  }

  test("fused partitioned classifier equals the generic train∘score composition") {
    // VERDICT r14 #4: the fused path exists to cut three corpus
    // tokenizations to one; it must be RESULT-identical to the
    // generic pair when pos/neg partition the scored corpus.
    val docs = Seq(
      (1L, "en", "clean prose with careful structure"),
      (2L, "en", "careful clean writing and prose"),
      (3L, "de", "spam spam click here buy"),
      (4L, "de", "buy click spam offer now"),
      (5L, "de", "")  // zero-token doc still counts toward class size
    ).toDF("doc_id", "lang", "text")
    val generic = TfIdf.scoreTokenLogOdds(
        docs,
        TfIdf.trainTokenLogOdds(
          docs.filter(col("lang") === "en"),
          docs.filter(col("lang") =!= "en"), "text", "doc_id"),
        "text", "doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSet
    val fused = TfIdf.classifyTokenLogOddsPartitioned(
        docs, col("lang") === "en", "text", "doc_id")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSet
    graft.CachedFrames.unpersistAll()
    // the empty doc yields no token rows in either path (no score row)
    assert(fused == generic, s"fused=$fused\ngeneric=$generic")
    // NULL flag counts as negative, mirroring the generic neg frame
    val withNull = Seq((1L, "alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
      .withColumn("flag", when(col("doc_id") === 1L, lit(true)))
    val scored = TfIdf.classifyTokenLogOddsPartitioned(
        withNull, col("flag"), "text", "doc_id")
      .select("doc_id", "is_positive").as[(Long, Boolean)].collect().toMap
    graft.CachedFrames.unpersistAll()
    assert(scored(1L) && !scored(2L))
  }

  test("rrfFuse: agreement wins, one-list candidates still surface, k0 damps rank gaps") {
    val listA = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("qid", "doc", "rank")
    val listB = Seq((1L, 11L, 1), (1L, 13L, 2), (1L, 10L, 3)).toDF("qid", "doc", "rank")
    val fused = TfIdf.rrfFuse(Seq(listA, listB), topK = 4)
      .orderBy("rank").as[(Long, Int, Long, Long, Double)].collect().toSeq
    // doc 11: 1/62 + 1/61 ≈ .032526 beats doc 10: 1/61 + 1/63 ≈ .032262
    assert(fused.map(_._3) == Seq(11L, 10L, 13L, 12L))
    // both-list docs carry n_lists = 2, single-list docs 1
    assert(fused.map(f => f._3 -> f._4).toMap == Map(11L -> 2L, 10L -> 2L, 13L -> 1L, 12L -> 1L))
    // exact score of the winner: round(1/62 + 1/61, 6)
    assert(fused.head._5 == BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rrfFuse bounds output per query and validates inputs") {
    val l = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 10L, 1)).toDF("qid", "doc", "rank")
    val fused = TfIdf.rrfFuse(Seq(l, l), topK = 1)
    assert(fused.count() == 2) // one row per query
    intercept[IllegalArgumentException] { TfIdf.rrfFuse(Seq(), topK = 1) }
    intercept[IllegalArgumentException] { TfIdf.rrfFuse(Seq(l), topK = 0) }
    intercept[IllegalArgumentException] { TfIdf.rrfFuse(Seq(l), topK = 1, k0 = 0) }
  }

  test("rag composition: chunk → index → retrieve finds the distinctive chunk first") {
    // the contract behind q_rag_retrieval, on a corpus where relevance
    // is unambiguous: each doc's SECOND chunk region carries
    // doc-distinctive terms, so a query for them must retrieve a chunk
    // of that doc at rank 1 — and specifically a chunk PAST the first,
    // proving retrieval operates at chunk granularity, not doc
    // granularity. (The q_rag_retrieval oracle covers exactness on the
    // shared-vocabulary corpus; this spec covers the semantics.)
    val docs = (0 until 5).map { i =>
      val filler = (0 until 12).map(j => s"filler$j common words").mkString(" ")
      val distinctive = s"marker${i}a marker${i}b marker${i}c"
      (i.toLong, s"$filler $distinctive $filler")
    }.toDF("doc_id", "text")
    val chunks = Curation.chunkDocuments(docs, "text", "doc_id", 20, 5)
      .select((col("doc_id") * 100 + col("chunk_id")).as("chunk_uid"), col("chunk_text"))
    val q = (0 until 5).map(i => (i.toLong, s"marker${i}a marker${i}c"))
      .toDF("query_id", "qtext")
    val top1 = TfIdf.bm25Search(chunks, q, "chunk_text", "chunk_uid", "query_id", "qtext", k = 1)
      .select("qid", "doc").as[(Long, Long)].collect()
    assert(top1.length == 5)
    top1.foreach { case (qid, chunkUid) =>
      assert(chunkUid / 100 == qid, s"query $qid retrieved chunk $chunkUid of doc ${chunkUid / 100}")
      assert(chunkUid % 100 > 0, s"query $qid matched chunk 0 — markers sit past the first chunk")
    }
    graft.CachedFrames.unpersistAll()
  }

  test("tokenJsDivergence: identical → 0, disjoint → 1 bit, exact quantized replay") {
    val a = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    // identical distributions (same corpus twice) → exactly 0
    val same = TfIdf.tokenJsDivergence(a, a, "text", "doc_id").head()
    assert(same.getDouble(3) == 0.0)
    assert(same.getLong(0) == 3L && same.getLong(1) == 5L && same.getLong(2) == 5L)
    // disjoint vocabularies → exactly 1 bit
    val b = Seq((1L, "p q"), (2L, "q r r")).toDF("doc_id", "text")
    val disj = TfIdf.tokenJsDivergence(a, b, "text", "doc_id").head()
    assert(disj.getDouble(3) == 1.0)
    assert(disj.getLong(0) == 6L)
    // exact replay of the quantized arithmetic on a hand case:
    // a = {x:2, y:1}, b = {x:1, y:2}
    val a2 = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b2 = Seq((1L, "x y y")).toDF("doc_id", "text")
    def contrib(pa: Double, pb: Double): Long = {
      val m = (pa + pb) / 2.0
      val nats = 0.5 * ((if (pa > 0) pa * math.log(pa / m) else 0.0) +
        (if (pb > 0) pb * math.log(pb / m) else 0.0))
      math.round(nats * 1e9)
    }
    val expQ = contrib(2.0 / 3, 1.0 / 3) + contrib(1.0 / 3, 2.0 / 3)
    val expBits = math.rint(expQ / 1e9 / 0.6931471805599453 * 1e6) / 1e6
    val got = TfIdf.tokenJsDivergence(a2, b2, "text", "doc_id").head()
    assert(got.getDouble(3) == expBits)
    assert(got.getDouble(3) > 0.05 && got.getDouble(3) < 0.15, "x↔y swap is a mild shift")
  }

  test("tokenJsDivergence: an empty side degrades to NULL, never a silent 0") {
    val a = Seq((1L, "x y")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val r = TfIdf.tokenJsDivergence(a, empty, "text", "doc_id").head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 0L)
    assert(r.isNullAt(3), "undefined divergence must be NULL")
    val both = TfIdf.tokenJsDivergence(empty, empty, "text", "doc_id").head()
    assert(both.getLong(0) == 0L && both.isNullAt(3))
  }

  test("divergingTerms: one-sided terms outrank shared ones; k bounds; validation") {
    // "spam" floods corpus b only; "x"/"y" are near-identical filler
    val a = Seq((1L, "x y x y x")).toDF("doc_id", "text")
    val b = Seq((1L, "x y x y spam spam spam")).toDF("doc_id", "text")
    val top = TfIdf.divergingTerms(a, b, "text", "doc_id", k = 2)
      .orderBy(col("contrib_bits").desc, col("term")).collect()
    assert(top.length == 2)
    assert(top(0).getString(0) == "spam", "the one-sided token drives the divergence")
    assert(top(0).getLong(1) == 0L && top(0).getLong(2) == 3L)
    assert(top(0).getDouble(3) > top(1).getDouble(3))
    intercept[IllegalArgumentException] {
      TfIdf.divergingTerms(a, b, "text", "doc_id", k = 0)
    }
  }
}
