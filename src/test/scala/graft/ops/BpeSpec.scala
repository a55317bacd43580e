package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X105 BPE tokenizer induction ([[Bpe]]): the distributed trainer
  * replays the textbook algorithm exactly (driver reference), stays
  * deterministic, encodes unseen text as a pure projection, and the
  * iteration cost is vocabulary-sized.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook reference BPE on a word-count map: pair counts
    * weighted by word frequency, argmax by (count desc, pair asc),
    * left-to-right non-overlapping merge — the authority the
    * relational trainer must match merge for merge.
    */
  private def refBpe(
      words: Map[String, Long], nMerges: Int): (Seq[(Int, String, Long)], Map[String, Seq[String]]) = {
    var segs: Map[String, (Vector[String], Long)] =
      words.map { case (w, n) => w -> (w.map(_.toString).toVector, n) }
    val merges = Seq.newBuilder[(Int, String, Long)]
    var step = 0
    var continue = true
    while (step < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      segs.values.foreach { case (s, n) =>
        s.zip(s.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) continue = false
      else {
        step += 1
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
        merges += ((step, s"$a $b", cnt))
        segs = segs.map { case (w, (s, n)) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
            else { out += s(i); i += 1 }
          }
          w -> (out.result(), n)
        }
      }
    }
    (merges.result(), segs.map { case (w, (s, _)) => w -> s })
  }

  private val docs = Seq(
    (0L, "low low low low low lower lower newest newest"),
    (1L, "newest newest newest newest widest widest widest lower low"),
    // banana/aaaa force OVERLAPPING pair occurrences — the round-15
    // review find: a single-space padded replace merged every other
    // eligible position (banana → b an a n a); the double-space
    // representation must match the textbook scan (b an an a)
    (2L, "the newest widest low the the banana banana aaaa anana")).toDF("doc_id", "text")

  private def wordMap =
    Bpe.wordCounts(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("train matches the textbook reference merge for merge, segmentations included") {
    val (expMerges, expSegs) = refBpe(wordMap, 10)
    val (merges, vocab) = Bpe.train(docs, "text", 10)
    assert(merges.map(m => (m.step, m.pair, m.cnt)) == expMerges)
    val gotSegs = vocab.select("word", "sym").collect()
      .map(r => r.getString(0) -> r.getString(1).split("  ").toSeq).toMap
    assert(gotSegs == expSegs)
    // deterministic retrain
    val (merges2, _) = Bpe.train(docs, "text", 10)
    assert(merges2 == merges)
    graft.CachedFrames.unpersistAll()
  }

  test("the classic first merges come out: frequent pairs win, ties break by pair string") {
    // "e s" appears in newest(7) + widest(4) = 11 — the clear winner;
    // the reference decides every later tie the same way the engine does
    val (merges, _) = Bpe.train(docs, "text", 3)
    assert(merges.head.pair == "e s" && merges.head.cnt == 11L)
    graft.CachedFrames.unpersistAll()
  }

  test("encode segments unseen text with the learned merges, as a shuffle-free projection") {
    val (merges, _) = Bpe.train(docs, "text", 6)
    val unseen = Seq((9L, "slowest newlow bananas")).toDF("doc_id", "text")
    val enc = Bpe.encode(unseen, "text", merges)
    val got = enc.select("bpe_tokens").head().getSeq[String](0)
    // driver replay on the unseen words — the textbook greedy scan
    // (left-to-right non-overlapping merge on the symbol vector)
    val expected = Seq("slowest", "newlow", "bananas").flatMap { w =>
      var s = w.map(_.toString).toVector
      merges.foreach { m =>
        val Array(a, b) = m.pair.split(" ", 2)
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += a + b; i += 2 }
          else { out += s(i); i += 1 }
        }
        s = out.result()
      }
      s
    }
    assert(got == expected, s"$got vs $expected")
    // merged symbols only where the learned pairs occur
    assert(got.forall(_.nonEmpty))
    val plan = enc.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    graft.CachedFrames.unpersistAll()
  }

  test("early stop: once every word is a single symbol there is nothing to merge") {
    val tiny = Seq((0L, "ab ab ab")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(tiny, "text", 10)
    assert(merges.size == 1 && merges.head.pair == "a b")
    assert(vocab.select("sym").head().getString(0) == "ab")
    graft.CachedFrames.unpersistAll()
  }

  test("fertility: hand-checked per-group ratios; zero-word groups degrade to NULL") {
    // one merge learned: (x y) — "xy"→1 subword, "xyz"→2, "q"→1
    val d = Seq(
      (0L, "g1", "xy xyz q"),
      (1L, "g2", "xy xy"),
      (2L, "g3", "")
    ).toDF("doc_id", "lang", "text")
    try {
      val (merges, _) = Bpe.train(d, "text", 1)
      assert(merges.head.pair == "x y")
      val rows = Bpe.fertility(d, "text", merges, "lang").orderBy("lang").collect()
      // g1: 3 words, 1+2+1 = 4 subwords, 6 chars
      assert(rows(0).getLong(1) == 3L && rows(0).getLong(2) == 4L)
      assert(rows(0).getDouble(3) == math.rint(4.0 / 3.0 * 1e6) / 1e6)
      assert(rows(0).getDouble(4) == 1.5)
      // g2: fully merged — fertility exactly 1, 2 chars per subword
      assert(rows(1).getLong(1) == 2L && rows(1).getDouble(3) == 1.0)
      assert(rows(1).getDouble(4) == 2.0)
      // g3: no words → NULL ratios, not a division error
      assert(rows(2).getLong(1) == 0L && rows(2).isNullAt(3) && rows(2).isNullAt(4))
      intercept[IllegalArgumentException] {
        Bpe.fertility(d.withColumnRenamed("lang", "fertility"), "text", merges, "fertility")
      }
    } finally graft.CachedFrames.unpersistAll()
  }

  test("CLI: bpe-train persists the model atomically; bpe-encode replays it exactly") {
    val dir = java.nio.file.Files.createTempDirectory("bpecli").toString
    docs.write.mode("overwrite").parquet(s"$dir/corpus")
    val cachesBefore = graft.CachedFrames.size
    val mergesTable = graft.Main.run(spark, Map("pipeline" -> "bpe-train",
      "input" -> s"$dir/corpus", "store_dir" -> s"$dir/store", "n_merges" -> "6"))
    // the one-shot CLI path releases its generations as it goes — a
    // session running many trainings must not pin one frame per merge
    assert(graft.CachedFrames.size == cachesBefore)
    assert(mergesTable.count() == 6)
    assert(new java.io.File(s"$dir/store/model/merges.parquet").exists())
    assert(!new java.io.File(s"$dir/store/model.next").exists())
    // retrain swaps over the live model instead of failing
    graft.Main.run(spark, Map("pipeline" -> "bpe-train",
      "input" -> s"$dir/corpus", "store_dir" -> s"$dir/store", "n_merges" -> "6"))
    assert(!new java.io.File(s"$dir/store/model.old").exists())
    val out = graft.Main.run(spark, Map("pipeline" -> "bpe-encode",
      "input" -> s"$dir/corpus", "store_dir" -> s"$dir/store", "output" -> s"$dir/enc"))
    // store round-trip ≡ the in-memory encode, token for token
    val (m, _) = Bpe.train(docs, "text", 6)
    val direct = Bpe.encode(docs, "text", m).select("doc_id", "bpe_tokens")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaStore = out.select("doc_id", "bpe_tokens")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaStore == direct)
    graft.CachedFrames.unpersistAll()
  }

  test("knob validation and cache hygiene") {
    intercept[IllegalArgumentException] { Bpe.train(docs, "text", 0) }
    val before = graft.CachedFrames.size
    val (m, _) = Bpe.train(docs, "text", 2)
    // train registers nMerges+1 vocabulary-sized generations (all
    // reclaimed at unpersistAll) so a deterministic retrain becomes
    // pure cache reads — the three q_bpe_* queries share ONE training
    assert(graft.CachedFrames.size == before + 3)
    val (m2, _) = Bpe.train(docs, "text", 2)
    assert(m2 == m && graft.CachedFrames.size == before + 3,
      "retrain must reuse the registered generations, not add more")
    intercept[IllegalArgumentException] {
      Bpe.encode(docs.withColumn("bpe_tokens", lit(1)), "text", m)
    }
    graft.CachedFrames.unpersistAll()
  }
}
