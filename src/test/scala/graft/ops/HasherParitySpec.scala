package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** VERDICT r16 #6: every hash-dependent ORACLE runs the md5 backbone
  * ([[TextAnalysis.h64]]/[[TextAnalysis.baseHash]]), but the
  * PRODUCTION default is xxhash64 ([[TextAnalysis.fastH64]]/
  * [[TextAnalysis.fastBaseHash]]) — so a fast-path regression could
  * hide behind green oracle rows forever. This family runs the
  * flagship hash-dependent ops under BOTH hashers and pins the
  * result-shape invariants that must hold regardless of which hash
  * drives the decision: split weights, sample sizes, group integrity,
  * planted near-dup recall, determinism under repartitioning.
  */
class HasherParitySpec extends SparkSpec {
  import spark.implicits._

  private val md5H: (Column, Column) => Column = TextAnalysis.h64
  private val fastH: (Column, Column) => Column = TextAnalysis.fastH64
  private val hashers = Seq("md5" -> md5H, "xxhash64" -> fastH)

  test("assignSplit: weights, totality, and retry-determinism under both hashers") {
    val ids = (0L until 5000L).toDF("id")
    for ((name, h) <- hashers) {
      val out = Curation.assignSplit(
        ids, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), hasher = h)
      val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
      // every row lands in exactly one split
      assert(counts.values.sum == 5000L, s"[$name] rows lost: $counts")
      // a 10k-bucket hash split over 5000 ids: ±3% absolute tolerance
      assert(math.abs(counts("train") - 4000L) < 150, s"[$name] $counts")
      assert(math.abs(counts("val") - 500L) < 150, s"[$name] $counts")
      assert(math.abs(counts("test") - 500L) < 150, s"[$name] $counts")
      // pure function of (id, seed): identical under any partitioning
      val a = out.select("id", "split").as[(Long, String)].collect().toMap
      val b = Curation.assignSplit(
          ids.repartition(13), "id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), hasher = h)
        .select("id", "split").as[(Long, String)].collect().toMap
      assert(a == b, s"[$name] split decisions moved under repartitioning")
    }
  }

  test("assignSplitBy: group integrity holds under both hashers") {
    val rows = (0L until 2000L).map(i => (i, s"domain${i % 97}")).toDF("id", "domain")
    for ((name, h) <- hashers) {
      val out = Curation.assignSplitBy(
        rows, "domain", Seq("train" -> 0.9, "test" -> 0.1), hasher = h)
      val splitsPerGroup = out.groupBy("domain")
        .agg(countDistinct(col("split")).as("n")).agg(max("n")).as[Long].head()
      assert(splitsPerGroup == 1L, s"[$name] a group straddled splits")
    }
  }

  test("stratifiedSample: per-stratum rates within tolerance under both hashers") {
    val rows = (0L until 6000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("id", "lang")
    for ((name, h) <- hashers) {
      val kept = Curation.stratifiedSample(
          rows, "id", "lang", Seq("en" -> 0.5, "de" -> 0.1), hasher = h)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      // 3000 per stratum; binomial 4σ ≈ 110 at p=.5, 65 at p=.1
      assert(math.abs(kept("en") - 1500L) < 160, s"[$name] en=${kept("en")}")
      assert(math.abs(kept.getOrElse("de", 0L) - 300L) < 120, s"[$name] de=${kept.get("de")}")
    }
  }

  test("samplePerGroup: exactly min(k, group size) rows under both hashers") {
    val rows = (0L until 900L).map(i => (i, s"g${i % 9}")).toDF("id", "g") // 100/group
      .unionByName(Seq((9000L, "tiny"), (9001L, "tiny")).toDF("id", "g"))
    for ((name, h) <- hashers) {
      val sizes = Curation.samplePerGroup(rows, "id", "g", k = 7, hasher = h)
        .groupBy("g").count().as[(String, Long)].collect().toMap
      assert(sizes.filter(_._1 != "tiny").values.forall(_ == 7L), s"[$name] $sizes")
      assert(sizes("tiny") == 2L, s"[$name] $sizes")
    }
  }

  /** Planted near-dup corpus: `nBase` distinct documents, the first
    * `nDup` of which get a copy with one token swapped — Jaccard well
    * above the 0.5 threshold, so EVERY planted pair must surface no
    * matter which hash family drives MinHash/LSH.
    */
  private def plantedCorpus(nBase: Int, nDup: Int): (DataFrame, Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(42)
    val vocab = Vector.tabulate(400)(i => s"w$i")
    val base = (0 until nBase).map { i =>
      (i.toLong, Seq.fill(30)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (0 until nDup).map { i =>
      val toks = base(i)._2.split(" ")
      toks(rnd.nextInt(toks.length)) = "swapped"
      ((nBase + i).toLong, toks.mkString(" "))
    }
    ((base ++ dups).toDF("doc_id", "text"),
      (0 until nDup).map(i => (i.toLong, (nBase + i).toLong)).toSet)
  }

  test("nearDupPairs: planted pairs are recovered under both base hashers") {
    val (corpus, planted) = plantedCorpus(nBase = 120, nDup = 25)
    val pairSets = for ((name, bh) <- Seq(
        "md5" -> (TextAnalysis.baseHash(_)),
        "xxhash64" -> (TextAnalysis.fastBaseHash(_)))) yield {
      val pairs = Dedup.nearDupPairs(
          corpus, "text", "doc_id", threshold = 0.5, baseHasher = bh)
        .select("a", "b").as[(Long, Long)].collect().toSet
      val missed = planted -- pairs
      assert(missed.isEmpty, s"[$name] planted near-dups missed: $missed")
      // 30-token docs from a 400-word vocab: unrelated pairs share few
      // shingles, so estimates ≥0.5 beyond the planted set are a hash
      // pathology, not noise
      val spurious = pairs -- planted
      assert(spurious.size <= 2, s"[$name] spurious pairs: $spurious")
      name -> pairs
    }
    // Both hashers see the same corpus; their decisions may differ on
    // borderline estimates but must agree on the planted core.
    val Seq((_, a), (_, b)) = pairSets
    assert((a & b).size >= planted.size)
  }

  test("dedupNear survivor counts agree between hashers on the planted corpus") {
    val (corpus, planted) = plantedCorpus(nBase = 120, nDup = 25)
    val counts = for ((name, bh) <- Seq(
        "md5" -> (TextAnalysis.baseHash(_)),
        "xxhash64" -> (TextAnalysis.fastBaseHash(_)))) yield {
      val n = Dedup.dedupNear(
        corpus, "text", "doc_id", threshold = 0.5, baseHasher = bh).count()
      // every planted dup drops; borderline noise can cost at most the
      // spurious allowance above
      assert(n <= (120 + 25 - planted.size) && n >= 120 - 2, s"[$name] survivors=$n")
      n
    }
    assert(math.abs(counts.head - counts.last) <= 2,
      s"hashers disagree beyond borderline noise: $counts")
  }
}
