package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded fixture: 0 and 1 are exact copies; 2 is a near-dup of 0
    * (one token changed); 3 and 4 are unrelated.
    */
  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (3L, "completely different content about spark query engines and columnar io"),
    (4L, "yet another unrelated document discussing benchmark design tradeoffs here")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per identical content") {
    val survivors = Dedup.dedupExact(corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 2L, 3L, 4L))
    val groups = Dedup.exactDupGroups(corpus, "text", "doc_id")
      .filter(col("n_copies") > 1).head()
    assert(groups.getAs[Long]("survivor_id") == 0L)
    assert(groups.getAs[Long]("n_copies") == 2L)
  }

  test("minhash signatures: identical texts share signatures; near-dups mostly agree") {
    val sigs = Dedup.signatures(corpus, "text", "doc_id")
      .orderBy("doc_id").collect()
    val s = sigs.map(_.getSeq[Long](1))
    assert(s(0) == s(1)) // exact copies → identical signature
    val agree02 = s(0).zip(s(2)).count { case (a, b) => a == b }
    val agree03 = s(0).zip(s(3)).count { case (a, b) => a == b }
    assert(agree02 > 8, s"near-dup should agree on most slots, got $agree02/16")
    assert(agree03 <= 2, s"unrelated docs should rarely agree, got $agree03/16")
  }

  test("LSH near-dup pairs find the seeded pairs and nothing else") {
    val pairs = Dedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("dedupNear keeps the minimum id of each near-dup cluster") {
    val kept = Dedup.dedupNear(corpus, "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 3L, 4L))
  }

  test("verifiedNearDupPairs reports exact jaccard on candidates") {
    val got = Dedup.verifiedNearDupPairs(corpus, "text", "doc_id", threshold = 0.3)
      .orderBy("a", "b").collect()
    val exact = got.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(exact.getAs[Double]("jaccard") == 1.0)
    val near = got.find(r => r.getLong(0) == 0L && r.getLong(1) == 2L).get
    // one token changed in 14 → 3 of 12 distinct shingles differ per side
    assert(near.getAs[Double]("jaccard") > 0.4 && near.getAs[Double]("jaccard") < 1.0)
  }

  test("simhash: equal for copies, close for near-dups, far for unrelated") {
    val fp = Dedup.simhash(corpus, "text", "doc_id").orderBy("doc_id")
      .as[(Long, Long)].collect().map(_._2)
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fp(0) == fp(1))
    assert(hamming(fp(0), fp(2)) < 15, s"near-dup hamming ${hamming(fp(0), fp(2))}")
    assert(hamming(fp(0), fp(3)) > 15, s"unrelated hamming ${hamming(fp(0), fp(3))}")
  }

  test("simhashNearDupPairs finds low-hamming pairs via chunk buckets") {
    val fpDf = Dedup.simhash(corpus, "text", "doc_id")
    val pairs = Dedup.simhashNearDupPairs(fpDf, "doc_id", maxHamming = 10)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.exists { case (a, b) => b == 3L || b == 4L })
  }

  test("fast hasher path produces the same near-dup structure") {
    val pairs = Dedup.nearDupPairs(
        corpus, "text", "doc_id",
        threshold = 0.5, baseHasher = TextAnalysis.fastBaseHash)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }
}
