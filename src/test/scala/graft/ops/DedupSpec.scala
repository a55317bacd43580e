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

  test("normalized dedup collapses case/punctuation/whitespace variants only") {
    val variants = Seq(
      (0L, "The quick, brown fox!"),
      (1L, "the  quick brown fox"),     // same normal form as 0
      (2L, "THE QUICK BROWN FOX?!?"),   // same normal form as 0
      (3L, "the quick brown foxes"),    // real wording change — distinct
      (4L, "  unrelated   text...  ")
    ).toDF("doc_id", "text")
    val survivors = Dedup.dedupExactNormalized(variants, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 3L, 4L))
    val g = Dedup.normalizedDupGroups(variants, "text", "doc_id")
      .filter(col("n_copies") > 1).head()
    assert(g.getAs[Long]("survivor_id") == 0L && g.getAs[Long]("n_copies") == 3L)
    // byte-exact dedup would keep all five — normalization is the delta
    assert(Dedup.dedupExact(variants, "text", "doc_id").count() == 5)
    // digits survive normalization (versioned content stays distinct)
    val nums = Seq((0L, "version 2"), (1L, "version 3")).toDF("doc_id", "text")
    assert(Dedup.dedupExactNormalized(nums, "text", "doc_id").count() == 2)
  }

  test("minhash signatures: identical texts share signatures; near-dups mostly agree") {
    val sigs = Dedup.signatures(corpus, "text", "doc_id")
      .orderBy("doc_id").collect()
    val s = sigs.map(_.getSeq[Long](1))
    assert(s(0) == s(1)) // exact copies → identical signature
    // docs 0/2 share 9 of 15 distinct shingles (J = 0.6) → expected
    // slot agreement 9.6/16; the actual deterministic draw with the
    // default hasher is 8. ≥6 separates near-dup from unrelated (≤2)
    // with margin while staying robust to hasher/constant changes.
    val agree02 = s(0).zip(s(2)).count { case (a, b) => a == b }
    val agree03 = s(0).zip(s(3)).count { case (a, b) => a == b }
    assert(agree02 >= 6, s"near-dup should agree on most slots, got $agree02/16")
    assert(agree03 <= 2, s"unrelated docs should rarely agree, got $agree03/16")
    assert(agree02 > agree03)
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

  test("dedupNearBy keeps the highest-priority copy, not the min id") {
    // priorities invert the id order inside the near-dup cluster
    // {0,1,2}: doc 2 is "best", so 0 and 1 must drop where dedupNear
    // would keep 0. Unrelated docs keep their rows regardless of
    // priority.
    val withPrio = corpus.withColumn("prio",
      when(col("doc_id") === 2, lit(100L))
        .when(col("doc_id") === 1, lit(50L))
        .otherwise(lit(10L)))
    val kept = Dedup.dedupNearBy(withPrio, "text", "doc_id", col("prio"), threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"kept=$kept")
    // equal priorities: the larger id of each pair loses — reduces to
    // keep-min-id, matching dedupNear on the same corpus
    val flat = corpus.withColumn("prio", lit(1L))
    val keptFlat = Dedup.dedupNearBy(flat, "text", "doc_id", col("prio"), threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val keptMin = Dedup.dedupNear(corpus, "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptFlat == keptMin)
  }

  test("dedupNearBy treats NULL priority as lowest, by policy not accident") {
    // Cluster {0,1,2}: doc 0 has NULL priority and must lose to BOTH
    // known-priority docs even though the 1-vs-2 comparison alone
    // would drop 1 — doc 0's unknown quality cannot win a pair.
    val nullLoses = corpus.withColumn("prio",
      when(col("doc_id") === 0, lit(null).cast("long"))
        .when(col("doc_id") === 2, lit(100L))
        .otherwise(lit(50L)))
    val kept = Dedup.dedupNearBy(nullLoses, "text", "doc_id", col("prio"), threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"kept=$kept")
    // All-NULL priorities: every pair falls to the id tie rule, so the
    // op degrades to dedupNear's keep-min-id — never to "drop nothing".
    val allNull = corpus.withColumn("prio", lit(null).cast("long"))
    val keptAllNull = Dedup.dedupNearBy(allNull, "text", "doc_id", col("prio"), threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(keptAllNull == Set(0L, 3L, 4L), s"kept=$keptAllNull")
  }

  test("dedupNearBy shares the pair pipeline with dedupNear (no new cache entries)") {
    // priority being an expression (not a pre-added column) keeps the
    // corpus frame identical across the dedup family, so keep-best
    // rides the exact persistOnce entries keep-min already registered
    graft.CachedFrames.unpersistAll()
    Dedup.dedupNear(corpus, "text", "doc_id", threshold = 0.5).count()
    val entries = graft.CachedFrames.size
    Dedup.dedupNearBy(corpus, "text", "doc_id", length(col("text")), threshold = 0.5)
      .count()
    assert(graft.CachedFrames.size == entries,
      "keep-best must reuse the shared signature/pair frames, not re-register them")
  }

  test("incremental dedup screens an increment against a parquet signature store") {
    // History {0, 1} lives ONLY as persisted signatures; the increment
    // {2, 3, 4} contains one near-dup of history (doc 2) and two new
    // docs. The store round-trips through parquet — the actual crawl-
    // cycle storage — before the band join.
    val storeDir = java.nio.file.Files.createTempDirectory("sigstore").toString
    Dedup.signatures(corpus.filter(col("doc_id") < 2), "text", "doc_id")
      .write.mode("overwrite").parquet(storeDir)
    val store = spark.read.parquet(storeDir)
    val increment = corpus.filter(col("doc_id") >= 2)
    val pairs = Dedup.nearDupPairsAgainst(
      increment, "text", "doc_id", store, "doc_id", threshold = 0.5)
    assert(pairs.select("old_id", "new_id").as[(Long, Long)].collect().toSet
      == Set((0L, 2L), (1L, 2L)))
    // keep-old-drop-new: the near-dup of history drops, genuinely new
    // docs survive; history itself is untouched by construction.
    val kept = Dedup.dedupIncrement(
        increment, "text", "doc_id", store, "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L))
    // the updated store absorbs exactly the survivors
    val next = Dedup.updatedSignatureStore(
      store, "doc_id", increment, "text", "doc_id", threshold = 0.5)
    assert(next.select("doc_id").as[Long].collect().toSet == Set(0L, 1L, 3L, 4L))
  }

  test("exact incremental dedup screens against a parquet fingerprint store") {
    // History {0, 1} persists only 16-byte fingerprints; the increment
    // re-crawls doc 0's exact content under a new id (5) plus a near-
    // dup (2) and fresh docs (3, 4). Exact screening drops ONLY the
    // exact copy — near-dups are the signature store's job.
    val recrawl = corpus.union(Seq(
      (5L, "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("doc_id", "text"))
    val storeDir = java.nio.file.Files.createTempDirectory("fpstore").toString
    Dedup.exactFingerprintStore(recrawl.filter(col("doc_id") < 2), "text")
      .write.mode("overwrite").parquet(storeDir)
    val store = spark.read.parquet(storeDir)
    assert(store.columns.toSeq == Seq("fingerprint") && store.count() == 1)
    val kept = Dedup.dedupExactAgainst(
        recrawl.filter(col("doc_id") >= 2), "text", store)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L), s"kept=$kept")
  }

  test("incremental dedup degenerate inputs: empty store, empty increment, tiny docs") {
    // First crawl ever: the store is empty — nothing can match, the
    // whole increment survives, and the updated store IS the
    // increment's signatures. (An empty frame with the right schema,
    // exactly what reading a just-created store location yields.)
    val fullStore = Dedup.signatures(corpus, "text", "doc_id").localCheckpoint()
    val emptyStore = fullStore.limit(0)
    assert(Dedup.nearDupPairsAgainst(corpus, "text", "doc_id",
      emptyStore, "doc_id", threshold = 0.5).isEmpty)
    assert(Dedup.dedupIncrement(corpus, "text", "doc_id",
        emptyStore, "doc_id", threshold = 0.5).count() == corpus.count())
    assert(Dedup.updatedSignatureStore(emptyStore, "doc_id", corpus, "text", "doc_id",
        threshold = 0.5).count() == corpus.count())
    // Empty increment (a crawl cycle that found nothing): no pairs,
    // no survivors, store passes through unchanged.
    val emptyInc = corpus.limit(0)
    assert(Dedup.nearDupPairsAgainst(emptyInc, "text", "doc_id",
      fullStore, "doc_id", threshold = 0.5).isEmpty)
    assert(Dedup.updatedSignatureStore(fullStore, "doc_id", emptyInc, "text", "doc_id",
        threshold = 0.5).count() == corpus.count())
    // Docs shorter than the shingle width fall back to the whole-text
    // shingle (signatures' short-doc rule) — a re-crawled tiny doc
    // must still match its stored twin exactly.
    val tinyHist = Seq((0L, "ok bye")).toDF("doc_id", "text")
    val tinyStore = Dedup.signatures(tinyHist, "text", "doc_id").localCheckpoint()
    val tinyPairs = Dedup.nearDupPairsAgainst(
        Seq((10L, "ok bye"), (11L, "totally different words here")).toDF("doc_id", "text"),
        "text", "doc_id", tinyStore, "doc_id", threshold = 0.5)
      .select("old_id", "new_id").as[(Long, Long)].collect().toSet
    assert(tinyPairs == Set((0L, 10L)), s"pairs=$tinyPairs")
    // Exact route with an empty fingerprint store: everything survives.
    assert(Dedup.dedupExactAgainst(corpus, "text",
      Dedup.exactFingerprintStore(corpus, "text").limit(0)).count() == corpus.count())
  }

  test("two crawl cycles compose: updated store screens the next increment") {
    // Cycle 1: history {0,1} absorbs increment {2,3,4} → store gains
    // survivors {3,4}. Cycle 2: a new increment re-crawls 4's content
    // (id 20) and brings one fresh doc (21) — the UPDATED store must
    // drop 20 (near-dup of a cycle-1 survivor, which the ORIGINAL
    // store could not know) and keep 21. This is the loop a
    // continuous pipeline actually runs.
    val store1 = Dedup.signatures(corpus.filter(col("doc_id") < 2), "text", "doc_id")
      .localCheckpoint()
    val inc1 = corpus.filter(col("doc_id") >= 2)
    val store2 = Dedup.updatedSignatureStore(
      store1, "doc_id", inc1, "text", "doc_id", threshold = 0.5)
    assert(store2.select("doc_id").as[Long].collect().toSet == Set(0L, 1L, 3L, 4L))
    val inc2 = Seq(
      (20L, "yet another unrelated document discussing benchmark design tradeoffs here"),
      (21L, "entirely novel prose concerning streaming watermarks and state eviction")
    ).toDF("doc_id", "text")
    val kept2 = Dedup.dedupIncrement(
        inc2, "text", "doc_id", store2.localCheckpoint(), "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(21L), s"kept=$kept2")
  }

  test("incremental dedup caps store-side buckets independently") {
    // History carries 3 copies of boilerplate (store-side bucket size
    // 3) plus one unique doc; the increment re-crawls both. With
    // maxBucketSize=2 the boilerplate buckets drop BEFORE pairing —
    // bounding the O×N blow-up — while the size-1 unique-doc buckets
    // still pair. Same per-side cap semantics as fuzzyTextJoin.
    val boiler = "click here to accept cookies and continue to the requested page now"
    val unique = "a thorough treatise on the partitioning of distributed join algorithms"
    val history = Seq(
      (0L, boiler), (1L, boiler), (2L, boiler), (3L, unique)
    ).toDF("doc_id", "text")
    val increment = Seq(
      (10L, boiler), (11L, unique)
    ).toDF("doc_id", "text")
    val store = Dedup.signatures(history, "text", "doc_id").localCheckpoint()
    def pairsWith(cap: Int) = Dedup.nearDupPairsAgainst(
        increment, "text", "doc_id", store, "doc_id",
        threshold = 0.5, maxBucketSize = cap)
      .select("old_id", "new_id").as[(Long, Long)].collect().toSet
    assert(pairsWith(0) == Set((0L, 10L), (1L, 10L), (2L, 10L), (3L, 11L)))
    assert(pairsWith(2) == Set((3L, 11L)),
      "oversized store buckets must drop before pairing; small buckets must survive")
  }

  test("incremental dedup never re-shingles the store side") {
    // The store is an opaque (id, sig) frame — nearDupPairsAgainst may
    // only derive band hashes from the stored arrays (a pure explode
    // of the 8-element band sequence), never re-tokenize history. The
    // increment's one shingle pipeline (the only PosExplode in the
    // whole op) rides the persistOnce cache, so the optimized plan
    // must contain ZERO logical PosExplode generates: any that appears
    // would be an uncached shingle pipeline — i.e. someone started
    // re-processing text, the exact cost X48 exists to avoid.
    import org.apache.spark.sql.catalyst.plans.logical.Generate
    import org.apache.spark.sql.catalyst.expressions.PosExplode
    graft.CachedFrames.unpersistAll() // deterministic cache state
    val store = Dedup.signatures(corpus.filter(col("doc_id") < 2), "text", "doc_id")
      .localCheckpoint() // sever the signature lineage, as a parquet read would
    val plan = Dedup.nearDupPairsAgainst(
        corpus.filter(col("doc_id") >= 2), "text", "doc_id", store, "doc_id")
      .queryExecution.optimizedPlan
    val shingleGenerates = plan.collect {
      case g: Generate if g.generator.isInstanceOf[PosExplode] => g
    }
    assert(shingleGenerates.isEmpty,
      s"found uncached shingle pipeline(s): ${shingleGenerates.map(_.simpleString(60))}")
    // leaf census pins the whole shape: the store contributes exactly
    // its two severed-lineage reads (band side + sig_a re-join), the
    // increment its two cached signature references — nothing else.
    val leaves = plan.collectLeaves().map(_.getClass.getSimpleName)
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(leaves == Map("LogicalRDD" -> 2, "InMemoryRelation" -> 2), s"leaves=$leaves")
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

  test("minhash permutation family is independent (no scalar-multiple degeneracy)") {
    // Regression: a_i = (i+1)·a_0 mod P (and likewise b_i) makes every
    // permutation a scalar multiple of one function — all slots share
    // one argmin and k collapses to ~1. The constants must not sit on
    // any common ratio.
    val k = 16
    val degenerateA = (1 until k).forall(i =>
      Dedup.minhashA(i) == ((i + 1).toLong * Dedup.minhashA(0)) % Dedup.minhashP)
    assert(!degenerateA, "minhashA constants are scalar multiples of a_0")
    assert((0 until k).map(Dedup.minhashA).distinct.size == k)
    assert((0 until k).map(Dedup.minhashB).distinct.size == k)
    // and the signature of a multi-shingle doc must not be the
    // multiples pattern sig_i = (i+1)·sig_0 mod P
    val sig = Dedup.signatures(corpus, "text", "doc_id")
      .filter(col("doc_id") === 0L).head().getSeq[Long](1)
    val multiples = (1 until k).forall(i => sig(i) == ((i + 1).toLong * sig(0)) % Dedup.minhashP)
    assert(!multiples, "signature slots are scalar multiples — degenerate family")
  }

  test("maxBucketSize drops pathological buckets and keeps the rest") {
    // 60 identical boilerplate docs (ids 100+) would contribute
    // 60²-scale candidate pairs; the two seeded near-dups (0/1) must
    // survive a cap that removes the boilerplate buckets.
    val boiler = (0 until 60).map(i => (100L + i, "identical boilerplate page content repeated verbatim across the corpus many times over"))
    val mixed = (Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ) ++ boiler).toDF("doc_id", "text")
    val uncapped = Dedup.nearDupPairs(mixed, "text", "doc_id", threshold = 0.0)
    assert(uncapped.count() == 60L * 59 / 2 + 1)
    val capped = Dedup.nearDupPairs(mixed, "text", "doc_id", threshold = 0.0,
      maxBucketSize = 10)
    val cappedPairs = capped.select("a", "b").as[(Long, Long)].collect().toSet
    assert(cappedPairs == Set((0L, 1L)), s"got $cappedPairs")
    // the accounting frame reports exactly the dropped boilerplate buckets
    val dropped = Dedup.oversizedBuckets(
      Dedup.lshBands(Dedup.signatures(mixed, "text", "doc_id"), "doc_id"), 10)
      .collect()
    assert(dropped.nonEmpty)
    assert(dropped.forall(_.getAs[Long](Audit.GroupSizeCol) == 60L))
  }

  test("shared signature frames register one cache entry and release") {
    graft.CachedFrames.unpersistAll()
    val n1 = {
      Dedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.5).count()
      graft.CachedFrames.size
    }
    // an identical second query reuses the same registered plan
    Dedup.nearDupPairs(corpus, "text", "doc_id", threshold = 0.5).count()
    assert(graft.CachedFrames.size == n1)
    graft.CachedFrames.unpersistAll()
    assert(graft.CachedFrames.size == 0)
  }

  test("fast hasher path produces the same near-dup structure") {
    val pairs = Dedup.nearDupPairs(
        corpus, "text", "doc_id",
        threshold = 0.5, baseHasher = TextAnalysis.fastBaseHash)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("fuzzyTextJoin links near-identical records across two corpora") {
    val l = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about database engines")
    ).toDF("lid", "ltext")
    val r = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (20L, "another unrelated snippet regarding weather patterns")
    ).toDF("rid", "rtext")
    val out = Dedup.fuzzyTextJoin(l, "ltext", "lid", r, "rtext", "rid",
        threshold = 0.3)
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L)), s"got $out")
  }

  test("connectedComponents labels every vertex with its component minimum") {
    val pairs = Seq((2L, 3L), (3L, 4L), (9L, 8L), (5L, 2L), (20L, 21L))
      .toDF("a", "b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L,   // chain 5-2-3-4
      8L -> 8L, 9L -> 8L,
      20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a long chain (propagation depth)") {
    // path 0-1-2-...-15: min label must walk the full diameter
    val chain = (0L until 15L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(chain).as[(Long, Long)].collect()
    assert(got.length == 16 && got.forall(_._2 == 0L))
  }

  test("connectedComponents never merges separate components under maxIter") {
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    // too few iterations: labels refine but never cross components
    val truncated = Dedup.connectedComponents(chain, maxIter = 2)
      .as[(Long, Long)].collect().toMap
    assert(truncated.values.toSet.size >= 1)
    assert(truncated.forall { case (id, c) => c <= id }) // labels only decrease
  }

  test("nearDupClusters groups transitively, beyond the greedy survivor view") {
    val cl = Dedup.nearDupClusters(corpus, "text", "doc_id", threshold = 0.3)
      .as[(Long, Long)].collect().toMap
    // the seeded near-dup pair lands in one cluster keyed by its min id
    assert(cl.get(1L).contains(0L))
    assert(cl(0L) == 0L)
  }
}
