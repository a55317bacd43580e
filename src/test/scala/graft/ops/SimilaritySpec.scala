package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random float in [-1, 1) from ints (no RNG
    * state — reproducible across runs). */
  private def prng(parts: Int*): Float =
    MurmurHash3.orderedHash(parts).toFloat / Int.MaxValue.toFloat

  /** Clustered fixture: `nClusters` well-separated centers, `perCluster`
    * members each = center + small noise. Members of a cluster are
    * mutual nearest neighbors by construction.
    */
  private def clustered(nClusters: Int, perCluster: Int, dim: Int) = {
    val centers = Array.tabulate(nClusters, dim)((c, d) => prng(1, c, d) * 10f)
    val rows = for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      val id = (c * perCluster + m).toLong
      val vec = Array.tabulate(dim)(d => centers(c)(d) + prng(2, id.toInt, d) * 0.1f)
      (id, vec.toSeq, c)
    }
    rows.toDF("vec_id", "embedding", "cluster")
  }

  test("cosine: identity is 1, orthogonal is 0") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(0f, 3f, 0f))).toDF("a", "b")
    val r = df.select(
      Similarity.cosine(col("a"), col("a")).as("same"),
      Similarity.cosine(col("a"), col("b")).as("orth")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("bruteForceTopK ranks cluster members first") {
    val df = clustered(nClusters = 4, perCluster = 5, dim = 16)
    val top = Similarity.bruteForceTopK(df, df.filter(col("vec_id") < 5), "vec_id", "embedding", 4)
    // queries are cluster 0 (ids 0-4); their top-4 neighbors must be
    // exactly the other 4 members of cluster 0
    val got = top.groupBy("qid").agg(collect_set("nid").as("nids"))
      .as[(Long, Seq[Long])].collect()
    assert(got.length == 5)
    got.foreach { case (qid, nids) =>
      val expected = (0L until 5L).toSet - qid
      assert(nids.toSet == expected, s"qid=$qid got ${nids.sorted}")
    }
  }

  test("annTopK: high recall on clustered data with far fewer comparisons") {
    val df = clustered(nClusters = 8, perCluster = 8, dim = 16).cache()
    val queries = df.filter(col("vec_id") % 8 === 0) // one per cluster
    val k = 4
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val approx = Similarity.annTopK(df, queries, "vec_id", "embedding", k,
        dim = 16, tables = 8, bits = 4)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"ANN recall $recall below 0.7 on clustered fixture")
  }

  test("ivfTopK: cluster-center quantizer recovers brute-force neighbors") {
    val df = clustered(nClusters = 8, perCluster = 8, dim = 16).cache()
    val queries = df.filter(col("vec_id") % 8 === 3) // one non-centroid member per cluster
    val k = 4
    // one centroid per cluster: its first member's vector
    val centroids = df.filter(col("vec_id") % 8 === 0).orderBy("vec_id")
      .select("embedding").as[Seq[Float]].collect().toSeq
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(df, queries, "vec_id", "embedding", k, centroids, nProbe = 2)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall with per-cluster centroids")
  }

  test("trainCentroids: k-means quantizer beats the naive lowest-id seed") {
    val df = clustered(nClusters = 8, perCluster = 8, dim = 16).cache()
    val queries = df.filter(col("vec_id") % 8 === 3)
    val k = 4
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", k)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recallOf(centroids: Seq[Seq[Float]]): Double = {
      val got = Similarity.ivfTopK(df, queries, "vec_id", "embedding", k, centroids, nProbe = 2)
        .select("qid", "nid").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    // naive quantizer: the 8 lowest-id vectors — ALL from cluster 0, a
    // pathologically bad codebook for this fixture
    val naive = df.orderBy("vec_id").limit(8)
      .select("embedding").as[Seq[Float]].collect().toSeq
    // farthest-point seeding must pick ~one seed per separated cluster
    // and Lloyd refinement keeps them there
    val trained = Similarity.trainCentroids(df, "vec_id", "embedding",
      nCentroids = 8, dim = 16, iters = 3)
    assert(trained.size == 8)
    val (rNaive, rTrained) = (recallOf(naive), recallOf(trained))
    assert(rTrained >= 0.9, s"trained recall $rTrained")
    assert(rTrained >= rNaive, s"trained $rTrained < naive $rNaive")
  }

  test("embedding near-dup: exact and ANN paths find the seeded dup, dedup keeps min id") {
    val base = clustered(nClusters = 6, perCluster = 4, dim = 16)
    // ids within a cluster are near-identical vectors (center + 1% noise)
    val exact = Similarity.exactNearDupPairs(base, "vec_id", "embedding", 0.999)
    val exactPairs = exact.select("a", "b").as[(Long, Long)].collect().toSet
    assert(exactPairs.contains((0L, 1L)))
    assert(!exactPairs.exists { case (a, b) => a / 4 != b / 4 }, "cross-cluster pair leaked")
    val annPairs = Similarity.annNearDupPairs(base, "vec_id", "embedding", 0.999, dim = 16)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val recall = (exactPairs & annPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.7, s"ANN near-dup recall $recall")
    val kept = Similarity.dedupByEmbedding(base, "vec_id", "embedding", 0.999, dim = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(0L) && kept.size < 24, s"kept=$kept")
  }

  test("annNearDupPairs candidate set is salt-invariant") {
    // The salt sub-key exists purely to multiply shuffle-key
    // cardinality: the left side carries ONE salt and the right side
    // replicates across all of them, so exactly one salt matches per
    // same-bucket pair. The emitted pair set must therefore be
    // identical for any saltBuckets — this is what lets the DuckDB
    // oracle (q_ann_neardup) replay buckets without replaying salts.
    val base = clustered(nClusters = 6, perCluster = 4, dim = 16)
    def pairs(salts: Int) =
      Similarity.annNearDupPairs(base, "vec_id", "embedding", 0.9,
          dim = 16, saltBuckets = salts)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val p1 = pairs(1)
    assert(p1.nonEmpty)
    assert(pairs(16) == p1)
    assert(pairs(7) == p1)
  }

  test("fused cosine expression is bit-identical to the composed fold form") {
    val base = clustered(nClusters = 4, perCluster = 4, dim = 16)
    val pairs = base.select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(base.select(col("vec_id").as("idb"), col("embedding").as("b")))
      .filter(col("ida") < col("idb"))
    def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Similarity.dot(a, b) /
        (sqrt(Similarity.dot(a, a)) * sqrt(Similarity.dot(b, b)))
    val rows = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("comp")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}")
    }
  }

  test("dot is an ordered double fold (precision contract)") {
    // floats that lose bits if summed in float precision
    val a = Seq(1e8f, 1f, -1e8f)
    val b = Seq(1f, 1f, 1f)
    val r = Seq((a, b)).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b"))).head().getDouble(0)
    assert(r == 1.0) // double fold keeps the 1; a float fold would drop it
  }

  /** Two hand-computable clusters around orthogonal centroids, plus a
    * cross-cluster near-dup pair that SemDeDup must MISS by design:
    * ids 4/5 have cosine ≈ 0.9998 but straddle the decision boundary
    * between the centroids, so they are never compared.
    */
  private val semCentroids = Seq(Seq(1f, 0f), Seq(0f, 1f))
  private def semFixture = Seq(
    (0L, Seq(1f, 0.1f)),  // cluster 0
    (1L, Seq(1f, 0.12f)), // cluster 0, near-dup of 0 (cos ≈ 0.9999)
    (2L, Seq(0.1f, 1f)),  // cluster 1
    (3L, Seq(0.12f, 1f)), // cluster 1, near-dup of 2
    (4L, Seq(1f, 0.98f)), // cluster 0 ┐ cross-cluster near-dup pair
    (5L, Seq(0.98f, 1f))  // cluster 1 ┘ (cos ≈ 0.9998, never compared)
  ).toDF("vec_id", "embedding")

  test("semanticDedupPairs: within-cluster pairs found, cross-cluster near-dups missed by design") {
    val pairs = Similarity.semanticDedupPairs(semFixture, "vec_id", "embedding", semCentroids, 0.99)
      .select("cluster", "a", "b").as[(Int, Long, Long)].collect().toSet
    assert(pairs == Set((0, 0L, 1L), (1, 2L, 3L)))
    // (4,5) IS a genuine near-dup — the exact all-pairs path finds it…
    val exact = Similarity.exactNearDupPairs(semFixture, "vec_id", "embedding", 0.99)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.contains((4L, 5L)))
    // …and the SemDeDup approximation skips it (the documented trade)
    assert(!pairs.exists { case (_, a, b) => (a, b) == ((4L, 5L)) })
  }

  test("semanticDedupPairs argmax tie-break: first centroid index wins") {
    val df = Seq(
      (6L, Seq(1f, 1f)),   // equal dot to both centroids → cluster 0
      (7L, Seq(1f, 0.99f)) // cluster 0, near-dup of 6 (cos ≈ 0.99997)
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.semanticDedupPairs(df, "vec_id", "embedding", semCentroids, 0.99)
      .select("cluster", "a", "b").as[(Int, Long, Long)].collect().toSet
    // a last-index tie rule would strand 6 in cluster 1 and emit nothing
    assert(pairs == Set((0, 6L, 7L)))
  }

  test("semanticDedupPairs threshold is inclusive (sim >= threshold)") {
    // identical vectors score exactly 1.0 (4 / (2·2)) — kept at threshold 1.0
    val df = Seq((0L, Seq(2f, 0f)), (1L, Seq(2f, 0f))).toDF("vec_id", "embedding")
    val at = Similarity.semanticDedupPairs(df, "vec_id", "embedding", Seq(Seq(1f, 0f)), 1.0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(at == Set((0L, 1L)))
  }

  test("semanticDedup keeps the minimum id of each semantic-dup pair") {
    val kept = Similarity.semanticDedup(semFixture, "vec_id", "embedding", semCentroids, 0.99)
      .select("vec_id").as[Long].collect().toSet
    // pairs (0,1) and (2,3) drop the larger id; boundary pair 4/5 both survive
    assert(kept == Set(0L, 2L, 4L, 5L))
  }

  test("semanticDedupPairs cluster cap excludes hot clusters; oversizedClusters audits them") {
    // cluster 0: four near-identical members (0,1,4 + the boundary
    // vector 6 ties to cluster 0) — capped out at maxClusterSize=3;
    // cluster 1: two members → its pair survives
    val df = Seq(
      (0L, Seq(1f, 0.1f)), (1L, Seq(1f, 0.12f)), (4L, Seq(1f, 0.11f)),
      (6L, Seq(1f, 1f)),
      (2L, Seq(0.1f, 1f)), (3L, Seq(0.12f, 1f))
    ).toDF("vec_id", "embedding")
    val uncapped = Similarity.semanticDedupPairs(df, "vec_id", "embedding", semCentroids, 0.99)
      .select("cluster", "a", "b").as[(Int, Long, Long)].collect().toSet
    assert(uncapped.exists(_._1 == 0) && uncapped.contains((1, 2L, 3L)))
    val capped = Similarity.semanticDedupPairs(
        df, "vec_id", "embedding", semCentroids, 0.99, maxClusterSize = 3)
      .select("cluster", "a", "b").as[(Int, Long, Long)].collect().toSet
    assert(capped == Set((1, 2L, 3L)), s"hot cluster leaked: $capped")
    val audit = Similarity.oversizedClusters(df, "vec_id", "embedding", semCentroids, 3)
      .as[(Int, Long)].collect().toSeq
    assert(audit == Seq((0, 4L)))
    // the capped keep-set drops only cluster 1's loser
    val kept = Similarity.semanticDedup(
        df, "vec_id", "embedding", semCentroids, 0.99, maxClusterSize = 3)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L, 4L, 6L, 2L))
  }

  test("semanticDedupPairs edge cases: single vector, empty centroid list") {
    val one = Seq((0L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.semanticDedupPairs(one, "vec_id", "embedding", semCentroids, 0.5).count() == 0)
    intercept[IllegalArgumentException] {
      Similarity.semanticDedupPairs(one, "vec_id", "embedding", Seq.empty, 0.5)
    }
  }

  test("semanticDedupPairs rejects frames carrying reserved column names") {
    val df = Seq((0L, Seq(1f, 0f), 9)).toDF("vec_id", "embedding", "cluster")
    val e = intercept[IllegalArgumentException] {
      Similarity.semanticDedupPairs(df, "vec_id", "embedding", semCentroids, 0.5)
    }
    assert(e.getMessage.contains("cluster"))
  }

  test("trainCentroids → semanticDedup composition: cluster minima survive, dups drop") {
    val df = clustered(nClusters = 6, perCluster = 4, dim = 16).drop("cluster").cache()
    val trained = Similarity.trainCentroids(df, "vec_id", "embedding",
      nCentroids = 6, dim = 16, iters = 3)
    val semPairs = Similarity.semanticDedupPairs(df, "vec_id", "embedding", trained, 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // SemDeDup only restricts the candidate set: its pairs must be a
    // non-empty subset of the exact all-pairs near-dups
    val exactPairs = Similarity.exactNearDupPairs(df, "vec_id", "embedding", 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(semPairs.nonEmpty, "trained quantizer co-located no near-dup pair")
    assert(semPairs.subsetOf(exactPairs), s"phantom pairs: ${semPairs -- exactPairs}")
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding", trained, 0.999)
      .select("vec_id").as[Long].collect().toSet
    // a cluster minimum can only drop via a smaller id from ANOTHER
    // cluster — cross-cluster sims are far below threshold, so minima
    // always survive
    val minima = (0 until 6).map(c => (c * 4).toLong).toSet
    assert(minima.subsetOf(kept), s"cluster minima missing from $kept")
    assert(kept.size < 24, "no semantic dups dropped")
  }

  test("trainCentroids degenerate inputs: all-zero corpus, tiny corpus, single row") {
    // all-zero vectors: norms are 0, normalize is identity, every dot
    // is 0 and the first-index argmax sends every row to cluster 0 —
    // must not throw or divide by zero
    val zeros = (0L until 8L).map(i => (i, Seq.fill(4)(0f))).toDF("vec_id", "embedding")
    val zc = Similarity.trainCentroids(zeros, "vec_id", "embedding",
      nCentroids = 3, dim = 4, iters = 2)
    assert(zc.size == 3)
    assert(zc.forall(_.forall(_ == 0f)))
    // corpus smaller than nCentroids: farthest-point seeding can only
    // produce as many seeds as sample rows — returns corpus-size
    // centroids, not nCentroids
    val three = (0L until 3L).map(i =>
      (i, Seq.tabulate(4)(d => if (d == i) 1f else 0f))).toDF("vec_id", "embedding")
    val tc = Similarity.trainCentroids(three, "vec_id", "embedding",
      nCentroids = 8, dim = 4, iters = 2)
    assert(tc.size == 3)
    // single-row corpus: one centroid, the row L2-normalized
    val one = Seq((0L, Seq(3f, 0f, 4f, 0f))).toDF("vec_id", "embedding")
    val oc = Similarity.trainCentroids(one, "vec_id", "embedding",
      nCentroids = 4, dim = 4, iters = 1)
    assert(oc.size == 1)
    assert(oc.head.zip(Seq(0.6f, 0f, 0.8f, 0f))
      .forall { case (a, b) => math.abs(a - b) < 1e-6 })
    // empty corpus is refused up front
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.trainCentroids(empty, "vec_id", "embedding", 2, dim = 4)
    }
  }

  test("trainCentroids survives NaN vectors without poisoning clean clusters") {
    // two clean, well-separated groups plus one all-NaN row: training
    // must not throw, must return the requested centroid count, and at
    // least one centroid must stay finite for each clean direction
    // (the NaN row contaminates at most the cluster it lands in)
    val rows =
      (0L until 4L).map(i => (i, Seq(1f, 0f, 0f, 0f))) ++
      (4L until 8L).map(i => (i, Seq(0f, 0f, 1f, 0f))) :+
      ((8L, Seq(Float.NaN, 1f, Float.NaN, 1f)))
    val df = rows.toDF("vec_id", "embedding")
    val c = Similarity.trainCentroids(df, "vec_id", "embedding",
      nCentroids = 2, dim = 4, iters = 2)
    assert(c.size == 2)
    val finite = c.filter(_.forall(v => !v.isNaN))
    assert(finite.nonEmpty, s"every centroid went NaN: $c")
  }

  test("semanticAssign degenerate inputs: zero and NaN vectors neither throw nor pair") {
    // zero vector: all centroid dots are 0 → first-index argmax →
    // cluster 0, and its cosine against anything is NaN (0/0).
    // NaN vector: all dots are NaN; Spark orders NaN greatest, so the
    // argmax resolves (no null assignment) and its sims are NaN.
    // Spark's NaN ordering makes a bare `sim >= threshold` TRUE for
    // NaN — without the passesThreshold guard these two rows would
    // pair with their ENTIRE cluster and greedy-drop valid rows. The
    // guard makes non-finite similarity mean "unknown", never
    // "similar": degenerate rows emit no pairs and survive dedup.
    val df = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(1f, 0f)),          // true dup of 0 in cluster 0
      (2L, Seq(0f, 0f)),          // zero vector
      (3L, Seq(Float.NaN, 1f))    // NaN vector
    ).toDF("vec_id", "embedding")
    val cents = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val pairs = Similarity.semanticDedupPairs(df, "vec_id", "embedding", cents, 0.5)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)), s"degenerate rows paired: $pairs")
    // and the keep-set retains the degenerate rows (they lose no pair)
    val kept = Similarity.semanticDedup(df, "vec_id", "embedding", cents, 0.5)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L))
  }

  test("labelCentroids averages each dimension per label") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), "a"),
      (2L, Seq(3.0f, 6.0f), "a"),
      (3L, Seq(10.0f, 20.0f), "b")
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.labelCentroids(df, "vec_id", "label", "embedding")
      .orderBy("label", "dim")
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("a", 0, 2L, 2.0), ("a", 1, 2L, 4.0),
      ("b", 0, 1L, 10.0), ("b", 1, 1L, 20.0)))
    // explicit spread: same result, and the pre-explode exchange
    // hash-partitions by the row id at exactly the requested count
    val spread = Similarity.labelCentroids(df, "vec_id", "label", "embedding",
      spreadPartitions = 7)
    assert(spread.orderBy("label", "dim")
      .as[(String, Int, Long, Double)].collect().toSeq == got)
    val plan = spread.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(vec_id") && plan.contains(", 7)"),
      s"explicit spread count missing from plan:\n$plan")
    intercept[IllegalArgumentException] {
      Similarity.labelCentroids(df, "vec_id", "label", "embedding",
        spreadPartitions = -1)
    }
  }

  test("semanticContamination flags the paraphrase-shaped leak; NaN never matches") {
    val bench = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0f, 1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Seq(0.99f, 0.1f, 0f, 0f)),  // near-copy of bench 0 → flag
      (11L, Seq(0f, 0f, 1f, 1f)),       // orthogonal → clean
      (12L, Seq(0f, 0f, 0f, 0f))        // zero vector: cosine NaN → clean
    ).toDF("vec_id", "embedding")
    val flagged = Similarity.semanticContamination(
        corpus, bench, "vec_id", "embedding", threshold = 0.9)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(flagged == Set((10L, 0L)))
    val kept = Similarity.decontaminateSemantic(
        corpus, bench, "vec_id", "embedding", threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(11L, 12L))
  }

  test("hardNegatives: different-label only, dense ranks by descending sim") {
    val df = clustered(nClusters = 3, perCluster = 4, dim = 16)
    val hn = Similarity.hardNegatives(
      df, df.filter(col("vec_id") < 2), "vec_id", "embedding", "cluster", k = 5)
    // the label filter is absolute: no same-cluster row ever surfaces
    assert(hn.filter(col("qlabel") === col("nlabel")).isEmpty)
    val rows = hn.orderBy("qid", "rank")
      .select("qid", "rank", "sim")
      .as[(Long, Int, Double)].collect()
    // k=5 negatives per query, ranks dense from 1, sim non-increasing
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).toSeq == (1 to 5), s"qid=$qid ranks ${rs.map(_._2).toSeq}")
      assert(rs.map(_._3).toSeq == rs.map(_._3).sorted.reverse.toSeq, s"qid=$qid not sorted")
    }
    assert(rows.map(_._1).distinct.length == 2)
  }

  test("hardNegatives: maxSim drops near-identical different-label rows (false negatives)") {
    val base = clustered(nClusters = 3, perCluster = 4, dim = 16)
    val qvec = base.filter(col("vec_id") === 0L)
      .select("embedding").as[Seq[Float]].head()
    // id 100: byte-identical vector to query 0 under a DIFFERENT label —
    // the mislabeled-duplicate shape maxSim exists for
    val mislabeled = Seq((100L, qvec, 99)).toDF("vec_id", "embedding", "cluster")
    val corpus = base.union(mislabeled)
    val queries = base.filter(col("vec_id") === 0L)
    val keepAll = Similarity.hardNegatives(
      corpus, queries, "vec_id", "embedding", "cluster", k = 3)
    val top = keepAll.filter(col("rank") === 1).head()
    assert(top.getAs[Long]("nid") == 100L && top.getAs[Double]("sim") > 0.999)
    val filtered = Similarity.hardNegatives(
      corpus, queries, "vec_id", "embedding", "cluster", k = 3, maxSim = 0.95)
    assert(filtered.filter(col("nid") === 100L).isEmpty)
    assert(filtered.count() == 3) // still k negatives, from real clusters
  }

  test("hardNegatives: a zero-norm corpus vector never ranks (NaN guard, both modes)") {
    // ADVICE r14: sim(q, zero-vector) = NaN, and NaN orders ABOVE every
    // real number in Spark — unguarded, the degenerate row becomes the
    // rank-1 'hard negative' for EVERY query in the default maxSim=1.0
    // mode (the maxSim<1.0 path dropped it only as a side effect).
    val base = clustered(nClusters = 3, perCluster = 4, dim = 16)
    val degenerate = Seq((200L, Seq.fill(16)(0.0f), 99))
      .toDF("vec_id", "embedding", "cluster")
    val corpus = base.union(degenerate)
    val queries = base.filter(col("vec_id") < 2)
    for (maxSim <- Seq(1.0, 0.95)) {
      val hn = Similarity.hardNegatives(
        corpus, queries, "vec_id", "embedding", "cluster", k = 3, maxSim = maxSim)
      assert(hn.filter(col("nid") === 200L).isEmpty, s"maxSim=$maxSim")
      assert(hn.filter(isnan(col("sim"))).isEmpty, s"maxSim=$maxSim")
      assert(hn.count() == 2 * 3, s"maxSim=$maxSim") // still k per query
    }
  }

  test("mmrRerank: λ=1 is the plain relevance order; diversification pulls in other clusters") {
    graft.CachedFrames.unpersistAll()
    val corpus = clustered(nClusters = 4, perCluster = 6, dim = 16)
    val queries = corpus.filter(col("vec_id") === 0L)
    // λ=1: MMR reduces to relevance — must equal bruteForceTopK order
    val plain = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
        k = 4, poolK = 12, lambda = 1.0)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", k = 4)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    assert(plain == brute)
    graft.CachedFrames.unpersistAll()
    // λ=0.5 on a clustered corpus: the relevance-only top-4 is all
    // own-cluster (5 same-cluster members fill the head of the pool);
    // MMR must break out of it — a redundancy-punished pick list
    // reaches a second cluster within 4 picks.
    val diverse = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
        k = 4, poolK = 12, lambda = 0.5)
      .orderBy("rank").select("nid").as[Long].collect().toSeq
    assert(brute.forall(_ < 6L), s"sanity: relevance top-4 is own-cluster: $brute")
    assert(diverse.exists(_ >= 6L), s"MMR picks must leave the query's cluster: $diverse")
    // rank 1 is always the relevance argmax
    assert(diverse.head == brute.head)
    graft.CachedFrames.unpersistAll()
  }

  test("marginMine: planted translations are mined as mutual best pairs; a hub never double-pairs") {
    graft.CachedFrames.unpersistAll()
    val dim = 16
    // side A: 6 random-ish vectors; side B: noisy twins of A's first 4
    // (the "translations") + one HUB vector similar to everything
    // (sum of all A vectors — plain cosine thresholding would pair it
    // with several A rows) + one unrelated vector.
    val aRows = (0 until 6).map(i =>
      (i.toLong, Array.tabulate(dim)(d => prng(10, i, d)).toSeq))
    val aMat = aRows.map(_._2)
    val bTwins = (0 until 4).map(i =>
      (100L + i, aMat(i).zipWithIndex.map { case (v, d) => v + prng(11, i, d) * 0.05f }))
    val hub = (200L, Seq.tabulate(dim)(d => aMat.map(_(d)).sum))
    val lone = (201L, Seq.tabulate(dim)(d => prng(12, 99, d)))
    val a = aRows.toDF("vec_id", "embedding")
    val b = (bTwins :+ hub :+ lone).toDF("vec_id", "embedding")
    val mined = Similarity.marginMine(a, b, "vec_id", "embedding", k = 3, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted twin is recovered
    (0 until 4).foreach { i =>
      assert(mined.contains((i.toLong, 100L + i)), s"twin $i missing from $mined")
    }
    // mutual-best: no a_id or b_id appears twice (a hub cannot double-pair)
    val as = mined.toSeq.map(_._1); val bs = mined.toSeq.map(_._2)
    assert(as.distinct.size == as.size && bs.distinct.size == bs.size)
    graft.CachedFrames.unpersistAll()
  }

  test("marginMine is partitioning-invariant (quantized neighborhood sums)") {
    graft.CachedFrames.unpersistAll()
    val corpus = clustered(nClusters = 4, perCluster = 8, dim = 16)
    val a = corpus.filter(col("cluster") < 2).drop("cluster")
    val b = corpus.filter(col("cluster") >= 2).drop("cluster")
    val x = Similarity.marginMine(a, b, "vec_id", "embedding", k = 4)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    graft.CachedFrames.unpersistAll()
    val y = Similarity.marginMine(a.repartition(7), b.repartition(5), "vec_id", "embedding", k = 4)
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(x == y)
    graft.CachedFrames.unpersistAll()
    intercept[IllegalArgumentException] {
      Similarity.marginMine(a, b, "vec_id", "embedding", k = 0)
    }
  }

  test("mmrRerank: deterministic across partitionings; knob validation") {
    graft.CachedFrames.unpersistAll()
    val corpus = clustered(nClusters = 3, perCluster = 5, dim = 16)
    val queries = corpus.filter(col("vec_id") < 2L)
    val a = Similarity.mmrRerank(corpus, queries, "vec_id", "embedding",
      k = 3, poolK = 8).collect().map(_.toSeq).toSeq
    graft.CachedFrames.unpersistAll()
    val b = Similarity.mmrRerank(corpus.repartition(7), queries, "vec_id", "embedding",
      k = 3, poolK = 8).collect().map(_.toSeq).toSeq
    assert(a.sortBy(_.toString) == b.sortBy(_.toString))
    graft.CachedFrames.unpersistAll()
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(corpus, queries, "vec_id", "embedding", k = 5, poolK = 4)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrRerank(corpus, queries, "vec_id", "embedding", k = 2, poolK = 4, lambda = 1.5)
    }
  }
}
