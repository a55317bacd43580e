package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.roundPinned

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact top-k cosine: broadcast the (small)
  *    query set against the corpus, score with a codegen'd
  *    zip_with/aggregate fold, rank per query with a window. Correct
  *    baseline at any corpus size as long as the QUERY set is small
  *    (the corpus streams; nothing is collected).
  *  - [[annTopK]] — LSH-bucketed approximate variant (random
  *    hyperplane signatures, L tables × b bits): corpus and queries
  *    are bucketed by signature; only same-bucket pairs are scored,
  *    then exact cosine re-ranks the candidates. This is the 100 TB
  *    path: candidate volume scales with bucket occupancy, not corpus
  *    size × queries.
  *
  * All arithmetic is an explicit left-to-right double-precision fold
  * so an external oracle (DuckDB `list_sum(list_transform(...))` over
  * `::DOUBLE` casts) reproduces the numbers.
  */
object Similarity {

  /** dot(a, b) as a sequential double fold (deterministic order).
    * Works for any numeric array pair (used for the literal
    * hyperplane arrays); for float-vector cosine the fused
    * [[cosine]] expression is the hot-path form.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Cosine similarity in double precision: a native codegen'd
    * expression fusing the dot product and both norms into one loop
    * ([[graft.functions.CosineSimilarityExpr]]) — bit-identical to
    * the composed `dot/(sqrt·sqrt)` form, ~3× less work per pair.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarityExpr.cosineSimilarity(a, b)

  /** Per-label mean embedding (class centroids / mean pooling), in
    * long form `(label, dim, n, centroid)`: posexplode the vector and
    * hash-aggregate by (label, dim) — partial aggregation combines
    * map-side, so the shuffle moves `labels × dims` rows regardless
    * of corpus size. The keyed pre-explode repartition spreads the
    * dims× fanout from few-split sources (AQE can't see it) and keys
    * on the ROW id, not the label — labels are few and would skew.
    * `spreadPartitions` sizes that spread explicitly (same knob as the
    * Dedup family's explicit-count repartitions); the default 0 uses
    * the session's `defaultParallelism` — right for local/one-executor
    * runs, while a cluster job sizes it to its executor count.
    * Centroids round to 6 decimals: per-partition double-sum order is
    * not reproducible across engines (or runs) at the last ulp.
    */
  def labelCentroids(
      df: DataFrame,
      idCol: String,
      labelCol: String,
      vecCol: String,
      spreadPartitions: Int = 0): DataFrame = {
    require(spreadPartitions >= 0,
      s"spreadPartitions must be >= 0 (0 = defaultParallelism): $spreadPartitions")
    val n =
      if (spreadPartitions > 0) spreadPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    df.repartition(n, col(idCol))
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .groupBy("label", "dim")
      .agg(
        count(lit(1)).as("n"),
        roundPinned(avg(col("__v").cast("double")), 6).as("centroid"))
  }

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) frame — arbitrarily large
    * @param queries (idCol, vecCol) frame — small enough to broadcast
    * @return (qid, rank, nid, sim) with rank 1..k by (sim desc, nid)
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
    rankTopK(scored, k)
  }

  /** Hard-negative mining for contrastive/embedding training: for
    * each query vector, the top-`k` most-cosine-similar corpus vectors
    * whose LABEL DIFFERS from the query's — the negatives a triplet /
    * InfoNCE loss learns most from. `maxSim` (exclusive) drops
    * near-identical different-label neighbors first: above ≈0.95 a
    * "negative" is overwhelmingly a labeling error or an undetected
    * duplicate, and training on it teaches the model to separate
    * copies (the standard false-negative filter in hard-mining
    * recipes; pass 1.0 to keep everything).
    *
    * Same scale shape as [[bruteForceTopK]]: queries broadcast, the
    * corpus streams through one codegen'd fused-cosine projection, and
    * the label filter runs BEFORE the per-query top-k windows, so
    * same-label rows never enter the rank shuffle. The double
    * `WindowGroupLimit` (partial per-partition top-k before the
    * exchange) bounds what moves to k rows per (query, partition).
    * For corpora past brute-force reach, mine within [[annTopK]] /
    * [[ivfTopK]] candidates instead and apply the same label filter.
    *
    * @return (qid, qlabel, rank, nid, nlabel, sim) with rank 1..k by
    *         (sim desc, nid)
    */
  def hardNegatives(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      maxSim: Double = 1.0): DataFrame = {
    val q = queries.select(
      col(idCol).as("qid"), col(vecCol).as("qvec"), col(labelCol).as("qlabel"))
    val c = corpus.select(
      col(idCol).as("nid"), col(vecCol).as("nvec"), col(labelCol).as("nlabel"))
    val base = c
      .crossJoin(broadcast(q))
      .filter(col("nlabel") =!= col("qlabel"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
    // maxSim = 1.0 means "no false-negative filter": an exact duplicate
    // scores exactly 1.0, so a strict `sim < 1.0` would silently drop
    // it even in keep-everything mode. NaN is filtered in BOTH modes:
    // a zero-norm or NaN corpus vector scores sim = NaN, and Spark and
    // DuckDB order NaN ABOVE every real number — unguarded, one
    // degenerate vector becomes the rank-1 "negative" for every query.
    val finite = base.filter(!isnan(col("sim")))
    val scored = if (maxSim >= 1.0) finite else finite.filter(col("sim") < maxSim)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("qlabel"), col("rank"), col("nid"), col("nlabel"), col("sim"))
  }

  /** Shared top-k ranking of a scored (qid, nid, sim) frame — also
    * used by [[graft.pipeline.AnnIndex]] so tie-breaking can never
    * diverge between the inline and the store-backed IVF paths.
    */
  /** [[bruteForceTopK]] over DOUBLE vectors (whitened / reduced-space
    * projections): the fused [[cosine]] expression is float-typed, so
    * this variant scores with the composed `dot/(√·√)` form — three
    * separate left-to-right folds, exactly the shape every SQL oracle
    * replays — which costs nothing in the low-dimensional spaces
    * double vectors come from.
    */
  def bruteForceTopKDouble(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    def cos(a: Column, b: Column): Column =
      dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cos(col("qvec"), col("nvec")))
    rankTopK(scored, k)
  }

  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1, 1),
    * derived from the md5 of "table|bit|dim" exactly as
    * [[graft.functions.Md5PrefixLongExpr]] hashes strings: first 15
    * hex chars as a 60-bit long, scaled by 2^59 and shifted. No RNG
    * state, and — unlike a JVM-only hash — ANY engine with md5 can
    * re-derive the planes, which is what makes the ANN queries
    * oracle-checkable in DuckDB
    * (`('0x' || substr(md5(t || '|' || b || '|' || d), 1, 15))::BIGINT
    *  / 2^59 - 1`).
    */
  private[graft] def hyperplane(table: Int, bit: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      val h = graft.functions.Md5PrefixLongExpr.hashPrefix(s"$table|$bit|$d", 15)
      h.toDouble / (1L << 59).toDouble - 1.0
    }

  /** Attach one LSH bucket column per table: each table's `bits`
    * hyperplane dots come from ONE fused
    * [[graft.functions.MatVecDotsExpr]] kernel call materialized as a
    * temp column (the composed one-fold-per-bit form ran tables×bits
    * separate higher-order folds per row and dominated ANN cost), then
    * the sign bits pack into an int bucket. Returns the frame plus the
    * bucket column names; temp dot columns are dropped.
    */
  private def withTableBuckets(
      df: DataFrame,
      vecCol: String,
      tables: Int,
      bits: Int,
      dim: Int): (DataFrame, Seq[String]) = {
    val withDots = (0 until tables).foldLeft(df) { (acc, t) =>
      val w = Array.tabulate(bits)(j => hyperplane(t, j, dim))
      acc.withColumn(
        s"__lsh_dots_$t",
        graft.functions.MatVecDotsExpr.matVecDots(col(vecCol), w))
    }
    val withBuckets = (0 until tables).foldLeft(withDots) { (acc, t) =>
      val bucket = (0 until bits)
        .map(j => when(element_at(col(s"__lsh_dots_$t"), j + 1) >= 0, lit(1 << j))
          .otherwise(lit(0)))
        .reduce(_ + _)
      acc.withColumn(s"__bucket_$t", bucket)
    }
    val cleaned = (0 until tables).foldLeft(withBuckets)(
      (acc, t) => acc.drop(s"__lsh_dots_$t"))
    (cleaned, (0 until tables).map(t => s"__bucket_$t"))
  }

  /** (id, vec, table, bucket) rows: one row per (input row, table). */
  private def bucketedByTable(
      df: DataFrame,
      idAlias: String,
      vecAlias: String,
      tables: Int,
      bits: Int,
      dim: Int): DataFrame = {
    val (withBuckets, bucketCols) = withTableBuckets(df, vecAlias, tables, bits, dim)
    val sigs = array(bucketCols.zipWithIndex.map { case (b, t) =>
      struct(lit(t).as("table"), col(b).as("bucket"))
    }: _*)
    withBuckets
      .select(col(idAlias), col(vecAlias), explode(sigs).as("tb"))
      .select(col(idAlias), col(vecAlias),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** IVF-style approximate top-k: a coarse quantizer of `nCentroids`
    * centroid vectors partitions the corpus (each vector is assigned
    * to its best-dot-product centroid); each query probes only its
    * `nProbe` nearest centroids' partitions and exact cosine re-ranks
    * within them. Candidates per query ≈ corpus × nProbe / nCentroids
    * — the knob that keeps 100 TB ANN bounded.
    *
    * The quantizer here takes the `nCentroids` lowest-id corpus
    * vectors as centroids — a deterministic stand-in for k-means
    * (plug trained centroids in via the overload). Collecting
    * `nCentroids` rows to the driver is the intended pattern: the
    * centroid table is tiny and becomes literal expressions, so
    * assignment is a codegen'd map-side pass with no join.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val centroids = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .limit(nCentroids)
      .collect()
      .map(_.getSeq[Float](1))
    ivfTopK(corpus, queries, idCol, vecCol, k, centroids.toSeq, nProbe)
  }

  /** Deterministic spherical k-means trainer for the IVF quantizer.
    *
    * Scale shape: seeding happens on a bounded driver-side sample (the
    * `seedSample` lowest-id vectors — farthest-point traversal by
    * cosine, so well-separated clusters each contribute a seed);
    * each Lloyd iteration is ONE distributed pass — assignment via the
    * fused [[graft.functions.MatVecDotsExpr]] argmax (map-side, no
    * join) and a groupBy(centroid) with `dim` avg aggregates (map-side
    * partial combine, k×dim-cell shuffle) — followed by a k-row
    * collect. Centroid means are L2-normalized, so the max-DOT
    * assignment [[ivfTopK]] uses is exactly max-cosine assignment.
    * Empty clusters keep their previous centroid. Deterministic for a
    * fixed corpus: seeds come from id order, iteration count is fixed
    * (per-dimension `avg` is order-insensitive up to double rounding).
    *
    * Everything here is public-textbook k-means (Lloyd 1957) arranged
    * for Spark; cost is `iters` corpus scans, driver memory
    * O(seedSample × dim).
    */
  def trainCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      dim: Int,
      iters: Int = 3,
      seedSample: Int = 256): Seq[Seq[Float]] = {
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n > 0) v.map(_ / n) else v
    }
    // ---- farthest-point seeding on a bounded sample
    val sample = corpus
      .select(col(idCol), col(vecCol)).orderBy(col(idCol)).limit(seedSample)
      .collect().map(r => normalize(r.getSeq[Float](1).map(_.toDouble).toArray))
    require(sample.nonEmpty, "corpus is empty")
    def dotArr(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
      s
    }
    val seeds = scala.collection.mutable.ArrayBuffer(sample.head)
    while (seeds.size < math.min(nCentroids, sample.length)) {
      // next seed = sample point whose best similarity to any existing
      // seed is smallest (ties: first in id order)
      val next = sample.minBy(v => seeds.map(s => dotArr(v, s)).max)
      seeds += next
    }
    var centroids: Array[Array[Double]] = seeds.toArray

    // ---- Lloyd iterations, one distributed pass each
    val vecs = corpus.select(col(vecCol).as("__vec"))
    for (_ <- 1 to iters) {
      val cd = vecs.withColumn(
        "__cd", graft.functions.MatVecDotsExpr.matVecDots(col("__vec"), centroids))
      val assign = (array_position(col("__cd"), array_max(col("__cd"))).cast("int") - 1).as("__c")
      val avgs = (0 until dim).map(d =>
        avg(element_at(col("__vec"), d + 1).cast("double")).as(s"__d$d"))
      val rows = cd.select(assign, col("__vec"))
        .groupBy("__c").agg(avgs.head, avgs.tail: _*)
        .collect()
      val next = centroids.map(identity)
      rows.foreach { r =>
        val c = r.getInt(0)
        if (c >= 0 && c < next.length)
          next(c) = normalize(Array.tabulate(dim)(d => r.getDouble(d + 1)))
      }
      centroids = next
    }
    centroids.map(_.map(_.toFloat).toSeq).toSeq
  }

  /** IVF with caller-provided centroid vectors. */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: Seq[Seq[Float]],
      nProbe: Int): DataFrame = {
    // all centroid dots from one fused kernel call, materialized once
    // per row so argmax/probe-ranking reference the attribute instead
    // of recomputing the dots per use
    val cm = centroids.map(_.map(_.toDouble).toArray).toArray
    def withCentroidDots(df: DataFrame, vec: String): DataFrame =
      df.withColumn("__cd", graft.functions.MatVecDotsExpr.matVecDots(col(vec), cm))
    // index (0-based) of the best centroid; first index wins ties
    val assign = array_position(col("__cd"), array_max(col("__cd"))).cast("int") - 1
    // the nProbe best centroid indices: sort (−dot, idx) structs
    val probes = {
      val ranked = array_sort(transform(
        sequence(lit(0), lit(centroids.size - 1)),
        i => struct((-element_at(col("__cd"), i + 1)).as("neg"), i.as("idx"))))
      transform(slice(ranked, lit(1), lit(nProbe)), s => s.getField("idx"))
    }
    val c = withCentroidDots(corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec")), "nvec")
      .withColumn("centroid", assign)
      .select("nid", "nvec", "centroid")
    val q = withCentroidDots(queries.select(col(idCol).as("qid"), col(vecCol).as("qvec")), "qvec")
      .select(col("qid"), col("qvec"), explode(probes).as("centroid"))
    val cand = c.join(broadcast(q), Seq("centroid"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
    rankTopK(cand, k)
  }

  /** Semantic benchmark contamination — the embedding-space
    * counterpart of [[graft.ops.Curation.decontaminate]]: n-gram
    * overlap misses paraphrased or translated benchmark leakage, so
    * modern decontamination ALSO screens by embedding cosine against
    * the benchmark set. Every (corpus, bench) pair with
    * `sim ≥ threshold` (NaN never matches — the [[passesThreshold]]
    * guard). The bench side broadcasts (small by definition: an eval
    * set), the corpus streams once through the fused-cosine
    * projection, and the per-pair filter precedes any shuffle. For a
    * bench too large to broadcast, route through [[annNearDupPairs]]'
    * bucketed screen instead.
    */
  def semanticContamination(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("cvec"))
    val b = bench.select(col(idCol).as("bench_id"), col(vecCol).as("bvec"))
    c.crossJoin(broadcast(b))
      .withColumn("sim", cosine(col("cvec"), col("bvec")))
      .filter(passesThreshold(col("sim"), threshold))
      .select(col("doc_id"), col("bench_id"), col("sim"))
  }

  /** Keep only corpus rows with NO semantic match in the benchmark —
    * the drop-side closure of [[semanticContamination]] (one
    * left-anti join on the flagged ids).
    */
  def decontaminateSemantic(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame =
    corpus.join(
      semanticContamination(corpus, bench, idCol, vecCol, threshold)
        .select(col("doc_id").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Pair-emission threshold guard shared by every near-dup op: a
    * zero-norm or NaN vector's cosine is NaN (0/0), and Spark ORDERS
    * NaN GREATER than every number — a bare `sim >= threshold` is TRUE
    * for NaN, which would mark a degenerate embedding as a duplicate
    * of its entire cluster/bucket and greedy-drop arbitrarily many
    * valid rows. Non-finite similarity is "unknown", never "similar".
    */
  private def passesThreshold(sim: Column, threshold: Double): Column =
    sim >= threshold && !isnan(sim)

  /** Embedding-cosine near-duplicate pairs (a < b) with sim ≥
    * `threshold`, computed exactly over all pairs — bounded inputs
    * only (a deduplication batch, an LSH bucket, a candidate set). The
    * 100 TB path is [[annNearDupPairs]]: LSH buckets first, exact
    * cosine only within buckets.
    */
  def exactNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("a"), col(vecCol).as("avec"))
    val b = df.select(col(idCol).as("b"), col(vecCol).as("bvec"))
    a.crossJoin(b)
      .filter(col("a") < col("b"))
      .withColumn("sim", cosine(col("avec"), col("bvec")))
      .filter(passesThreshold(col("sim"), threshold))
      .select(col("a"), col("b"), col("sim"))
  }

  /** Near-dup vector pairs via LSH buckets + exact re-check: only
    * same-bucket pairs are scored. Recall depends on (tables, bits)
    * exactly as in [[annTopK]].
    *
    * Scale shape: candidate generation moves ONLY (id, table, bucket)
    * rows — vectors never enter the self-join or the dedup shuffle.
    * The raw (table, bucket) key space is just `tables × 2^bits`
    * values, which would cap join parallelism regardless of cluster
    * size, so a deterministic salt sub-key multiplies the key
    * cardinality by `saltBuckets`: the left side carries
    * `hash(id) % saltBuckets`, the right side replicates each id-only
    * row across all salts (both sides are 3-int rows — the replication
    * is noise next to moving vectors). Candidate (a, b) id pairs
    * dedupe on a high-cardinality key, and full vectors are re-joined
    * exactly once per surviving pair.
    */
  def annNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      tables: Int = 8,
      bits: Int = 4,
      saltBuckets: Int = 16): DataFrame = {
    val vecs = df.select(col(idCol).as("__vid"), col(vecCol).as("__vec"))
    val b = bucketedByTable(vecs, "__vid", "__vec", tables, bits, dim)
      .select("__vid", "table", "bucket")
    val x = b.select(
      col("__vid").as("a"), col("table"), col("bucket"),
      pmod(hash(col("__vid")), lit(saltBuckets)).as("__salt"))
    val y = b.select(
      col("__vid").as("b"), col("table"), col("bucket"),
      explode(sequence(lit(0), lit(saltBuckets - 1))).as("__salt"))
    val candIds = x.join(y, Seq("table", "bucket", "__salt"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
    candIds
      .join(vecs.select(col("__vid").as("a"), col("__vec").as("avec")), Seq("a"))
      .join(vecs.select(col("__vid").as("b"), col("__vec").as("bvec")), Seq("b"))
      .withColumn("sim", cosine(col("avec"), col("bvec")))
      .filter(passesThreshold(col("sim"), threshold))
      .select(col("a"), col("b"), col("sim"))
  }

  /** SemDeDup-style semantic duplicate pairs (cluster-then-prune;
    * Abbas et al. 2023, arXiv:2303.09540): assign every vector to its
    * max-dot centroid — a map-side fused-kernel argmax
    * ([[graft.functions.MatVecDotsExpr]]), no join — then compute
    * exact pairwise cosine ONLY within a cluster and emit `(a < b)`
    * pairs with `sim ≥ threshold`. Cross-cluster near-dups are missed
    * by design; that approximation is what makes the op scale.
    *
    * Centroids come from [[trainCentroids]] (or any quantizer); the
    * centroid count is the scale knob: the quadratic term is
    * Σ_clusters n_c², so k grows with the corpus to keep clusters
    * bounded — the published recipe. The self-join shuffles
    * (id, vec, cluster) rows hash-partitioned by cluster; for skewed
    * corpora raise k or route hot clusters through [[annNearDupPairs]].
    */
  /** Internal staging + output column names [[semanticDedupPairs]]
    * uses; input frames may not carry them (same guard pattern as
    * [[Joins.asofJoin]]). */
  private val semanticReserved = Set("__sid", "__svec", "__cd", "cluster")

  /** Centroid-argmax assignment frame `(__sid, __svec, cluster)`
    * shared by [[semanticDedupPairs]] and [[oversizedClusters]]. */
  private def semanticAssign(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]]): DataFrame = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    val shadowing = df.columns.filter(semanticReserved)
    require(
      shadowing.isEmpty,
      s"semanticDedupPairs reserves column names ${semanticReserved.mkString("/")} " +
        s"for internal staging and output; rename: ${shadowing.mkString(", ")}")
    val cm = centroids.map(_.map(_.toDouble).toArray).toArray
    df.select(col(idCol).as("__sid"), col(vecCol).as("__svec"))
      .withColumn("__cd", graft.functions.MatVecDotsExpr.matVecDots(col("__svec"), cm))
      // first max index wins ties — same rule as ivfTopK
      .withColumn("cluster",
        (array_position(col("__cd"), array_max(col("__cd"))) - 1).cast("int"))
      .select("__sid", "__svec", "cluster")
  }

  /** Clusters larger than `maxClusterSize` — the accounting frame for
    * a capped [[semanticDedupPairs]] run: `(cluster, group_size)` of
    * everything the cap would exclude from pairing. A production job
    * counts/logs this tiny aggregate alongside the capped run (same
    * audit stance as [[graft.ops.Dedup.oversizedBuckets]]; shape and
    * complement guarantees: [[Audit]]).
    */
  def oversizedClusters(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      maxClusterSize: Int): DataFrame =
    semanticAssign(df, idCol, vecCol, centroids)
      .groupBy("cluster")
      .agg(count(lit(1)).as(Audit.GroupSizeCol))
      .filter(col(Audit.GroupSizeCol) > maxClusterSize)

  def semanticDedupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      threshold: Double,
      maxClusterSize: Int = 0): DataFrame = {
    // Both self-join sides (and the cap's count) consume the
    // assignment frame, and the planner does NOT reuse the exchange
    // across the differently-aliased sides (verified: two
    // hashpartitioning(cluster) exchanges under SortMergeJoin) —
    // persist once so the scan + fused argmax run once. The two
    // cluster-key shuffles of (id, vec) remain; they are secondary to
    // the Σ n_c² pairwise cosine term that maxClusterSize/k bound.
    val assigned = graft.CachedFrames.persistOnce(
      semanticAssign(df, idCol, vecCol, centroids))
    // Skew guard, same shape as Dedup.candidatePairs' bucket cap: a
    // cluster of C vectors contributes C² pairs, and k-means clusters
    // skew on real corpora. With maxClusterSize > 0, clusters above
    // the cap drop out BEFORE pairing (map-side-combined count + semi
    // join — cost proportional to rows, never C²); route the audited
    // hot clusters ([[oversizedClusters]]) through [[annNearDupPairs]]
    // or re-train with larger k. 0 disables (the oracle configuration).
    val bounded =
      if (maxClusterSize > 0) {
        val keep = assigned.groupBy("cluster")
          .agg(count(lit(1)).as("__csz"))
          .filter(col("__csz") <= maxClusterSize)
          .select("cluster")
        assigned.join(keep, Seq("cluster"), "left_semi")
      } else assigned
    val a = bounded.select(col("cluster"), col("__sid").as("a"), col("__svec").as("avec"))
    val b = bounded.select(col("cluster"), col("__sid").as("b"), col("__svec").as("bvec"))
    a.join(b, Seq("cluster"))
      .filter(col("a") < col("b"))
      .withColumn("sim", cosine(col("avec"), col("bvec")))
      .filter(passesThreshold(col("sim"), threshold))
      .select(col("cluster"), col("a"), col("b"), col("sim"))
  }

  /** SemDeDup keep-set: drop the larger id of every semantic-dup pair
    * (greedy keep-first, same policy as [[dedupByEmbedding]]).
    */
  def semanticDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      centroids: Seq[Seq[Float]],
      threshold: Double,
      maxClusterSize: Int = 0): DataFrame = {
    val losers = semanticDedupPairs(df, idCol, vecCol, centroids, threshold, maxClusterSize)
      .select(col("b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep one vector (minimum id) per near-dup group — greedy
    * keep-first, same policy as [[graft.ops.Dedup.dedupNear]].
    */
  def dedupByEmbedding(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      tables: Int = 8,
      bits: Int = 4): DataFrame = {
    val losers = annNearDupPairs(df, idCol, vecCol, threshold, dim, tables, bits)
      .select(col("b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Approximate top-k: L hash tables of `bits` random-hyperplane sign
    * bits; candidates = distinct corpus vectors sharing any table
    * bucket with the query; exact cosine re-ranks candidates. Recall
    * rises with L, candidate volume with 2^-bits — tune per corpus.
    *
    * Scale shape (same query-set assumption as [[bruteForceTopK]]:
    * queries are small, the corpus is not): the query buckets
    * broadcast, so candidate generation is a map-side broadcast join
    * over id-only corpus bucket rows — no shuffle touches a vector.
    * Candidate (qid, nid) id pairs dedupe on their own
    * high-cardinality key, then corpus vectors join back once per
    * surviving pair (shuffle of small id pairs + the corpus rows that
    * actually matched) and query vectors re-attach by broadcast.
    */
  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      tables: Int = 8,
      bits: Int = 4): DataFrame = {
    val qvecs = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val cvecs = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val qb = bucketedByTable(qvecs, "qid", "qvec", tables, bits, dim)
      .select("qid", "table", "bucket")
    val cb = bucketedByTable(cvecs, "nid", "nvec", tables, bits, dim)
      .select("nid", "table", "bucket")
    val candIds = cb.join(broadcast(qb), Seq("table", "bucket"))
      .filter(col("qid") =!= col("nid"))
      .select("qid", "nid")
      .distinct()
    val scored = candIds
      .join(cvecs, Seq("nid"))
      .join(broadcast(qvecs), Seq("qid"))
      .withColumn("sim", cosine(col("qvec"), col("nvec")))
    rankTopK(scored, k)
  }

  /** Maximal-Marginal-Relevance re-rank (Carbonell & Goldstein 1998):
    * per query, greedily pick `k` results from a `poolK`-deep cosine
    * shortlist, each step taking
    * `argmax λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)` —
    * relevance traded against redundancy, the standard diversification
    * in front of RAG context assembly (k near-duplicate chunks teach a
    * model less than k distinct ones) and dedup review queues. The
    * empty-selection max-sim is 0, so step 1 is the plain relevance
    * argmax; ties break by ascending id.
    *
    * Scale shape: the CORPUS appears only in the shortlist build
    * (the [[bruteForceTopK]] broadcast-queries scan here; swap in
    * [[annTopK]]/[[ivfTopK]] candidates upstream for corpora past
    * brute force — the re-rank is source-agnostic given (qid, nid,
    * rel, nvec)). The greedy selection is per-query SEQUENTIAL state
    * over a BOUNDED pool — exactly the shape `flatMapGroups` exists
    * for: ONE shuffle of queries×poolK small rows, then a poolK×k
    * in-memory loop per query, parallel across queries. (A first cut
    * composed the loop as k driver-built join+window steps — correct,
    * but ~5 jobs per pick of pure scheduling latency on tiny frames;
    * the grouped form measured 8.7 → 0.9 s on the bench pool and its
    * cost at N queries is one exchange.)
    *
    * Determinism for the oracle: relevance is the fused [[cosine]]
    * (a left-to-right double fold); the in-group pairwise cosine
    * replays that exact float→double loop; running max equals set
    * max; the MMR combine is the pinned order
    * `(λ·rel) − ((1−λ)·maxsim)`; candidates iterate nid-ascending so
    * the first strict max IS the (mmr DESC, nid ASC) winner. A SQL
    * engine replays every pick and score bit-exactly (q_mmr_rerank's
    * chained-CTE oracle does).
    *
    * @return (qid, rank, nid, rel_r, mmr_r) with rank 1..k in pick
    *         order
    */
  def mmrRerank(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      poolK: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && poolK >= k, s"need poolK >= k >= 1: k=$k poolK=$poolK")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda must be in [0,1]: $lambda")
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val pool = c.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .withColumn("rel", cosine(col("qvec"), col("nvec")))
      .withColumn("rank",
        row_number().over(Window.partitionBy("qid")
          .orderBy(col("rel").desc, col("nid"))))
      .filter(col("rank") <= poolK)
      .select(col("qid"), col("nid"), col("rel"),
        col("nvec").cast("array<float>").as("nvec"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val out = pool.as[(Long, Long, Double, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        // nid-ascending iteration makes "first strict max" the
        // (mmr DESC, nid ASC) tie rule the oracle's row_number uses
        val cands = it.toArray.sortBy(_._2)
        val n = cands.length
        // max over a NONEMPTY selected set can be negative — only the
        // empty set (step 1) uses the 0.0 convention, so the running
        // max starts at -inf and the first update sets the true value
        val maxSim = Array.fill(n)(Double.NegativeInfinity)
        val picked = Array.fill(n)(false)
        (1 to math.min(k, n)).iterator.map { step =>
          var best = -1
          var bestScore = Double.NaN
          var i = 0
          while (i < n) {
            if (!picked(i)) {
              val ms = if (step == 1) 0.0 else maxSim(i)
              val sc = lambda * cands(i)._3 - (1.0 - lambda) * ms
              if (best < 0 || sc > bestScore) { best = i; bestScore = sc }
            }
            i += 1
          }
          picked(best) = true
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val s = cosineJvm(cands(j)._4, cands(best)._4)
              if (s > maxSim(j)) maxSim(j) = s
            }
            j += 1
          }
          (qid, step, cands(best)._2, cands(best)._3, bestScore)
        }
      }
      .toDF("qid", "rank", "nid", "rel", "mmr")
    // `+ 0.0` folds Spark's HALF_UP round of a tiny negative score
    // (+0.0) and DuckDB's (-0.0) onto the same sign — mmr sits near
    // zero by construction (λ·rel ≈ (1−λ)·maxsim), so without the
    // fold any score in (-0.00005, 0) is a dual-engine hash flake.
    out.select(col("qid"), col("rank"), col("nid"),
      (roundPinned(col("rel"), 4)).as("rel_r"),
      (roundPinned(col("mmr"), 4)).as("mmr_r"))
  }

  /** The fused [[cosine]] expression's arithmetic, verbatim, for
    * per-group driver/executor-side loops that must stay bit-identical
    * to the relational path (same float→double casts, same
    * interleaved left-to-right accumulation).
    */
  private[graft] def cosineJvm(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x(i).toDouble
      val yv = y(i).toDouble
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Margin-based bitext/pair mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix alignment criterion): score every candidate pair
    * (x ∈ A, y ∈ B) by `cos(x,y) / (avgTopK(x)/2 + avgTopK(y)/2)` —
    * raw cosine normalized by each side's local similarity
    * neighborhood, which kills the hub vectors that plain
    * cosine-threshold mining mispairs — and keep MUTUAL best matches
    * above `threshold`. The standard parallel-corpus miner; equally
    * the right criterion for near-duplicate pairing across two
    * snapshots/sources.
    *
    * Scale shape: side A broadcasts against a streaming B (the
    * [[bruteForceTopK]] contract — A is the bounded "query" side);
    * for two huge sides, generate candidates with [[annTopK]] per
    * direction first and feed the SAME margin re-score — the
    * criterion only needs (pair sims + per-id top-k sums). The
    * top-k neighborhood sums are QUANTIZED to longs before summing
    * (`round(sim·1e9)`), so the only order-sensitive float reduction
    * in the op is exact integer arithmetic and any engine replays the
    * margins bit-for-bit.
    *
    * @return (a_id, b_id, sim_r, margin_r) — mutual best pairs with
    *         margin > threshold, one row per mined pair
    */
  def marginMine(
      a: DataFrame,
      b: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 4,
      threshold: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val av = a.select(col(idCol).as("a_id"), col(vecCol).as("avec"))
    val bv = b.select(col(idCol).as("b_id"), col(vecCol).as("bvec"))
    val sims = graft.CachedFrames.persistOnce(
      bv.crossJoin(broadcast(av))
        .select(col("a_id"), col("b_id"),
          cosine(col("avec"), col("bvec")).as("sim"),
          roundPinned(cosine(col("avec"), col("bvec")) * lit(1e9)).cast("long").as("__q")))
    def topKAvg(side: String): DataFrame = {
      val other = if (side == "a_id") "b_id" else "a_id"
      val w = Window.partitionBy(side).orderBy(col("sim").desc, col(other))
      sims
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .groupBy(col(side))
        // exact integer sum of quantized sims: order-free, replayable.
        // Denominator is the ACTUAL neighborhood size (≤ k): dividing
        // by a constant k when a side has fewer than k candidates
        // deflates the average and inflates every margin — the
        // Artetxe & Schwenk criterion averages over the neighbors
        // that exist.
        .agg((sum(col("__q")).cast("double") / lit(1e9) /
            least(count(lit(1)), lit(k.toLong)).cast("double"))
          .as(s"__avg_$side"))
    }
    val margins = sims
      .join(broadcast(topKAvg("a_id")), Seq("a_id"))
      .join(broadcast(topKAvg("b_id")), Seq("b_id"))
      .withColumn("margin",
        col("sim") / (col("__avg_a_id") / lit(2.0) + col("__avg_b_id") / lit(2.0)))
    val fw = Window.partitionBy("a_id").orderBy(col("margin").desc, col("b_id"))
    val bw = Window.partitionBy("b_id").orderBy(col("margin").desc, col("a_id"))
    margins
      .withColumn("__fw", row_number().over(fw))
      .withColumn("__bw", row_number().over(bw))
      .filter(col("__fw") === 1 && col("__bw") === 1 && col("margin") > threshold)
      // + 0.0: pin zero's sign across engines (see mmrRerank)
      .select(col("a_id"), col("b_id"),
        (roundPinned(col("sim"), 4)).as("sim_r"),
        (roundPinned(col("margin"), 4)).as("margin_r"))
  }
}
