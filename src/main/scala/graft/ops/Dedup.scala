package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis.{baseHash, h64, shingles}

/** Corpus deduplication for LLM training-data pipelines: exact
  * (content-hash groupBy), near-dup (MinHash + LSH banding), SimHash,
  * and exact n-gram Jaccard verification.
  *
  * 100 TB design notes:
  *  - Exact dedup is one hash-shuffle groupBy with map-side partial
  *    aggregation — the minimum possible cost for global dedup.
  *  - MinHash signatures are a single codegen'd projection (no
  *    shuffle); LSH banding shuffles `bands × rows` small records by
  *    band hash and only ever compares documents that share a bucket —
  *    never all pairs. Candidate volume is controlled by (k, bands):
  *    P(candidate) = 1 − (1 − J^r)^b for true Jaccard J, r = k/bands.
  *  - SimHash is explode → groupBy(id) with 64 tiny sums — partial
  *    aggregation makes the shuffle per-doc, not per-token.
  *  - All-pairs exact Jaccard exists only as the *verification* step
  *    over LSH candidates (or an explicitly bounded id range); the
  *    engine never plans an unbounded cross join.
  *
  * Hashing defaults to the oracle-reproducible [[TextAnalysis.h64]];
  * pass `TextAnalysis.fastH64` for production throughput.
  */
object Dedup {

  type Hasher = (Column, Column) => Column

  // ---------------------------------------------------------------- exact

  /** Content fingerprint for exact dedup. */
  def fingerprint(text: Column): Column = md5(text)

  /** Exact dedup groups: fingerprint → surviving (minimum) id + copy
    * count. One hash-shuffle aggregation.
    */
  def exactDupGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(fingerprint(col(textCol)).as("fingerprint"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))

  /** Keep one row (minimum id) per distinct content. */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val survivors = exactDupGroups(df, textCol, idCol)
      .select(col("survivor_id").as(idCol))
    df.join(survivors, Seq(idCol), "left_semi")
  }

  // -------------------------------------------------------------- minhash

  /** MinHash permutation family: `h_i(x) = (a_i · base(x) + b_i) mod P`
    * with deterministic 30-bit constants, so the expensive md5 base
    * hash is computed once per shingle and the k permutations are two
    * integer ops each. An external oracle reproduces the constants
    * from the same formulas.
    */
  val minhashP: Long = 1000000007L
  def minhashA(i: Int): Long = ((i + 1).toLong * 2654435761L) % minhashP
  def minhashB(i: Int): Long = ((i + 1).toLong * 40503L) % minhashP

  /** id → k-slot MinHash signature of the word-`shingleN`-gram set.
    *
    * Relational shape: explode shingles → base-hash each once →
    * groupBy(id) with k `min` aggregates → repack as an array. The
    * hash aggregate is plain codegen'd arithmetic (no array lambdas —
    * an earlier nested `transform`/`array_min` formulation spent
    * several seconds in codegen and risked per-reference re-evaluation
    * of the md5 array), partial aggregation combines map-side, and the
    * explicit keyed pre-repartition parallelizes hashing from
    * single-split sources while pre-satisfying the groupBy
    * distribution (no post-explode shuffle).
    */
  def signatures(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 16,
      shingleN: Int = 3,
      baseHasher: Column => Column = baseHash): DataFrame = {
    val exploded = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), explode(shingles(col(textCol), shingleN)).as("__sh"))
      .select(col(idCol), baseHasher(col("__sh")).as("__b"))
    val mins = (0 until k).map { i =>
      min((col("__b") * lit(minhashA(i)) + lit(minhashB(i))) % lit(minhashP)).as(s"__m$i")
    }
    exploded
      .groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** Explode a signature frame to (id, band, band_hash): `bands` rows
    * per doc, each hashing `k / bands` consecutive signature slots.
    */
  def lshBands(sigDf: DataFrame, idCol: String, k: Int = 16, bands: Int = 8): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val r = k / bands
    sigDf
      .select(col(idCol), col("sig"), explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn(
        "band_hash",
        md5(concat_ws(",",
          transform(slice(col("sig"), col("band") * r + 1, lit(r)), _.cast("string")))))
      .drop("sig")
  }

  /** Candidate pairs (a < b) sharing any LSH bucket. The join key is
    * (band, band_hash), so comparisons happen only within buckets.
    *
    * Skew note: a bucket of B docs contributes B² intermediate pairs.
    * If a corpus has pathologically common content (boilerplate pages,
    * empty docs), pre-filter those buckets — `bandsDf.groupBy("band",
    * "band_hash").count()` and anti-join buckets above a cap — before
    * calling this; the cap trades recall on ultra-common content for a
    * bounded shuffle.
    */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val x = bandsDf.select(col(idCol).as("a"), col("band"), col("band_hash"))
    val y = bandsDf.select(col(idCol).as("b"), col("band"), col("band_hash"))
    x.join(y, Seq("band", "band_hash"))
      .filter(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** Signature-estimated Jaccard: fraction of matching MinHash slots. */
  def estimatedJaccard(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => x <=> y), b => b)).cast("double") / k

  /** Near-duplicate pairs with signature-estimated Jaccard ≥
    * `threshold` (threshold 0 returns every candidate pair). Shape:
    * signature projection → LSH bucket join → estimate on candidates.
    */
  def nearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 16,
      bands: Int = 8,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      baseHasher: Column => Column = baseHash): DataFrame = {
    // The signature frame feeds four plan branches (two self-join
    // sides + two estimate re-joins); persist so the md5 base hashes
    // are computed once. Signatures are k longs per doc — tiny
    // relative to the corpus.
    val sigDf = signatures(df, textCol, idCol, k, shingleN, baseHasher).persist()
    val cand = candidatePairs(lshBands(sigDf, idCol, k, bands), idCol)
    val withEst = cand
      .join(sigDf.select(col(idCol).as("a"), col("sig").as("sig_a")), Seq("a"))
      .join(sigDf.select(col(idCol).as("b"), col("sig").as("sig_b")), Seq("b"))
      .withColumn("est_jaccard", estimatedJaccard(col("sig_a"), col("sig_b"), k))
      .select(col("a"), col("b"), col("est_jaccard"))
    if (threshold > 0) withEst.filter(col("est_jaccard") >= threshold) else withEst
  }

  /** Drop every doc that has a near-dup with a smaller id (greedy
    * keep-first policy — deterministic without connected components;
    * transitive clusters keep their minimum only if it pairs with each
    * member, which LSH near-certainly yields at high thresholds).
    */
  def dedupNear(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 16,
      bands: Int = 8,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      baseHasher: Column => Column = baseHash): DataFrame = {
    val losers = nearDupPairs(df, textCol, idCol, k, bands, shingleN, threshold, baseHasher)
      .select(col("b").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact n-gram Jaccard between two shingle-set columns (distinct
    * semantics). Verification-step primitive — run on LSH candidates,
    * not all pairs.
    */
  def jaccard(shinglesA: Column, shinglesB: Column): Column = {
    val a = array_distinct(shinglesA)
    val b = array_distinct(shinglesB)
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")
  }

  /** Near-dup pairs re-verified with exact shingle Jaccard (the
    * production-quality path: LSH recall, exact precision).
    */
  def verifiedNearDupPairs(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int = 16,
      bands: Int = 8,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      baseHasher: Column => Column = baseHash): DataFrame = {
    val cand = nearDupPairs(df, textCol, idCol, k, bands, shingleN, 0.0, baseHasher)
    val sh = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(col(idCol), shingles(col(textCol), shingleN).as("sh"))
    cand
      .join(sh.select(col(idCol).as("a"), col("sh").as("sh_a")), Seq("a"))
      .join(sh.select(col(idCol).as("b"), col("sh").as("sh_b")), Seq("b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), col("jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** SimHash fingerprint (`bits` ≤ 60 with the default hasher): token
    * hashes vote per bit position; bit j is 1 iff the +1/−1 vote sum is
    * positive. Explode → groupBy(id) keeps the shuffle per-doc via
    * partial aggregation.
    */
  def simhash(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bits: Int = 60,
      hasher: Hasher = h64): DataFrame = {
    // pre-explode repartition: parallelize token hashing across cores
    // even from a single input split, and pre-satisfy the groupBy
    // distribution (see TextAnalysis.winnowingFingerprints)
    val tok = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))
      .select(
        col(idCol),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val hashed = tok.withColumn("h", hasher(lit(0), col("tok")))
    val sums = (0 until bits).map { j =>
      sum(shiftright(col("h"), j).bitwiseAND(lit(1L)) * 2 - 1).as(s"bit_$j")
    }
    val agg = hashed.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
    val fp = (0 until bits)
      .map(j => when(col(s"bit_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col(idCol), fp.as("simhash"))
  }

  /** SimHash near-dup candidates: band the fingerprint into
    * `chunks` bit-slices, bucket-join on any equal slice, then filter
    * by true Hamming distance ≤ `maxHamming`. Same never-all-pairs
    * shape as MinHash LSH.
    */
  def simhashNearDupPairs(
      fpDf: DataFrame,
      idCol: String,
      bits: Int = 60,
      chunks: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    val chunkBits = bits / chunks
    val mask = (1L << chunkBits) - 1
    val banded = fpDf.select(
      col(idCol),
      col("simhash"),
      explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .withColumn(
        "chunk_val",
        // functions.shiftright only takes a literal Int shift; the SQL
        // form accepts a column shift amount.
        call_function("shiftright", col("simhash"), col("chunk") * chunkBits)
          .bitwiseAND(lit(mask)))
    val x = banded.select(
      col(idCol).as("a"), col("simhash").as("fp_a"), col("chunk"), col("chunk_val"))
    val y = banded.select(
      col(idCol).as("b"), col("simhash").as("fp_b"), col("chunk"), col("chunk_val"))
    x.join(y, Seq("chunk", "chunk_val"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), col("fp_a"), col("fp_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming"))
  }
}
