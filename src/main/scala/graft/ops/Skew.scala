package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * First line of defense at runtime is AQE
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default), which
  * splits oversized sort-merge partitions after shuffle statistics are
  * known. Salting is the plan-level tool for the cases AQE cannot fix:
  * broadcast-ineligible joins against a dimension with a few hot keys,
  * or aggregations where one group dwarfs the rest.
  *
  *  - [[saltedJoin]]: the fact side gets a uniform random-free salt
  *    derived from a row fingerprint (deterministic — no
  *    `rand()`-style nondeterminism that breaks retries and oracle
  *    comparisons); the dim side is exploded `salts`-fold so every
  *    (key, salt) bucket finds its dim row. Hot keys spread over
  *    `salts` reducers at the cost of replicating the (small) dim.
  *  - [[twoPhaseAgg]] pattern: pre-aggregate by (key, salt), then
  *    final-aggregate by key — expressed directly with the public API
  *    in the scaladoc example; partial aggregation already gives this
  *    for algebraic aggregates, so a helper is only warranted for
  *    size-bounded-state cases (e.g. collect-style aggs).
  */
object Skew {

  /** Deterministic salt in [0, salts): fingerprint the salt-source
    * columns (e.g. the row's unique id) — NOT the join key, which
    * would put every copy of a hot key in one bucket again.
    */
  def salt(salts: Int, saltSource: Column*): Column =
    pmod(xxhash64(saltSource: _*), lit(salts.toLong)).cast("int")

  /** Inner equi-join with a salted key: `fact` rows are bucketed by a
    * deterministic salt of `factSaltSource` (a unique-ish column such
    * as the fact's primary key), `dim` is replicated once per salt
    * bucket. Semantics identical to `fact.join(dim, fact(key) ===
    * dim(key), "inner")`; the shuffle key becomes (key, salt), so a
    * hot key occupies `salts` reducers instead of one.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int,
      factSaltSource: Column): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__salt", salt(salts, factSaltSource))
    // sequence(int, int) yields array<int>, so the exploded salt is
    // already int-typed (a cast around a generator is not allowed)
    val saltedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }

  /** Join-key skew diagnostics — the "why is my join slow / which
    * keys need salting" report, produced BEFORE paying for the join:
    * for the `topK` heaviest prospective keys, per-side row counts
    * and the estimated join output (`n_left · n_right` — exact for an
    * inner equi-join). Keys present on one side only still appear
    * (they cost scan/shuffle but produce nothing — the other common
    * surprise). Feed the report's hot keys to [[saltedJoin]]'s
    * `salts` sizing, or broadcast/fence them separately.
    *
    * Scale shape: two map-side-combined per-key counts (each
    * key-cardinality-sized, never row-sized), one full-outer
    * key-join between them, and a `topK` cut that lowers to
    * TakeOrderedAndProject — every partition keeps `topK` rows, no
    * global sort of the key space.
    */
  def joinKeyProfile(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      topK: Int): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val lc = left.groupBy(col(leftKey).as("key"))
      .agg(count(lit(1)).as("__nl"))
    val rc = right.groupBy(col(rightKey).as("key"))
      .agg(count(lit(1)).as("__nr"))
    lc.join(rc, Seq("key"), "full")
      .select(
        col("key"),
        coalesce(col("__nl"), lit(0L)).as("n_left"),
        coalesce(col("__nr"), lit(0L)).as("n_right"))
      .withColumn("est_pairs", col("n_left") * col("n_right"))
      .orderBy(col("est_pairs").desc, col("key"))
      .limit(topK)
  }
}
