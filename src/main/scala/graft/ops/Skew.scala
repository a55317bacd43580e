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
}
