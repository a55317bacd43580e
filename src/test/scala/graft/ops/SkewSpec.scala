package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin returns exactly the plain inner-join result") {
    // hot key: 80% of facts share business "hot"
    val fact = ((1 to 80).map(i => (i.toLong, "hot")) ++
      (81 to 100).map(i => (i.toLong, s"b${i % 5}"))).toDF("fact_id", "key")
    val dim = (Seq("hot") ++ (0 until 5).map(i => s"b$i"))
      .zipWithIndex.map { case (k, i) => (k, s"name_$i") }.toDF("key", "name")
    val plain = fact.join(dim, Seq("key"), "inner")
      .select("fact_id", "key", "name").as[(Long, String, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "key", salts = 8, col("fact_id"))
      .select("fact_id", "key", "name").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 100)
  }

  test("salt spreads a hot key across buckets deterministically") {
    val fact = (1 to 200).map(i => (i.toLong, "hot")).toDF("fact_id", "key")
    val buckets = fact.select(Skew.salt(8, col("fact_id")).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(buckets.keys.forall(s => s >= 0 && s < 8))
    assert(buckets.size >= 6, s"hot key should spread over most buckets: $buckets")
    assert(buckets.values.max <= 60, s"no bucket should dominate: $buckets")
    // deterministic: same inputs → same buckets
    val again = fact.select(Skew.salt(8, col("fact_id")).as("s"))
      .groupBy("s").count().as[(Int, Long)].collect().toMap
    assert(again == buckets)
  }

  test("joinKeyProfile: exact per-side counts, one-sided keys, bounded cut") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("lk")
    val right = Seq(1L, 1L, 2L, 9L).toDF("rk")
    val got = Skew.joinKeyProfile(left, right, "lk", "rk", topK = 10)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((3L, 2L, 6L)))
    assert(got(2L) == ((1L, 1L, 1L)))
    // keys on one side only appear with a zero estimate
    assert(got(3L) == ((1L, 0L, 0L)))
    assert(got(9L) == ((0L, 1L, 0L)))
    // est_pairs is exact: inner-join row count equals the estimate sum
    val joined = left.join(right, col("lk") === col("rk")).count()
    assert(joined == got.values.map(_._3).sum)
    // the cut is bounded without a global sort
    val plan = Skew.joinKeyProfile(left, right, "lk", "rk", 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must bound:\n$plan")
    assert(Skew.joinKeyProfile(left, right, "lk", "rk", 2).count() == 2)
  }
}
