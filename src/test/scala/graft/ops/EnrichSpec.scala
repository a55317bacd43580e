package graft.ops

import graft.SparkSpec

class EnrichSpec extends SparkSpec {
  import spark.implicits._

  test("oneBigTable prefixes dim columns, inner-joins, drops dup key") {
    val fact = Seq(("r1", "b1", "u1", 5.0), ("r2", "b2", "u1", 3.0), ("r3", "bX", "u2", 1.0))
      .toDF("review_id", "business_id", "user_id", "stars")
    val business = Seq(("b1", "Cafe A"), ("b2", "Cafe B")).toDF("business_id", "name")
    val user = Seq(("u1", "Ann"), ("u2", "Bo")).toDF("user_id", "name")

    val obt = Enrich.oneBigTable(fact, Seq(
      Enrich.Dim("business", business, Enrich.yelpJoinKey("business")),
      Enrich.Dim("user", user, Enrich.yelpJoinKey("user"))))

    assert(obt.columns.toSeq ===
      Seq("review_id", "business_id", "user_id", "stars", "business_name", "user_name"))
    // inner join drops r3 (business bX has no dim row)
    val rows = obt.orderBy("review_id").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("r1", "r2"))
    assert(rows.head.getAs[String]("business_name") === "Cafe A")
    assert(rows.head.getAs[String]("user_name") === "Ann")
  }

  test("join key rule: user → user_id, others → business_id") {
    assert(Enrich.yelpJoinKey("user") === "user_id")
    assert(Enrich.yelpJoinKey("business") === "business_id")
    assert(Enrich.yelpJoinKey("anything") === "business_id")
  }

  test("salted dim joins on (key, salt) and matches the plain join") {
    import org.apache.spark.sql.functions.col
    val fact = Seq(("r1", "b1", 5.0), ("r2", "b1", 3.0), ("r3", "b1", 1.0),
        ("r4", "b2", 2.0))
      .toDF("review_id", "business_id", "stars")
    val business = Seq(("b1", "Cafe A"), ("b2", "Cafe B")).toDF("business_id", "name")

    val plain = Enrich.oneBigTable(fact, Seq(
      Enrich.Dim("business", business, "business_id")))
    val salted = Enrich.oneBigTable(fact, Seq(
      Enrich.Dim("business", business, "business_id",
        broadcastHint = false, saltBuckets = 4)),
      factSaltSource = Some(col("review_id")))

    // identical results; the hot key b1 spreads over salt buckets
    assert(salted.orderBy("review_id").collect().toSeq
      === plain.select(salted.columns.map(col).toIndexedSeq: _*)
        .orderBy("review_id").collect().toSeq)

    // plan pin: with broadcast off, the shuffle key is (key, salt) —
    // force the shuffle path so the Exchange is visible at test scale
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = Enrich.oneBigTable(fact, Seq(
        Enrich.Dim("business", business, "business_id",
          broadcastHint = false, saltBuckets = 4)),
        factSaltSource = Some(col("review_id")))
        .queryExecution.executedPlan.toString
      val exchanges = plan.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.nonEmpty, "expected a shuffle exchange")
      assert(exchanges.forall(l => l.contains("__salt")),
        s"join shuffle must partition on (key, salt):\n${exchanges.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }
}
