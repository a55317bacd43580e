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
}
