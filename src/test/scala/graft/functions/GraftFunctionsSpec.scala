package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the composed built-in forms") {
    val s = spark.newSession() // isolated function registry
    GraftFunctions.register(s)
    import s.implicits._
    Seq("hello world", "", "graft").toDF("t").createOrReplaceTempView("t")
    val rows = s.sql(
      """SELECT graft_md5_long(t, 15) AS fused,
        |       CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS composed,
        |       graft_md5_long(t) AS fused_default
        |FROM t""".stripMargin)
      .as[(Long, Long, Long)].collect()
    assert(rows.forall { case (f, c, fd) => f == c && fd == c })
  }

  test("graft_cosine via SQL equals the fused Column API") {
    val s = spark.newSession()
    GraftFunctions.register(s)
    import s.implicits._
    Seq((Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)))
      .toDF("a", "b").createOrReplaceTempView("v")
    val sql = s.sql("SELECT graft_cosine(a, b) AS c FROM v").as[Double].head()
    val api = s.table("v")
      .select(CosineSimilarityExpr.cosineSimilarity(col("a"), col("b")).as("c"))
      .as[Double].head()
    assert(sql == api)
    assert(math.abs(sql - 10.0 / 14.0) < 1e-12)
  }

  test("registration is per-session, not global") {
    val s1 = spark.newSession()
    GraftFunctions.register(s1)
    val s2 = spark.newSession() // sibling session, fresh registry
    val err = intercept[Exception] {
      s2.sql("SELECT graft_md5_long('x')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_md5_long"))
    assert(s1.sql("SELECT graft_md5_long('x') AS h").count() == 1)
  }
}
