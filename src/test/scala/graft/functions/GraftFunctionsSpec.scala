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

  test("graft_matvec_dots via SQL equals the fused Column API and the composed fold form") {
    val s = spark.newSession()
    GraftFunctions.register(s)
    import s.implicits._
    val matrix = Array(Array(1.0, 0.0, -1.0), Array(0.5, 0.5, 0.5))
    Seq(Array(1.0f, 2.0f, 4.0f), Array(-1.0f, 0.0f, 1.0f))
      .toDF("v").createOrReplaceTempView("vecs")
    // decimal literals in the SQL matrix: the builder casts to double
    val sql = s.sql(
      """SELECT graft_matvec_dots(v, array(array(1.0, 0.0, -1.0),
        |                                  array(0.5, 0.5, 0.5))) AS d
        |FROM vecs""".stripMargin)
      .as[Seq[Double]].collect().toSeq
    val api = s.table("vecs")
      .select(MatVecDotsExpr.matVecDots(col("v"), matrix).as("d"))
      .as[Seq[Double]].collect().toSeq
    assert(sql == api)
    // composed per-row fold (the form the kernel fuses), bit-identical
    val composed = s.table("vecs").select(array(matrix.map { row =>
        aggregate(
          zip_with(col("v"), lit(row), (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x)
      }: _*).as("d"))
      .as[Seq[Double]].collect().toSeq
    assert(sql == composed)
    assert(sql == Seq(Seq(-3.0, 3.5), Seq(-2.0, 0.0)))
  }

  test("MatVecDotsExpr equality is value-based over the matrix contents") {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val child = AttributeReference("v", ArrayType(FloatType))()
    // separately-allocated but equal-valued matrices must compare equal
    // (case-class Array equality is reference-based and broke plan
    // canonicalization: two queries building the same kernel from
    // their own matrix copies never shared exchanges or cache entries)
    val e1 = MatVecDotsExpr(child, Array(Array(1.0, 2.0), Array(3.0, 4.0)))
    val e2 = MatVecDotsExpr(child, Array(Array(1.0, 2.0), Array(3.0, 4.0)))
    val e3 = MatVecDotsExpr(child, Array(Array(1.0, 2.0), Array(3.0, 5.0)))
    assert(e1 == e2 && e1.hashCode == e2.hashCode)
    assert(e1 != e3)
    assert(e1 != Literal(1))
  }

  test("equal-valued matrices canonicalize to one plan and share a cache entry") {
    import graft.CachedFrames
    import spark.implicits._
    def frame() = {
      // fresh allocation per call — only value equality can match these
      val m = Array.tabulate(2, 3)((r, d) => r * 3.0 + d)
      Seq(Array(1.0f, 2.0f, 3.0f)).toDF("v")
        .select(MatVecDotsExpr.matVecDots(col("v"), m).as("d"))
    }
    assert(frame().queryExecution.analyzed.canonicalized ==
      frame().queryExecution.analyzed.canonicalized)
    CachedFrames.unpersistAll()
    try {
      CachedFrames.persistOnce(frame())
      CachedFrames.persistOnce(frame())
      assert(CachedFrames.size == 1)
    } finally CachedFrames.unpersistAll()
  }

  test("graft_matvec_dots names the position of a null matrix element") {
    val s = spark.newSession()
    GraftFunctions.register(s)
    val err = intercept[Exception] {
      s.sql("SELECT graft_matvec_dots(array(1.0f), " +
        "array(array(1.0), array(CAST(NULL AS DOUBLE))))").collect()
    }
    assert(err.getMessage.contains("[1][0]"), err.getMessage)
  }

  test("graft_matvec_dots rejects a non-foldable matrix argument") {
    val s = spark.newSession()
    GraftFunctions.register(s)
    import s.implicits._
    Seq((Array(1.0f), Array(Array(1.0)))).toDF("v", "m").createOrReplaceTempView("vm")
    val err = intercept[Exception] {
      s.sql("SELECT graft_matvec_dots(v, m) FROM vm").collect()
    }
    assert(err.getMessage.contains("foldable"))
  }

  test("graft_bloom_might_contain via SQL equals the Column-API probe") {
    import org.apache.spark.util.sketch.BloomFilter
    val s = spark.newSession()
    GraftFunctions.register(s)
    import s.implicits._
    val bloom = BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(bloom.putLong)
    val b64 = BloomMightContainExpr.serialize(bloom)
    (1L to 100L).toDF("h").createOrReplaceTempView("hs")
    val viaSql = s.sql(
      s"SELECT h FROM hs WHERE graft_bloom_might_contain(h, '$b64') ORDER BY h")
      .as[Long].collect().toSeq
    val viaApi = s.table("hs")
      .filter(BloomMightContainExpr.mightContain(col("h"), bloom))
      .orderBy("h").as[Long].collect().toSeq
    assert(viaSql == viaApi)
    // no false negatives by the Bloom contract
    assert((1L to 50L).toSet.subsetOf(viaSql.toSet))
    // round trip preserves probe behavior exactly
    val back = BloomMightContainExpr.deserialize(b64)
    assert((1L to 100L).forall(h => back.mightContainLong(h) == bloom.mightContainLong(h)))
  }

  test("graft_bloom_might_contain rejects non-foldable and malformed filters") {
    val s = spark.newSession()
    GraftFunctions.register(s)
    import s.implicits._
    Seq((1L, "notbase64!")).toDF("h", "f").createOrReplaceTempView("hf")
    val nonFoldable = intercept[Exception] {
      s.sql("SELECT graft_bloom_might_contain(h, f) FROM hf").collect()
    }
    assert(nonFoldable.getMessage.contains("foldable"))
    val malformed = intercept[Exception] {
      s.sql("SELECT graft_bloom_might_contain(CAST(1 AS BIGINT), 'AAAA')").collect()
    }
    assert(malformed.getMessage.contains("serialized BloomFilter"))
  }

  test("Md5FusionRule rewrites the composed idiom to the fused kernel") {
    val s = spark.newSession()
    GraftFunctions.installOptimizations(s)
    import s.implicits._
    // range source: non-foldable, so ConstantFolding can't pre-empt the plan check
    val df = s.range(3).selectExpr("CAST(id AS STRING) AS t")
      .selectExpr("t", "CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS h")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("md5prefixlongexpr"), s"not fused:\n$optimized")
    assert(!optimized.contains("conv("), s"conv survived:\n$optimized")
    // same values as the unrewritten form on the base session
    val base = spark.range(3).selectExpr("CAST(id AS STRING) AS t")
      .selectExpr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT) AS h")
      .as[Long].collect().toSeq
    assert(df.select($"h").as[Long].collect().toSeq == base)
  }

  test("Md5FusionRule leaves non-matching conv/substring expressions alone") {
    val s = spark.newSession()
    GraftFunctions.installOptimizations(s)
    // n=16 could overflow a long: must NOT fuse; base-8 conv: must not fuse
    val df = s.range(1).selectExpr("CAST(id AS STRING) AS t").selectExpr(
      "CAST(conv(substring(md5(t), 1, 16), 16, 10) AS BIGINT) AS h16",
      "CAST(conv(substring(md5(t), 1, 5), 8, 10) AS BIGINT) AS h8",
      "conv(substring(md5(t), 1, 5), 16, 10) AS raw")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("md5prefixlongexpr"), s"over-fused:\n$optimized")
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
