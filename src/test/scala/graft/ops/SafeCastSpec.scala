package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.types._

class SafeCastSpec extends SparkSpec {
  import spark.implicits._

  test("first no-new-NULLs candidate wins, in order") {
    val df = Seq(
      ("""{"a": true, "b": false}""", "true", "free"),
      ("""{"c": true}""", "false", "paid"))
      .toDF("mapbool", "bool", "str")
    val out = SafeCast.convertColumns(
      df, Seq("mapbool", "bool", "str"), SafeCast.yelpAttributeCandidates)
    val fields = out.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(fields("mapbool") === MapType(StringType, BooleanType))
    assert(fields("bool") === BooleanType)
    assert(fields("str") === StringType) // nothing passed → stays string
  }

  test("map of strings falls through bool-map to string-map") {
    val df = Seq("""{"k": "v"}""", """{"k2": "v2"}""").toDF("m")
    val out = SafeCast.convertColumns(df, Seq("m"), SafeCast.yelpAttributeCandidates)
    assert(out.schema("m").dataType === MapType(StringType, StringType))
  }

  test("pre-existing NULLs don't block a conversion (<= comparison)") {
    val df = Seq(Some("true"), None, Some("false")).toDF("b")
    val out = SafeCast.convertColumns(df, Seq("b"), SafeCast.yelpAttributeCandidates)
    assert(out.schema("b").dataType === BooleanType)
    assert(out.collect().count(_.isNullAt(0)) === 1)
  }

  test("mixed valid/invalid stays string (conversion would add NULLs)") {
    val df = Seq("true", "maybe", "false").toDF("b")
    val out = SafeCast.convertColumns(df, Seq("b"), SafeCast.yelpAttributeCandidates)
    assert(out.schema("b").dataType === StringType)
  }

  test("empty column list is a no-op") {
    val df = Seq("x").toDF("c")
    assert(SafeCast.convertColumns(df, Nil, SafeCast.yelpAttributeCandidates)
      .collect().map(_.getString(0)).toSeq === Seq("x"))
  }
}
