package graft.ops

import graft.SparkSpec
import java.sql.Date

class DateFeaturesSpec extends SparkSpec {

  test("dateFeatures derives the 8 calendar columns and drops the source") {
    import spark.implicits._
    val df = Seq("2018-07-04", "2020-01-01", "not-a-date").toDF("date")
    val out = DateFeatures.withDateFeatures(df, "date", Some("yyyy-MM-dd"))
    assert(out.columns.toSeq === Seq(
      "date_ts", "date_date", "date_week_start_date", "date_week",
      "date_quarter", "date_dayofweek", "date_month", "date_year"))
    val r = out.where("date_year = 2018").head()
    assert(r.getAs[Date]("date_date") === Date.valueOf("2018-07-04"))
    // 2018-07-04 is a Wednesday; week starts Monday 2018-07-02
    assert(r.getAs[Date]("date_week_start_date") === Date.valueOf("2018-07-02"))
    assert(r.getAs[Int]("date_week") === 27)
    assert(r.getAs[Int]("date_quarter") === 3)
    assert(r.getAs[Int]("date_dayofweek") === 4) // Sunday=1 … Wednesday=4
    assert(r.getAs[Int]("date_month") === 7)
  }

  test("malformed input yields NULL features, not an error") {
    import spark.implicits._
    val df = Seq("nope").toDF("d")
    val r = DateFeatures.withDateFeatures(df, "d", Some("yyyy-MM-dd")).head()
    assert((0 until r.length).forall(r.isNullAt))
  }

  test("timestamp-typed source needs no format") {
    import spark.implicits._
    val df = Seq("2019-03-31 23:59:59").toDF("s")
      .selectExpr("cast(s as timestamp) as t")
    val r = DateFeatures.withDateFeatures(df, "t").head()
    assert(r.getAs[Int]("t_quarter") === 1)
    assert(r.getAs[Int]("t_year") === 2019)
  }
}
