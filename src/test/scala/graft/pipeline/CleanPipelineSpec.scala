package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** End-to-end clean-stage semantics on Yelp-shaped fixtures
  * (FIXTURES.md §1 — the reference ships no data, so these fixtures
  * encode exactly the tricky values clean.py exists to handle).
  */
class CleanPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def businessFixture: DataFrame = {
    val json = Seq(
      """{"business_id":"b1","name":"Cafe A","is_open":1,"stars":4.5,
         |"categories":"Coffee & Tea, Cafes",
         |"attributes":{"WiFi":"u'free'","BikeParking":"True",
         |  "Ambience":"{'romantic': False, u'casual': True, 'touristy': None}",
         |  "RestaurantsPriceRange2":"None","GoodForMeal":"none"},
         |"hours":{"Monday":"7:0-20:0","Saturday":"10:30-21:0"}}""".stripMargin.replaceAll("\n", ""),
      """{"business_id":"b2","name":"Bar B","is_open":0,"stars":3.0,
         |"categories":null,
         |"attributes":{"WiFi":"u'no'","BikeParking":"False",
         |  "Ambience":"{'romantic': True}",
         |  "RestaurantsPriceRange2":"2","GoodForMeal":"none"},
         |"hours":{"Monday":null,"Saturday":"9:0-17:0"}}""".stripMargin.replaceAll("\n", ""))
    spark.read.json(json.toDS())
  }

  test("business clean: attribute typing, hours split, categories array") {
    val out = Pipelines.cleanTransform(businessFixture, "business")
    val fields = out.schema.fields.map(f => f.name -> f.dataType).toMap

    // data-dependently chosen types (clean.py:95-106 semantics)
    assert(fields("attributes_ambience") === MapType(StringType, BooleanType))
    assert(fields("attributes_bikeparking") === BooleanType)
    assert(fields("attributes_wifi") === StringType)   // "free"/"no" not boolean
    assert(fields("is_open") === BooleanType)
    assert(fields("categories").asInstanceOf[ArrayType].elementType === StringType)
    // hours flattened+split to ints, source dropped
    assert(fields("hours_monday_start_hour") === IntegerType)
    assert(!out.columns.contains("hours_monday"))

    val b1 = out.where("business_id = 'b1'").head()
    assert(b1.getAs[Boolean]("is_open"))
    assert(b1.getAs[Seq[String]]("categories") === Seq("Coffee & Tea", "Cafes"))
    assert(b1.getAs[String]("attributes_wifi") === "free")
    assert(b1.getAs[Map[String, Boolean]]("attributes_ambience") ===
      Map("romantic" -> false, "casual" -> true, "touristy" -> null))
    // whole-value None/none → NULL (clean.py:79-84)
    assert(b1.isNullAt(b1.fieldIndex("attributes_goodformeal")))
    assert(b1.getAs[Int]("hours_monday_start_hour") === 7)
    assert(b1.getAs[Int]("hours_monday_start_minute") === 0)
    assert(b1.getAs[Int]("hours_monday_end_hour") === 20)
    assert(b1.getAs[Int]("hours_saturday_start_minute") === 30)

    val b2 = out.where("business_id = 'b2'").head()
    assert(!b2.getAs[Boolean]("is_open"))
    assert(b2.isNullAt(b2.fieldIndex("hours_monday_start_hour")))
    // "2" stays string: every candidate (maps via from_json, boolean
    // via try_cast) turns it to NULL, which the no-new-NULLs rule rejects.
    assert(b2.getAs[String]("attributes_restaurantspricerange2") === "2")
  }

  test("checkin clean: explode + surrogate id + date features") {
    val checkin = Seq(
      ("b1", "2018-07-04 12:00:00, 2018-07-05 13:30:00"),
      ("b2", "2020-01-01 00:00:00"))
      .toDF("business_id", "date")
    val out = Pipelines.cleanTransform(checkin, "checkin", deterministicIds = true)
    assert(out.count() === 3) // exploded
    assert(out.columns.contains("checkin_id"))
    assert(out.columns.contains("date_ts") && !out.columns.contains("date"))
    val ids = out.select("checkin_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(0L, 1L, 2L))
    val weeks = out.where("business_id = 'b1'")
      .select("date_week").collect().map(_.getInt(0)).toSet
    assert(weeks === Set(27))
  }

  test("user clean: yelping_since date features with yyyy-MM-dd format") {
    val user = Seq(("u1", "2015-02-10")).toDF("user_id", "yelping_since")
    val out = Pipelines.cleanTransform(user, "user")
    assert(!out.columns.contains("yelping_since"))
    val r = out.head()
    assert(r.getAs[java.sql.Date]("yelping_since_date") ===
      java.sql.Date.valueOf("2015-02-10"))
    assert(r.getAs[Int]("yelping_since_year") === 2015)
  }
}
