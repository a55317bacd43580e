package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SchemaOpsSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def nestedDf = {
    val ambience = StructType(Seq(StructField("Casual", StringType)))
    val attributes = StructType(Seq(
      StructField("WiFi", StringType), StructField("Ambience", ambience)))
    val hours = StructType(Seq(StructField("Monday", StringType)))
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("attributes", attributes),
      StructField("hours", hours)))
    val rows = Seq(
      Row("b1", Row("u'free'", Row("True")), Row("7:0-20:0")),
      Row("b2", null, Row(null)))
    spark.createDataFrame(rows.asJava, schema)
  }

  test("flatten expands selected structs recursively with lowercase underscore names") {
    val out = SchemaOps.flatten(nestedDf, Seq("attributes"))
    assert(out.columns.toSeq ===
      Seq("id", "attributes_wifi", "attributes_ambience_casual", "hours"))
    val r = out.where("id = 'b1'").head()
    assert(r.getString(1) === "u'free'")
    assert(r.getString(2) === "True")
  }

  test("flatten of a NULL struct yields NULL leaves") {
    val out = SchemaOps.flatten(nestedDf, Seq("attributes"))
    val r = out.where("id = 'b2'").head()
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("flattenedColumnNames returns only the new columns, sorted") {
    assert(SchemaOps.flattenedColumnNames(nestedDf, Seq("attributes")) ===
      Seq("attributes_ambience_casual", "attributes_wifi"))
  }

  test("flatten with no `only` filter flattens every struct") {
    val out = SchemaOps.flatten(nestedDf, Seq("attributes", "hours"))
    assert(out.columns.toSeq ===
      Seq("id", "attributes_wifi", "attributes_ambience_casual", "hours_monday"))
  }
}
