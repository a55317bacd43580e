package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end medallion smoke: the reference's operational surface is
  * 13 chained spark-submit jobs (`/root/reference/run-all-pipelines.sh:3-239`)
  * — extract each entity from raw JSON into bronze, clean bronze into
  * typed silver, enrich the checkin fact against the business dim into
  * an OBT. This runs the same chain through [[Pipelines]] over the
  * checked-in fixtures into a temp warehouse and checks the final OBT.
  */
class MedallionSpec extends SparkSpec {

  private val fixtures = Map(
    "business" -> "/root/repo/fixtures/business.ndjson",
    "checkin" -> "/root/repo/fixtures/checkin.ndjson",
    "review" -> "/root/repo/fixtures/review.ndjson",
    "tip" -> "/root/repo/fixtures/tip.ndjson")

  test("extract -> clean -> enrich chains over the fixtures into an OBT") {
    val lake = Files.createTempDirectory("graft-lake").toString

    // bronze + silver for every fixture entity, as run-all-pipelines.sh
    // does per entity (extract then clean)
    fixtures.foreach { case (entity, path) =>
      Pipelines.extract(spark, PipelineConfig(entity, path, s"$lake/bronze/$entity"))
      Pipelines.clean(spark,
        PipelineConfig(entity, s"$lake/bronze/$entity", s"$lake/silver/$entity"),
        deterministicIds = entity == "checkin")
    }

    // enrich: checkin fact ⋈ business dim → OBT
    // (run-all-pipelines.sh:213-239 shape)
    val obt = Pipelines.enrich(spark,
      PipelineConfig("checkin", s"$lake/silver/checkin", s"$lake/silver/checkin_obt"),
      dimensions = Seq("business" -> s"$lake/silver/business"))

    // the checkin fixture explodes to 9 checkins, all of which join a
    // business row — OBT must preserve fact cardinality
    val written = spark.read.parquet(s"$lake/silver/checkin_obt")
    assert(written.count() == 9)
    assert(obt.columns.contains("checkin_id"))
    // dim columns arrive prefixed (enrich.py's OBT aliasing)
    val prefix = "business_"
    assert(obt.columns.exists(c => c.startsWith(prefix) && c != "business_id"))
    // spot-check a joined value: checkin rows for b01 carry b01's city
    val b01City = written
      .filter(col("business_id") === "b01")
      .select(col(s"${prefix}city")).distinct().collect()
    assert(b01City.map(_.getString(0)).toSeq == Seq("Springfield"))
    // silver review/tip carry the date-feature columns with the source
    // column dropped (clean.py:131-146)
    val review = spark.read.parquet(s"$lake/silver/review")
    assert(review.columns.contains("date_year") && !review.columns.contains("date"))
    assert(review.count() == 5)
    val tip = spark.read.parquet(s"$lake/silver/tip")
    assert(tip.columns.contains("date_dayofweek") && !tip.columns.contains("date"))
    assert(tip.count() == 5)
  }
}
