package graft.io

import graft.SparkSpec
import graft.ops.Enrich
import org.apache.spark.sql.functions._

/** Executes the S3 sink path and the reference's SPJ configs against
  * [[FakeV2Catalog]] (VERDICT r14 #3): with no Iceberg jar resolvable
  * offline, this is the only way `icebergCreateOrReplace`'s RTAS +
  * transform assembly and the storage-partitioned-join planning
  * (`/root/reference/yelp_etl/common/write.py:24-53`,
  * `enrich.py:35-43`) actually RUN. IcebergSinkSpec remains the
  * real-runtime gate and still cancels until a jar lands.
  */
class V2CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def withFakeCatalog[A](confs: Map[String, String] = Map.empty)(body: => A): A = {
    spark.conf.set("spark.sql.catalog.fake", classOf[FakeV2Catalog].getName)
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally {
      prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      FakeV2Catalog.clear()
    }
  }

  test("icebergCreateOrReplace executes RTAS with identity+bucket transforms") {
    withFakeCatalog() {
      val df = Seq(("b01", "IL", 1L), ("b02", "IL", 2L), ("b03", "CA", 3L))
        .toDF("business_id", "state", "n")
      Sink.icebergCreateOrReplace(
        df, "fake.db.business",
        Sink.PartitionSpec(Some("state"), Some("business_id"), Some(4)))
      // The write.py:36-53 transform assembly, observable on the table.
      val table = spark.sessionState.catalogManager.catalog("fake")
        .asInstanceOf[FakeV2Catalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "business"))
      assert(table.partitioning().map(_.name()).toSeq == Seq("identity", "bucket"))
      // Round-trip through the V2 read path.
      val back = spark.table("fake.db.business")
      assert(back.select("business_id", "state", "n").as[(String, String, Long)]
        .collect().toSet == Set(("b01", "IL", 1L), ("b02", "IL", 2L), ("b03", "CA", 3L)))
      // createOrReplace is a full replace, not an append.
      Sink.icebergCreateOrReplace(df.limit(1), "fake.db.business", Sink.PartitionSpec())
      assert(spark.table("fake.db.business").count() == 1)
    }
  }

  test("spjConfigs plan a shuffle-free join over co-bucketed tables (and the control shuffles)") {
    val confs = Enrich.spjConfigs ++ Map(
      // no broadcast: a broadcast join has no Exchange either and would
      // make the SPJ assertion vacuous
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    withFakeCatalog(confs) {
      val facts = spark.range(0, 100)
        .select((col("id") % 10).as("k"), col("id").as("v"))
      val dims = spark.range(0, 10)
        .select(col("id").as("k"), concat(lit("dim"), col("id")).as("name"))
      val spec = Sink.PartitionSpec(bucketColumn = Some("k"), buckets = Some(4))
      Sink.icebergCreateOrReplace(facts, "fake.db.facts", spec)
      Sink.icebergCreateOrReplace(dims, "fake.db.dims", spec)

      val joined = spark.table("fake.db.facts")
        .join(spark.table("fake.db.dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed V2 join still shuffles:\n$plan")
      assert(joined.count() == 100)
      assert(joined.filter(col("name") === "dim3").count() == 10)

      // Control: same join with v2 bucketing off must shuffle — proves
      // the no-Exchange assertion above is the SPJ configs at work.
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val control = spark.table("fake.db.facts")
        .join(spark.table("fake.db.dims"), "k")
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    }
  }
}
