package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The reference's full 13-job medallion DAG
  * (`/root/reference/run-all-pipelines.sh:3-239`) as one typed,
  * in-session orchestrator: 5 extracts (raw NDJSON → bronze), 5
  * cleans (bronze → typed silver; the dated facts partitioned by
  * `date_year`), 3 enriches (silver fact ⋈ dims → OBT).
  *
  * The reference runs each job as its own `spark-submit`; on a
  * cluster that is the scheduler's concern, and every per-job conf it
  * repeats 13 times (shuffle partitions, executor sizing) is session
  * state here. Jobs run sequentially in dependency order — each job
  * is internally fully parallel, so on one session serial submission
  * loses nothing while keeping failures attributable: the run stops
  * at the first failed job with its name in the error.
  *
  * Layout mirrors the reference's lake namespacing with paths:
  * `lake.{bronze,silver}.yelp.<entity>` →
  * `<lakeDir>/{bronze,silver}/<entity>`, OBTs at
  * `<lakeDir>/silver/<entity>_obt`.
  */
object RunAll {

  private val entities = Seq("user", "business", "review", "checkin", "tip")
  private val datePartitioned = Set("review", "checkin", "tip")
  /** Facts bucket by the join key their OBT uses; `user` by itself. */
  private def bucketColumn(e: String): String =
    if (e == "user") "user_id" else "business_id"
  private val enrichDims = Map(
    "review" -> Seq("business", "user"),
    "checkin" -> Seq("business"),
    "tip" -> Seq("business", "user"))

  /** Run the DAG; returns (jobName, outputPath) in execution order. */
  def run(
      spark: SparkSession,
      inputDir: String,
      lakeDir: String,
      buckets: Int = 8): Seq[(String, String)] = {
    def job(name: String)(body: => String): (String, String) =
      try name -> body
      catch { case e: Throwable =>
        throw new RuntimeException(s"run-all job '$name' failed: ${e.getMessage}", e)
      }

    val extracts = entities.map { e =>
      job(s"extract/$e") {
        val out = s"$lakeDir/bronze/$e"
        Pipelines.extract(spark, PipelineConfig(
          entityType = e,
          input = s"$inputDir/$e.ndjson",
          output = out,
          bucketColumn = Some(bucketColumn(e)),
          buckets = Some(buckets)))
        out
      }
    }
    val cleans = entities.map { e =>
      job(s"clean/$e") {
        val out = s"$lakeDir/silver/$e"
        Pipelines.clean(spark, PipelineConfig(
          entityType = e,
          input = s"$lakeDir/bronze/$e",
          output = out,
          partitionColumn = if (datePartitioned(e)) Some("date_year") else None,
          bucketColumn = Some(bucketColumn(e)),
          buckets = Some(buckets)))
        out
      }
    }
    val enriches = Seq("review", "checkin", "tip").map { e =>
      job(s"enrich/$e") {
        val out = s"$lakeDir/silver/${e}_obt"
        Pipelines.enrich(spark, PipelineConfig(
          entityType = e,
          input = s"$lakeDir/silver/$e",
          output = out,
          partitionColumn = Some("date_year"),
          bucketColumn = Some(bucketColumn(e)),
          buckets = Some(buckets)),
          enrichDims(e).map(d => d -> s"$lakeDir/silver/$d"))
        out
      }
    }
    extracts ++ cleans ++ enriches
  }
}
