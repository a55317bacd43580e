package graft

import graft.pipeline.{PipelineConfig, Pipelines}
import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's dispatch
  * (`/root/reference/app.py:20-70`): `--pipeline {extract|clean|enrich}`
  * plus the known pipeline args; unknown `--k v` pairs pass through
  * (how enrich receives `--dimension_inputs` /
  * `--dimension_entity_types`, both CSV — `enrich.py:22-23`). Typed
  * Scala dispatch replaces `import_module` + `getattr`.
  *
  * Example (full medallion run over the checked-in fixtures):
  * {{{
  *   runMain graft.Main --pipeline extract --entity_type business \
  *     --input fixtures/business.ndjson --output /tmp/lake/bronze/business \
  *     --bucket_column business_id --buckets 8
  *   runMain graft.Main --pipeline clean --entity_type business \
  *     --input /tmp/lake/bronze/business --output /tmp/lake/silver/business
  *   runMain graft.Main --pipeline enrich --entity_type checkin \
  *     --input /tmp/lake/silver/checkin --output /tmp/lake/silver/checkin_obt \
  *     --dimension_inputs /tmp/lake/silver/business \
  *     --dimension_entity_types business
  * }}}
  */
object Main {

  def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    def req(k: String): String = opts.getOrElse(
      k, sys.error(s"missing required arg --$k (got: ${opts.keys.mkString(", ")})"))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-${req("pipeline")}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = PipelineConfig(
      entityType = req("entity_type"),
      input = req("input"),
      output = req("output"),
      partitionColumn = opts.get("partition_column"),
      bucketColumn = opts.get("bucket_column"),
      buckets = opts.get("buckets").map(_.toInt))

    val result = req("pipeline") match {
      case "extract" => Pipelines.extract(spark, cfg)
      case "clean" =>
        Pipelines.clean(spark, cfg,
          deterministicIds = opts.get("deterministic_ids").exists(_.toBoolean))
      case "enrich" =>
        val dims = opts.getOrElse("dimension_entity_types", "").split(",")
          .zip(opts.getOrElse("dimension_inputs", "").split(","))
          .collect { case (e, p) if e.nonEmpty => (e.trim, p.trim) }.toSeq
        Pipelines.enrich(spark, cfg, dims)
      case other => sys.error(s"unknown pipeline: $other")
    }
    // The reference prints schema + sample before the write
    // (extract.py:32-33 etc.); we print after, same debugging intent.
    result.printSchema()
    println(s"ROWS=${spark.read.parquet(cfg.output).count()}")
    spark.stop()
  }
}
