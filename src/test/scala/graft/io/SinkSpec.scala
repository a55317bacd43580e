package graft.io

import graft.SparkSpec
import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

class SinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir: Path = Files.createTempDirectory("sink-spec")

  private def df = Seq(
    (1L, "2019", "a"), (2L, "2019", "b"), (3L, "2020", "c"),
    (4L, "2020", "d"), (5L, "2020", "e"), (6L, "2021", "f")
  ).toDF("id", "date_year", "payload")

  private def listFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala.filter(Files.isRegularFile(_)).toSeq

  test("parquetWrite with identity partition creates pruning-friendly dirs") {
    val out = tmpDir
    Sink.parquetWrite(df, out.toString, Sink.PartitionSpec(partitionColumn = Some("date_year")))
    val dirs = Files.list(out).iterator().asScala.map(_.getFileName.toString).toSet
    assert(Set("date_year=2019", "date_year=2020", "date_year=2021").subsetOf(dirs))
    // read-back equality (partition column round-trips via dir name)
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 6)
    assert(back.select("id", "date_year", "payload").as[(Long, String, String)].collect().toSet
      == df.as[(Long, String, String)].collect().toSet)
    // partition pruning reaches the scan
    val plan = back.filter(col("date_year") === "2020").queryExecution.executedPlan.toString
    assert(back.filter(col("date_year") === "2020").count() == 3)
    assert(plan.contains("PartitionFilters") || !plan.contains("date_year=2019"))
  }

  test("parquetWrite with bucket spec writes one file per bucket") {
    val out = tmpDir
    Sink.parquetWrite(df, out.toString,
      Sink.PartitionSpec(bucketColumn = Some("id"), buckets = Some(4)))
    val parts = listFiles(out).filter(_.getFileName.toString.startsWith("part-"))
    // at most one file per bucket (a hash bucket that received no rows
    // writes no file), and more than one bucket actually split the data
    assert(parts.size <= 4 && parts.size >= 2, s"expected 2..4 bucket files, got ${parts.size}")
    val back = spark.read.parquet(out.toString)
    assert(back.as[(Long, String, String)].collect().toSet
      == df.as[(Long, String, String)].collect().toSet)
  }

  test("parquetWrite with partition + bucket spec nests bucket files under partition dirs") {
    val out = tmpDir
    Sink.parquetWrite(df, out.toString,
      Sink.PartitionSpec(Some("date_year"), Some("id"), Some(2)))
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 6)
    // every partition dir holds at most `buckets` files
    Files.list(out).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("date_year="))
      .foreach { p =>
        val n = listFiles(p).count(_.getFileName.toString.startsWith("part-"))
        assert(n <= 2, s"partition ${p.getFileName} has $n > 2 files")
      }
  }

  test("partitionTransforms builds identity-then-bucket V2 transforms") {
    val both = Sink.partitionTransforms(Sink.PartitionSpec(Some("date_year"), Some("id"), Some(8)))
    assert(both.map(_.toString) == Seq("date_year", "bucket(8, id)"))
    assert(Sink.partitionTransforms(Sink.PartitionSpec()).isEmpty)
    // bucket without count (or count without column) is ignored, as in
    // create_partition_args (write.py:44-51)
    assert(Sink.partitionTransforms(
      Sink.PartitionSpec(bucketColumn = Some("id"))).isEmpty)
  }
}
