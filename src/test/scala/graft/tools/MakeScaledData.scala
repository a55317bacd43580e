package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only 10× dataset replicator for whole-suite scale probes:
  * reads each raw sf0.1 parquet, unions k key-shifted replicas
  * (every `*key` / `*_id` long column shifted by the same per-replica
  * offset, so FK relationships — lineitem↔part↔supplier↔orders↔
  * customer, events.user_id grouping, doc/vec ids — stay consistent
  * within a replica and disjoint across replicas), and writes to
  * `outDir`. Raw `spark.read.parquet` (no events ns-repair) so the
  * written schema is byte-compatible with the driver's layout and
  * `Tables.*` readers behave identically.
  *
  * Query-set note: similarity queries select `vec_id < 100`, which
  * only replica 0 satisfies — corpus grows k×, query set stays fixed,
  * exactly the scaling a 100 TB ANN run sees.
  *
  * Run: `sbt "Test/runMain graft.tools.MakeScaledData [k] [outDir]"`.
  */
object MakeScaledData {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def isKeyCol(name: String): Boolean =
    name.endsWith("key") || name.endsWith("_id")

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.drop(1).headOption.getOrElse(s"/tmp/sf_x$k")
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // events.ts is TIMESTAMP(NANOS): read as raw long nanos; the
      // replica is written as plain INT64, which Tables.events' div
      // 1000 repair consumes identically
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def replicate(df: DataFrame): DataFrame = {
      val keyCols = df.schema.fields
        .filter(f => f.dataType == LongType && isKeyCol(f.name)).map(_.name)
      (0 until k).map { i =>
        keyCols.foldLeft(df)((acc, c) =>
          acc.withColumn(c, col(c) + lit(i.toLong * 1000000000L)))
      }.reduce(_.unionByName(_))
    }

    tables.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      replicate(df).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"wrote $t x$k")
    }
    spark.stop()
  }
}
