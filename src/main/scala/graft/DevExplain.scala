package graft

import org.apache.spark.sql.SparkSession

/** Dev-only plan auditor: prints the formatted physical plan of
  * selected queries so scan pruning (ReadSchema), pushed filters,
  * broadcast joins, and WholeStageCodegen spans can be inspected.
  * Usage: `runMain graft.DevExplain [queryName ...]` (default: the
  * scan/join/shuffle-heavy set).
  */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_enrich_obt", "q1_pricing_summary", "q_dedup_near",
        "q_similarity_topk", "q_text_stats", "q_surrogate_id")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
