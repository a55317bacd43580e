package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Dev-only ANN bucket diagnostics. */
object DevProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    emb.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    val q = emb.filter(col("vec_id") < 100)
    time("ann_topk")(Similarity.annTopK(emb, q, "vec_id", "embedding", 5, dim = 64).count())
    time("ann_topk2")(Similarity.annTopK(emb, q, "vec_id", "embedding", 5, dim = 64).count())
    spark.stop()
  }
}
