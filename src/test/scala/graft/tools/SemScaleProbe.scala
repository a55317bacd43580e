package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only X44 scale probe on the 100× replica embeddings (5M
  * vectors × dim 64; every vector has 99 identical twins): time the
  * k-means quantizer training, the map-side fused-kernel assignment
  * over the full corpus, the cluster-size audit, and a capped
  * semanticDedupPairs pass. Run:
  * `sbt "Test/runMain graft.tools.SemScaleProbe"` (needs /tmp/sf_x100
  * from MakeScaledData).
  */
object SemScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf_x100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1fs"); r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    println(s"corpus rows: ${emb.count()}")
    val k = 128
    val centroids = timed(s"trainCentroids k=$k iters=2") {
      Similarity.trainCentroids(emb, "vec_id", "embedding", k, dim = 64, iters = 2)
    }
    val audit = timed("oversizedClusters audit (cap 2000), full 5M assignment") {
      Similarity.oversizedClusters(emb, "vec_id", "embedding", centroids, 2000)
        .orderBy(col(graft.ops.Audit.GroupSizeCol).desc).collect()
    }
    println(s"oversized clusters: ${audit.length}; largest: " +
      audit.take(3).map(r => s"${r.getInt(0)}=${r.getLong(1)}").mkString(", "))
    val pairs = timed("semanticDedupPairs capped 2000, threshold 0.99") {
      Similarity.semanticDedupPairs(emb, "vec_id", "embedding", centroids, 0.99,
        maxClusterSize = 2000).count()
    }
    println(s"pairs from under-cap clusters: $pairs")
    spark.stop()
  }
}
