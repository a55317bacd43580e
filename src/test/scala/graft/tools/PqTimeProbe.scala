package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage timer for the IVF-PQ query path — the probe that
  * located the round-15 deferred-projection find (PLANS): in a
  * codegen'd BroadcastHashJoin the stream-side encode projection is
  * deferred to its use site, i.e. re-evaluated PER CANDIDATE row, and
  * `count()`-style timings hide it because column pruning drops the
  * codes entirely. Stages: encode (pruned vs forced), the bare cell
  * join, scoring with adc forced, full query.
  */
object PqTimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Pq
    val emb = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val cents = timed("collect centroids") {
      emb.orderBy("vec_id").limit(16).collect().map(_.getSeq[Float](1).toSeq).toSeq
    }
    val model = timed("residual codebooks") {
      Pq.lowestIdResidualCodebooks(emb, "vec_id", "embedding", cents, 64, 8, 16)
    }
    for (r <- 1 to 2) {
      timed(s"run$r encodeIvf count (codes pruned!)") {
        Pq.encodeIvf(emb, "embedding", cents, model).select("ivf_cell", "pq_codes").count()
      }
      timed(s"run$r encodeIvf codes FORCED") {
        Pq.encodeIvf(emb, "embedding", cents, model)
          .agg(sum(element_at(col("pq_codes"), 1))).head()
      }
      timed(s"run$r full ivfAdcTopK") {
        Pq.ivfAdcTopK(emb, emb.filter(col("vec_id") < 100),
          "vec_id", "embedding", cents, model, 4, 5).count()
      }
    }
    spark.stop()
  }
}
