package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev-only stage-by-stage timing probe for the dedup pipeline. */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    time("shingles")(docs.select(explode(graft.ops.TextAnalysis.shingles(col("text"), 3))).count())
    val sig = Dedup.signatures(docs, "text", "doc_id")
    time("signatures")(sig.count())
    time("signatures2")(sig.count())
    val bands = Dedup.lshBands(Dedup.signatures(docs, "text", "doc_id"), "doc_id")
    time("bands")(bands.count())
    time("candidatePairs")(Dedup.candidatePairs(bands, "doc_id").count())
    time("nearDupPairs")(Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.0).count())
    time("nearDupPairs2")(Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.0).count())
    time("fingerprint")(
      graft.ops.TextAnalysis.winnowingFingerprints(docs, "doc_id", "text").count())
    time("fingerprint2")(
      graft.ops.TextAnalysis.winnowingFingerprints(docs, "doc_id", "text").count())
    time("fp_hash_only")(docs.select(col("doc_id"),
      posexplode(graft.ops.TextAnalysis.charGrams(col("text"), 8)).as(Seq("pos", "gram")))
      .select(graft.ops.TextAnalysis.baseHash(col("gram")).as("h")).agg(sum("h")).count())
    time("fp_fast_hasher")(graft.ops.TextAnalysis.winnowingFingerprints(
      docs, "doc_id", "text", hasher = graft.ops.TextAnalysis.fastBaseHash).count())
    time("verified")(
      Dedup.verifiedNearDupPairs(docs, "text", "doc_id", threshold = 0.4).count())
    time("verified2")(
      Dedup.verifiedNearDupPairs(docs, "text", "doc_id", threshold = 0.4).count())
    spark.stop()
  }
}
