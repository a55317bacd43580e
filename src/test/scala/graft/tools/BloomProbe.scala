package graft.tools

import graft.Tables
import graft.ops.{Curation, Dedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for X45 `decontaminateBloom`: on the sf0.1
  * documents table (bench = doc_id < 25, corpus = the rest), measure
  * (a) how many corpus (doc, gram) rows the Bloom probe prunes before
  * the distinct shuffle, and (b) end-to-end wall vs the exact path.
  *
  * Run: `sbt "Test/runMain graft.tools.BloomProbe"`.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.documents(spark, sfDir)
    val bench = d.filter(col("doc_id") < 25)
    val corpus = d.filter(col("doc_id") >= 25)

    // pruning factor: corpus gram rows entering the distinct shuffle
    val corpusGrams = Dedup.shinglesExploded(corpus, "text", "doc_id", 3)
      .select(col("doc_id"), col("__sh"))
    val total = corpusGrams.count()
    val benchHashes = Dedup.shinglesExploded(bench, "text", "doc_id", 3)
      .select(xxhash64(col("__sh")).as("__gh")).distinct()
    val bloom = benchHashes.stat.bloomFilter("__gh", math.max(1L, benchHashes.count()), 0.01)
    val kept = corpusGrams.filter(
      graft.functions.BloomMightContainExpr.mightContain(xxhash64(col("__sh")), bloom)).count()
    println(f"corpus gram rows: $total%d -> $kept%d after bloom probe " +
      f"(${100.0 * kept / total}%.2f%% kept)")

    for (warm <- Seq("cold", "warm"); form <- Seq("exact", "bloom")) {
      val t0 = System.nanoTime()
      val out =
        if (form == "bloom")
          Curation.decontaminateBloom(corpus, bench, "text", "doc_id", minShared = 2L)
        else Curation.decontaminate(corpus, bench, "text", "doc_id", minShared = 2L)
      val n = out.count()
      graft.CachedFrames.unpersistAll()
      println(f"$form%-5s $warm%-4s rows_out=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
