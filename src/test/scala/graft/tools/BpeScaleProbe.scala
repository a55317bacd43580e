package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the X105 scale claim: BPE training pays ONE
  * corpus-sized pass (the word-count table) and everything iterative
  * is vocabulary-sized. Two growth modes, deliberately separated:
  *
  *  - same-vocab: N× replicated documents — corpus grows, vocabulary
  *    does not. Train time should grow far sublinearly (the merge
  *    loop's input is unchanged; only the first pass sees more rows).
  *  - grown-vocab: every replica suffixes its words (`word_i`) —
  *    vocabulary grows ∝ N, so the merge loop's input grows too; the
  *    probe shows the iteration cost tracking VOCABULARY, not corpus.
  *
  * Run: `sbt "Test/runMain graft.tools.BpeScaleProbe [sfDir] [N]"`.
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    def replicated(n: Int, growVocab: Boolean): DataFrame =
      (0 until n).map { i =>
        val t =
          if (growVocab) regexp_replace(col("text"), "(\\S+)", s"$$1_$i")
          else col("text")
        docs.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), t.as("text"))
      }.reduce(_ unionByName _)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpeprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dir = java.nio.file.Files.createTempDirectory("bpeprobe").toString
    for (mode <- Seq("same-vocab", "grown-vocab"); n <- Seq(1, factor)) {
      val path = s"$dir/${mode}_$n"
      replicated(n, mode == "grown-vocab").write.mode("overwrite").parquet(path)
      val corpus = spark.read.parquet(path)
      val (_, vocab) = timed(s"$mode ${n}x train(8 merges)") {
        graft.ops.Bpe.train(corpus, "text", 8)
      }
      println(s"[bpeprobe] $mode ${n}x: docs=${corpus.count()} vocab=${vocab.count()}")
      graft.CachedFrames.unpersistAll()
    }
    spark.stop()
  }
}
