package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, TextAnalysis, TfIdf}

/** Dev probe for the round-14 operators' scale claims.
  *
  * Corpus growth mode: replicated docs with SHIFTED ids (more
  * documents, same vocabulary). For the SPAN ops this is the
  * worst-case shape on purpose: every replica duplicates every gram,
  * so at N× the duplicated-occurrence stream is the ENTIRE gram
  * stream and the per-doc interval-union window runs over 100% of
  * positions — if the design survives that, real corpora (where the
  * duplicated subset is a small fraction) are strictly cheaper.
  * BM25/classifier probe the models-stay-vocabulary-sized claim
  * (same vocabulary at any N); chunking probes the shuffle-free map
  * pass.
  *
  * Run: `sbt "Test/runMain graft.tools.MiningScaleProbe [sfDir] [N]"`.
  */
object MiningScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d1 = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text")
    val nDocs = d1.agg(max("doc_id")).head().getLong(0) + 1
    def docs(n: Int): DataFrame =
      (0 until n).map { i =>
        d1.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
          col("lang"), col("text"))
      }.reduce(_ unionByName _)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    for (n <- Seq(1, factor)) {
      val d = docs(n)
      println(s"[probe] ---- ${n}x = ${d.count()} docs ----")
      timed(s"spanDuplication ${n}x") {
        val c = Dedup.spanDuplication(d, "text", "doc_id", windowTokens = 8).count()
        graft.CachedFrames.unpersistAll(); c
      }
      timed(s"stripDuplicatedSpans ${n}x") {
        val c = Dedup.stripDuplicatedSpans(d, "text", "doc_id", windowTokens = 8).count()
        graft.CachedFrames.unpersistAll(); c
      }
      timed(s"spanSelfRepetition ${n}x") {
        Dedup.spanSelfRepetition(d, "text", "doc_id", windowTokens = 8).count()
      }
      timed(s"chunkDocuments ${n}x") {
        Curation.chunkDocuments(d, "text", "doc_id", 40, 10).count()
      }
      timed(s"bm25Search ${n}x") {
        val q = d.filter(col("doc_id") < 5)
          .select(col("doc_id").as("query_id"),
            concat_ws(" ", slice(TextAnalysis.tokens(col("text")), 1, 4)).as("qtext"))
        val c = TfIdf.bm25Search(d, q, "text", "doc_id", "query_id", "qtext", k = 5).count()
        graft.CachedFrames.unpersistAll(); c
      }
      timed(s"logOddsClassifier ${n}x (generic 3-pass)") {
        val model = TfIdf.trainTokenLogOdds(
          d.filter(col("lang") === "en"), d.filter(col("lang") =!= "en"),
          "text", "doc_id")
        TfIdf.scoreTokenLogOdds(d, model, "text", "doc_id").count()
      }
      timed(s"logOddsClassifier ${n}x (fused 1-pass)") {
        val c = TfIdf.classifyTokenLogOddsPartitioned(
          d, col("lang") === "en", "text", "doc_id").count()
        graft.CachedFrames.unpersistAll(); c
      }
      // X110: same vocabulary at any N → the per-term frame (and the
      // full-outer join feeding it) must stay constant-size while the
      // two count scans grow linearly.
      timed(s"tokenJsDivergence ${n}x") {
        TfIdf.tokenJsDivergence(
          d.filter(col("lang") === "en"), d.filter(col("lang") =!= "en"),
          "text", "doc_id").head().getLong(0)
      }
      timed(s"divergingTerms ${n}x") {
        TfIdf.divergingTerms(
          d.filter(col("lang") === "en"), d.filter(col("lang") =!= "en"),
          "text", "doc_id", 25).count()
      }
      // X109: one grouped pass to <= nBins rows regardless of N.
      timed(s"calibration ${n}x") {
        val pair = d.select(
          ((col("doc_id") % 100).cast("double") / 100.0).as("s"),
          (col("lang") === "en").as("y"))
        Curation.calibration(pair, col("s"), col("y")).count()
      }
    }
    spark.stop()
  }
}
