package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, EventAnalytics, TextAnalysis, TfIdf}

/** Dev probe for the round-13 selection/scoring operators' scale
  * claims: importance weights, bigram LM scoring, OOV rate, and token
  * budget must scale ~linearly in corpus size (model tables stay
  * vocabulary-sized; the corpus streams once), and resample must
  * scale ~linearly in entity count (spine work is per-entity).
  *
  * Corpus growth mode: replicated docs with SHIFTED ids — more
  * documents, same vocabulary, the realistic crawl-growth shape for
  * the model-table-size argument. Events replicate as disjoint user
  * populations (EventScaleProbe's mode).
  *
  * Run: `sbt "Test/runMain graft.tools.SelectionScaleProbe [sfDir] [N]"`.
  */
object SelectionScaleProbe {
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
      .select("doc_id", "source", "text")
    val nDocs = d1.agg(max("doc_id")).head().getLong(0) + 1
    def docs(n: Int): DataFrame =
      (0 until n).map { i =>
        d1.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
          col("source"), col("text"))
      }.reduce(_ unionByName _)

    val ev1 = graft.Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "value")
    val users = ev1.agg(max("user_id")).head().getLong(0) + 1
    val ids = ev1.agg(max("event_id")).head().getLong(0) + 1
    def events(n: Int): DataFrame =
      (0 until n).map { i =>
        ev1.select((col("user_id") + lit(i * users)).as("user_id"), col("ts"),
          (col("event_id") + lit(i * ids)).as("event_id"), col("value"))
      }.reduce(_ unionByName _)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    for (n <- Seq(1, factor)) {
      val d = docs(n)
      val e = events(n)
      println(s"[probe] ---- ${n}x = ${d.count()} docs / ${e.count()} events ----")
      timed(s"importanceWeights ${n}x") {
        val c = TfIdf.importanceWeights(
          d, d.filter(col("source") === "src0"), "text", "doc_id").count()
        graft.CachedFrames.unpersistAll(); c
      }
      timed(s"bigramLogProb ${n}x") {
        TfIdf.bigramLogProb(d, "text", "doc_id").count()
      }
      timed(s"oovRate ${n}x") {
        TextAnalysis.oovRate(d, "text", "doc_id",
          Curation.vocabulary(d, "text", 50).select("token")).count()
      }
      timed(s"tokenBudget ${n}x") {
        Curation.tokenBudget(d, "text", "source", 800L, col("doc_id")).count()
      }
      timed(s"resample ${n}x") {
        EventAnalytics.resample(e, "user_id", "ts", "value", "event_id",
          21600L).count()
      }
    }
    spark.stop()
  }
}
