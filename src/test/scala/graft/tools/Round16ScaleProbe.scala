package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Curation, EventAnalytics, Similarity, Sketches, TextAnalysis}

/** Dev probe for the round-16 operators' scale claims.
  *
  * Corpus growth: replicated rows with SHIFTED ids — more documents /
  * vectors / events, same vocabulary, label structure, and date span.
  * What each op must show at N×:
  *  - hllDistinct: linear scan cost, register state constant (2^b per
  *    group) — the no-distinct-pass claim.
  *  - ngramDiversity: linear explode + aggregation; the distinct side
  *    grows with VOCABULARY (constant here by construction), so the
  *    bill is the scan.
  *  - robustStats / fairGate: per-group percentile/window passes —
  *    linear with one extra shuffle each; groups stay parallel.
  *  - decayedAgg: one scan, one map-side-combined aggregation.
  *  - mmrRerank: the CORPUS appears only in the shortlist build; the
  *    greedy loop cost is bounded by queries×poolK regardless of N.
  *  - marginMine: bounded side A fixed, streaming side B grows —
  *    pair volume (and the windows over it) linear in N.
  *
  * Run: `sbt "Test/runMain graft.tools.Round16ScaleProbe [sfDir] [N]"`.
  */
object Round16ScaleProbe {
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
      .select("doc_id", "lang", "source", "text", "n_chars")
    val nDocs = d1.agg(max("doc_id")).head().getLong(0) + 1
    def docs(n: Int): DataFrame =
      (0 until n).map { i =>
        d1.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
          col("lang"), col("source"), col("text"), col("n_chars"))
      }.reduce(_ unionByName _)

    val e1 = graft.Tables.embeddings(spark, sfDir)
    val nVecs = e1.agg(max("vec_id")).head().getLong(0) + 1
    def vecs(n: Int): DataFrame =
      (0 until n).map { i =>
        e1.select((col("vec_id") + lit(i * nVecs)).as("vec_id"),
          col("embedding"), col("label"))
      }.reduce(_ unionByName _)

    val ev1 = graft.Tables.events(spark, sfDir)
      .select("event_id", "event_type", "ts", "value")
    val nEv = ev1.agg(max("event_id")).head().getLong(0) + 1
    def events(n: Int): DataFrame =
      (0 until n).map { i =>
        ev1.select((col("event_id") + lit(i * nEv)).as("event_id"),
          col("event_type"), col("ts"), col("value"))
      }.reduce(_ unionByName _)

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    for (n <- Seq(1, factor)) {
      val d = docs(n)
      println(s"[probe] ---- ${n}x = ${d.count()} docs ----")
      timed(s"hllDistinct ${n}x") {
        val tok = d.select(col("lang"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        Sketches.hllDistinct(tok, Seq("lang"), col("tok"), b = 6).count()
      }
      timed(s"ngramDiversity ${n}x") {
        TextAnalysis.ngramDiversity(d, "text", Seq("source"), Seq(1, 2)).count()
      }
      timed(s"robustStats ${n}x") {
        Sketches.robustStats(d, Seq("lang"), col("n_chars")).count()
      }
      timed(s"fairGate ${n}x") {
        Curation.fairGate(d, Seq("source"), col("n_chars"), keepFrac = 0.25).count()
      }
      timed(s"decayedAgg ${n}x") {
        EventAnalytics.decayedAgg(events(n), Seq("event_type"), "ts", "value").count()
      }
      val v = vecs(n)
      timed(s"mmrRerank ${n}x corpus") {
        val c = Similarity.mmrRerank(
          v, e1.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 5, poolK = 12).count()
        graft.CachedFrames.unpersistAll(); c
      }
      timed(s"marginMine ${n}x streaming side") {
        val a = e1.filter(col("label") === 0)
        val b = vecs(n).filter(col("label") === 1)
        val c = Similarity.marginMine(a, b, "vec_id", "embedding", k = 4).count()
        graft.CachedFrames.unpersistAll(); c
      }
      timed(s"spanCorrupt ${n}x") {
        // head() on the sums, not count(): count() would let Catalyst
        // prune the string reassembly out of the plan entirely
        Curation.spanCorrupt(d, "text", "doc_id")
          .agg(sum(length(col("corrupted"))).as("c"), sum(col("n_spans")))
          .head().getLong(0)
      }
      timed(s"kmvOverlapMatrix ${n}x") {
        val tok = d.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        Sketches.kmvOverlapMatrix(tok, "source", col("tok"), k = 64).count()
      }
      timed(s"jlProject ${n}x") {
        vecs(n).select(col("vec_id") +:
            graft.ops.Pca.jlProject(col("embedding"), 64, 16): _*)
          .agg(sum(col("jl1")).as("s")).head()
        1L
      }
    }
    spark.stop()
  }
}
