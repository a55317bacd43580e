package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Datasheet, NegSampling, RetrievalEval, TextAnalysis}
import graft.pipeline.HllStore

/** Dev probe for the round-17 operators' scale claims.
  *
  * Corpus growth: replicated rows with SHIFTED ids (same vocabulary /
  * label structure). What each op must show at N×:
  *  - negSampling: freq scan + draws linear; the CDF and its bucket
  *    grid are VOCABULARY-sized (constant here by construction), so
  *    the lookup join stays a broadcast hash join at any N.
  *  - retrievalMetrics: cost ∝ query-set × k (the inputs), never a
  *    corpus term — grows linearly with the query count only.
  *  - corpusDatasheet: one scan into two grouped aggs; the only
  *    corpus-wide shuffle is count(DISTINCT text).
  *  - HllStore.append: cost ∝ INCREMENT — flat when the store behind
  *    it grows N× (history is never re-read).
  *
  * Run: `sbt "Test/runMain graft.tools.Round17ScaleProbe [sfDir] [N]"`.
  */
object Round17ScaleProbe {
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
    import spark.implicits._

    val d1 = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source", "text")
    val nDocs = d1.agg(max("doc_id")).head().getLong(0) + 1
    def docs(n: Int): DataFrame =
      (0 until n).map { i =>
        d1.select((col("doc_id") + lit(i * nDocs)).as("doc_id"),
          col("lang"), col("source"), col("text"))
      }.reduce(_ unionByName _)
    // SINGLE-BRANCH replication for the curriculum rows: an N-way
    // union makes every branch compile its own whole-stage-codegen
    // function, which for expression-heavy operators measures compile
    // time x N, not the operator (measured: the same 100x corpus as a
    // union ran phaseAssign at 12.4 s vs 1.05 s single-branch).
    def docsFlat(n: Int): DataFrame =
      graft.Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars")
        .crossJoin(spark.range(n).select(col("id").as("__rep")))
        .select((col("doc_id") + col("__rep") * nDocs).as("doc_id"),
          col("text"), col("n_chars"))

    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
    }

    for (n <- Seq(1, factor)) {
      val d = docs(n)
      println(s"[probe] ---- ${n}x = ${d.count()} docs ----")
      timed(s"negSampling ${n}x") {
        val freqs = d.select(explode(TextAnalysis.tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
        val out = NegSampling.sampleNegatives(
          d.select("doc_id"), "doc_id", freqs, "token", "freq", k = 4)
        // force the sampled token, not just existence: a count() could
        // let Catalyst skip nothing here (the join decides rows), but
        // aggregating the output column pins the whole path anyway
        out.agg(count(col("neg_token"))).head().getLong(0)
      }
      timed(s"retrievalMetrics ${n}x queries") {
        // n×1000 queries, 5 ranked docs + 5 graded truth docs each —
        // built from the doc table so the probe needs no extra data
        val ids = d.select(col("doc_id").as("qid")).limit(n * 1000)
        val slots = ids.withColumn("rank", explode(sequence(lit(1), lit(5))))
        val results = slots.withColumn("doc", pmod(col("qid") * 7 + col("rank"), lit(4096L)))
        val truth = slots.withColumn("doc", pmod(col("qid") * 11 + col("rank"), lit(4096L)))
          .withColumn("grade", (lit(6) - col("rank")).cast("double"))
        RetrievalEval.retrievalMetrics(
          results, truth, "qid", "doc", "rank", "grade", k = 5).count()
      }
      timed(s"corpusDatasheet ${n}x") {
        Datasheet.corpusDatasheet(d, "source", "text", "lang").count()
      }
      // curriculum: histogram-CDF percentile (broadcast join) vs the
      // textbook global percent_rank (a full range exchange + sort) —
      // force the phase column so Catalyst can't prune the work
      timed(s"curriculum sketch-CDF ${n}x") {
        graft.ops.Curriculum.phaseAssign(
            docsFlat(n), size(TextAnalysis.tokens(col("text"))), phases = 4)
          .agg(sum(col("phase"))).head().getLong(0)
      }
      // same comparison on a MATERIALIZED difficulty column (n_chars):
      // isolates op structure from difficulty-expression re-evaluation
      timed(s"curriculum sketch-CDF (plain col) ${n}x") {
        graft.ops.Curriculum.phaseAssign(
            docsFlat(n), col("n_chars").cast("double"), phases = 4)
          .agg(sum(col("phase"))).head().getLong(0)
      }
      timed(s"curriculum percent_rank (plain col) ${n}x") {
        import org.apache.spark.sql.expressions.Window
        val pr = percent_rank().over(Window.orderBy(col("n_chars")))
        docsFlat(n).withColumn("__pr", pr)
          .withColumn("phase",
            when(col("__pr") <= math.sqrt(0.25), 1)
              .when(col("__pr") <= math.sqrt(0.5), 2)
              .when(col("__pr") <= math.sqrt(0.75), 3).otherwise(4))
          .agg(sum(col("phase"))).head().getLong(0)
      }
      timed(s"curriculum percent_rank ${n}x") {
        import org.apache.spark.sql.expressions.Window
        val pr = percent_rank().over(
          Window.orderBy(size(TextAnalysis.tokens(col("text")))))
        docsFlat(n).withColumn("__pr", pr)
          .withColumn("phase",
            when(col("__pr") <= math.sqrt(0.25), 1)
              .when(col("__pr") <= math.sqrt(0.5), 2)
              .when(col("__pr") <= math.sqrt(0.75), 3).otherwise(4))
          .agg(sum(col("phase"))).head().getLong(0)
      }
      graft.CachedFrames.unpersistAll()
    }

    // HllStore.append must be FLAT in store size: same increment,
    // store built from 1x vs Nx content.
    for (n <- Seq(1, factor)) {
      val dir = java.nio.file.Files.createTempDirectory(s"hllprobe$n").toString
      val tok = docs(n).select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      HllStore.build(spark, tok, Seq("lang"), col("tok"), dir)
      val inc = docs(1).select(col("lang"),
        explode(TextAnalysis.tokens(col("text"))).as("tok"))
      timed(s"hllStore.append onto ${n}x store") {
        HllStore.append(spark, dir, inc, Seq("lang"), col("tok")); 1L
      }
      graft.CachedFrames.unpersistAll()
    }
    spark.stop()
  }
}
