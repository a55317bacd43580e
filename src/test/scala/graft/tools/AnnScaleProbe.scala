package graft.tools

import graft.pipeline.AnnIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the X99 claim: querying the persisted
  * cell-partitioned index reads ≈ nProbe/nCentroids of the corpus,
  * so at N× corpus size the indexed query beats brute force by a
  * widening margin. Corpus growth = shifted-id replicas of the sf
  * embeddings (same geometry, more rows).
  *
  * Run: `sbt "Test/runMain graft.tools.AnnScaleProbe [sfDir] [N]"`.
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e1 = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n1 = e1.agg(max("vec_id")).head().getLong(0) + 1
    def corpus(n: Int): DataFrame =
      (0 until n).map { i =>
        e1.select((col("vec_id") + lit(i * n1)).as("vec_id"), col("embedding"))
      }.reduce(_ unionByName _)

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val dir = java.nio.file.Files.createTempDirectory("annprobe").toString
    for (n <- Seq(1, factor)) {
      val c = corpus(n)
      c.write.mode("overwrite").parquet(s"$dir/corpus_$n")
      println(s"[probe] ---- ${n}x = ${spark.read.parquet(s"$dir/corpus_$n").count()} vectors ----")
      timed(s"index build ${n}x") {
        AnnIndex.build(spark, AnnIndex.Config(
          input = s"$dir/corpus_$n", storeDir = s"$dir/store_$n",
          dim = 64, nCentroids = 16, iters = 2)).count()
      }
      val queries = spark.read.parquet(s"$dir/corpus_$n").filter(col("vec_id") < 8)
      val truth = timed(s"brute force ${n}x") {
        val r = graft.ops.Similarity.bruteForceTopK(
          spark.read.parquet(s"$dir/corpus_$n"), queries,
          "vec_id", "embedding", 10)
        r.count(); r
      }
      // recall@10 vs the brute-force ground truth — the honest-number
      // series VERDICT r14 #7 asked to track across replica scales,
      // swept over nProbe (the recall/cost knob). Replicas create
      // duplicate vectors, so id-exact matching would under-count
      // pure tie swaps; count an indexed result as a hit when its sim
      // reaches the query's 10th-best TRUE sim (threshold recall, the
      // tie-robust standard). NOTE the replica corpora FLATTER
      // recall: a vector's duplicates land in its own cell, so the
      // true top-10 co-locate by construction — the 1x row on the
      // real embeddings is the honest clusteredness-sensitive number.
      val thresh = truth.groupBy("qid").agg(min("sim").as("t_min"))
      val total = truth.count()
      for (nProbe <- Seq(2, 4, 8)) {
        val indexed = timed(s"indexed query ${n}x (nProbe=$nProbe/16)") {
          val r = AnnIndex.query(spark, s"$dir/store_$n", queries,
            "vec_id", "embedding", k = 10, nProbe = nProbe)
          r.count(); r
        }
        val hits = indexed.join(thresh, Seq("qid"))
          .filter(col("sim") >= col("t_min") - 1e-9).count()
        println(f"[probe] recall@10 ${n}x nProbe=$nProbe: ${hits.toDouble / total}%.3f ($hits/$total)")
      }

      // ---- X104 PQ-compressed store: the same honest series, plus
      // the compression ratio the codes-only layout actually buys and
      // what the ADC approximation / exact refine give back in recall.
      // The fine config (m=16, ksub=64 — 16 codes vs 64 floats, the
      // production-shaped resolution) runs at 1x only, where the raw
      // numbers already show the weakly-clustered-corpus worst case.
      def bytes(p: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
        walk(new java.io.File(p))
      }
      val rawB = bytes(s"$dir/store_$n/index/cells.parquet")
      val fullCorpus = spark.read.parquet(s"$dir/corpus_$n")
      val configs = Seq(("pq", 8, 16)) ++ (if (n == 1) Seq(("pqfine", 16, 64)) else Nil)
      for ((tag, m, ksub) <- configs) {
        timed(s"$tag index build ${n}x (m=$m,ksub=$ksub)") {
          AnnIndex.build(spark, AnnIndex.Config(
            input = s"$dir/corpus_$n", storeDir = s"$dir/${tag}_$n",
            dim = 64, nCentroids = 16, iters = 2, pqM = m, pqKsub = ksub)).count()
        }
        val pqB = bytes(s"$dir/${tag}_$n/index/cells.parquet")
        println(f"[probe] cells bytes ${n}x $tag: raw=$rawB pq=$pqB ratio=${rawB.toDouble / pqB}%.1f")
        for ((refine, label) <- Seq(
            (None: Option[DataFrame], s"$tag adc"),
            (Some(fullCorpus): Option[DataFrame], s"$tag refined(4x)"))) {
          val r = timed(s"$label query ${n}x (nProbe=4/16)") {
            val out = AnnIndex.query(spark, s"$dir/${tag}_$n", queries,
              "vec_id", "embedding", k = 10, nProbe = 4,
              refineWith = refine, refineFactor = 4)
            out.count(); out
          }
          // ADC sims are approximations — threshold-compare on the TRUE
          // cosine of the returned pairs, not the store's score
          val withTrue = r.select("qid", "nid")
            .join(fullCorpus.select(col("vec_id").as("nid"), col("embedding").as("nvec")), Seq("nid"))
            .join(broadcast(queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))), Seq("qid"))
            .withColumn("tsim", graft.ops.Similarity.cosine(col("qvec"), col("nvec")))
          val hits = withTrue.join(thresh, Seq("qid"))
            .filter(col("tsim") >= col("t_min") - 1e-9).count()
          println(f"[probe] recall@10 ${n}x $label: ${hits.toDouble / total}%.3f ($hits/$total)")
        }
      }
    }
    spark.stop()
  }
}
