package graft.tools

import graft.Tables
import graft.ops.{Curation, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only 10× stress probe for X43 `mixSources` (same method as the
  * round-7 fuzzyTextJoin probe, PLANS.md): replicate the sf0.1
  * documents table k× with shifted ids and confirm the
  * per-partition-per-source offset path (a) scales ~linearly in rows,
  * (b) keeps output parallelism at the shuffle partition count instead
  * of one task per source, and (c) keeps the driver-side offset table
  * at partitions × sources entries.
  *
  * Run: `sbt "Test/runMain graft.tools.MixProbe"`.
  */
object MixProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // keep the raw range-shuffle partitioning visible: AQE coalesces
      // these probe-scale outputs to 1 partition, which would mask the
      // parallelism comparison the probe exists to make
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def loadavg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(f"loadavg_start $loadavg%.2f parallelism=${spark.sparkContext.defaultParallelism}")

    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang").as("source"),
        TextAnalysis.bpeTokenCount(col("text")).as("n_tokens"))
      .cache()
    val baseRows = docs.count() // materialize once so replication cost is excluded
    val weights = Seq("en" -> 0.5, "fr" -> 0.3, "de" -> 0.2)

    // Naive comparison form: one running-sum window per source — the
    // shape mixSources exists to avoid (≤ |sources| busy tasks).
    def windowForm(d: org.apache.spark.sql.DataFrame, budget: Long): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val totalW = weights.map(_._2).sum
      val alloc = weights.map { case (s, w) =>
        s -> math.floor(budget * w / totalW).toLong }.toMap
      val allocCol = coalesce(weights.map { case (s, _) =>
        when(col("source") === s, lit(alloc(s))) }: _*)
      val w = Window.partitionBy("source")
        .orderBy(xxhash64(lit("13"), col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      d.filter(col("source").isin(weights.map(_._1): _*))
        .withColumn("mix_tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .filter(col("mix_tokens_before") < allocCol)
    }

    val ks = sys.env.getOrElse("SPARK_GRAFT_MIX_KS", "1,10,100")
      .split(",").toSeq.map(_.trim.toInt)
    for (k <- ks; form <- sys.env.getOrElse("SPARK_GRAFT_MIX_FORMS", "offsets,offsets,window")
           .split(",").toSeq.map(_.trim)) {
      val d =
        if (k == 1) docs
        else (0 until k).map(i =>
          docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L)))
          .reduce(_.unionByName(_))
      // budget scales with k so the take fraction (and straddler count)
      // stays comparable across scales
      val budget = sys.env.getOrElse("SPARK_GRAFT_MIX_BUDGET_PER_K", "500000").toLong * k
      val t0 = System.nanoTime()
      val out = form match {
        case "window" => windowForm(d, budget)
        case "sortonly" => // the shared range-shuffle+sort cost alone
          d.filter(col("source").isin(weights.map(_._1): _*))
            .withColumn("__mix_h", xxhash64(lit("13"), col("doc_id").cast("string")))
            .repartitionByRange(col("source"), col("__mix_h"), col("doc_id"))
            .sortWithinPartitions(col("source"), col("__mix_h"), col("doc_id"))
        case _ => Curation.mixSources(d, "doc_id", "source", "n_tokens", weights, budget)
      }
      val n = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val parts = out.rdd.getNumPartitions
      graft.CachedFrames.unpersistAll() // isolate runs: no cross-run cache reuse
      println(f"k=$k%-3d $form%-7s rows_in=${baseRows * k}%-8d rows_out=$n%-7d " +
        f"out_partitions=$parts sec=$sec%.2f")
    }
    println(f"loadavg_end $loadavg%.2f")
    spark.stop()
  }
}
