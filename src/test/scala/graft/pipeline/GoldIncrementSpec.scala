package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GoldIncrementSpec extends SparkSpec {
  import spark.implicits._

  test("CLI gold-increment: two runs fold into one state equal to the full recompute") {
    val dir = java.nio.file.Files.createTempDirectory("gold").toString
    val inc1 = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0))
    val inc2 = Seq(("a", 5.0), ("c", -1.0))
    inc1.toDF("k", "v").write.parquet(s"$dir/inc1")
    inc2.toDF("k", "v").write.parquet(s"$dir/inc2")
    def runInc(i: Int) = graft.Main.run(spark, Map(
      "pipeline" -> "gold-increment", "input" -> s"$dir/inc$i",
      "output" -> s"$dir/out$i", "store_dir" -> s"$dir/store",
      "group_columns" -> "k", "value_column" -> "v"))
    assert(runInc(1).count() == 2) // groups a, b
    // state survives on disk between runs
    assert(new java.io.File(s"$dir/store/gold_state").exists())
    val got = runInc(2)
      .select("k", "n", "sum", "min", "max", "avg")
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    // equals the one-shot aggregate over inc1 ∪ inc2
    val full = graft.ops.IncrementalAgg.finalize(
        graft.ops.IncrementalAgg.partials(
          (inc1 ++ inc2).toDF("k", "v"), Seq("k"), "v"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got == full, s"incremental state diverged:\n$got\nvs\n$full")
    assert(got("a")._2 == 3L && got("a")._3 == 9.0 && got("a")._6 == 3.0)
    // the published view is what's on disk at --output
    assert(spark.read.parquet(s"$dir/out2").count() == 3)
  }
}
