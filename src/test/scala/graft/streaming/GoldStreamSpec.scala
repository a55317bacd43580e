package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class GoldStreamSpec extends SparkSpec {
  import spark.implicits._

  test("fenced folds: re-delivered batch skipped, state equals full recompute") {
    val dir = java.nio.file.Files.createTempDirectory("goldstream").toString
    val path = s"$dir/state"
    val b0 = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("k", "v")
    val b1 = Seq(("a", 5.0), ("c", -1.0)).toDF("k", "v")
    assert(GoldStream.applyBatch(b0, 0L, path, Seq("k"), "v"))
    assert(GoldStream.applyBatch(b1, 1L, path, Seq("k"), "v"))
    // at-least-once re-delivery of batch 1: fence must skip it
    assert(!GoldStream.applyBatch(b1, 1L, path, Seq("k"), "v"))
    assert(!GoldStream.applyBatch(b0, 0L, path, Seq("k"), "v"))
    val got = graft.ops.IncrementalAgg.finalize(
        spark.read.parquet(path).drop("__batch_id"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val full = graft.ops.IncrementalAgg.finalize(
        graft.ops.IncrementalAgg.partials(
          b0.unionByName(b1), Seq("k"), "v"))
      .as[(String, Long, Double, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got == full, s"double-count or drop:\n$got\nvs\n$full")
  }

  test("streaming end-to-end: micro-batches fold through foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("goldstream2").toString
    val path = s"$dir/state"
    val input = MemoryStream[(String, Double)]
    val query = GoldStream.start(
      input.toDF().toDF("k", "v"), path, s"$dir/ckpt", Seq("k"), "v")
    try {
      input.addData(("a", 2.0), ("b", 4.0))
      query.processAllAvailable()
      input.addData(("a", 6.0))
      query.processAllAvailable()
      val st = spark.read.parquet(path)
        .select("k", "n", "sum").as[(String, Long, Double)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(st("a") == ((2L, 8.0)))
      assert(st("b") == ((1L, 4.0)))
    } finally query.stop()
  }
}
