package graft.streaming

import graft.SparkSpec
import graft.ops.Sketches
import graft.pipeline.HllStore
import org.apache.spark.sql.functions._
// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (s"g${i % 2}", s"v$i"))

  test("streamed register folds match the single-pass sketch batch for batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("hllstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hllstream_ck").toString
    val input = MemoryStream[(String, String)]
    val query = HllStream.start(
      input.toDF().toDF("g", "v"), dir, ckpt, Seq("g"), col("v"))
    try {
      input.addData(rows(0, 1500): _*)
      query.processAllAvailable()
      def stored = HllStore.estimate(spark, dir, Seq("g"))
        .orderBy("g").collect().map(_.toSeq).toSeq
      def whole(hi: Int) = Sketches.hllDistinct(
          rows(0, hi).toDF("g", "v"), Seq("g"), $"v")
        .orderBy("g").collect().map(_.toSeq).toSeq
      assert(stored == whole(1500))
      // second micro-batch overlaps the first: max-fold absorbs it
      input.addData(rows(1000, 2500): _*)
      query.processAllAvailable()
      assert(stored == whole(2500))
      // the streaming store IS an HllStore: batch appends compose
      HllStore.append(spark, dir, rows(2500, 3000).toDF("g", "v"), Seq("g"), $"v")
      assert(stored == whole(3000))
    } finally query.stop()
  }

  test("a stream fold AFTER a batch append keeps the appended data (ADVICE r17)") {
    val dir = java.nio.file.Files.createTempDirectory("hllstream_sa").toString
    HllStream.applyBatch(rows(0, 800).toDF("g", "v"), dir, Seq("g"), col("v"))
    // batch append lands a registers_inc_0.parquet generation…
    HllStore.append(spark, dir, rows(800, 1600).toDF("g", "v"), Seq("g"), $"v")
    // …which the next micro-batch's whole-root swap must fold in, not delete
    HllStream.applyBatch(rows(1600, 2400).toDF("g", "v"), dir, Seq("g"), col("v"))
    val stored = HllStore.estimate(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val whole = Sketches.hllDistinct(
        rows(0, 2400).toDF("g", "v"), Seq("g"), $"v")
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(stored == whole)
  }

  test("an append racing the fold (between staging write and swap) is absorbed, not lost") {
    // The r18-flagged writer race: the fold listed generations eagerly,
    // so an append committing after that listing and before swapIn was
    // silently deleted by the whole-root swap. The raceHook seam fires
    // at exactly that instant; the re-list-and-retry fold must detect
    // the new generation, re-fold, and keep the appended data.
    val dir = java.nio.file.Files.createTempDirectory("hllstream_race").toString
    HllStream.applyBatch(rows(0, 800).toDF("g", "v"), dir, Seq("g"), col("v"))
    var fired = 0
    HllStream.raceHook = () => {
      // one-shot: the RETRY fold's staging write fires the hook again
      // and must see a quiesced store, or the retry loop never ends
      if (fired == 0) {
        fired += 1
        HllStore.append(spark, dir, rows(800, 1600).toDF("g", "v"), Seq("g"), $"v")
      }
    }
    try HllStream.applyBatch(rows(1600, 2400).toDF("g", "v"), dir, Seq("g"), col("v"))
    finally HllStream.raceHook = () => ()
    assert(fired == 1, "the race hook must have injected the append")
    val stored = HllStore.estimate(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val whole = Sketches.hllDistinct(
        rows(0, 2400).toDF("g", "v"), Seq("g"), $"v")
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(stored == whole, "the racing append's data must survive the swap")
    // the absorbed generation was folded INTO the new base: the store
    // root holds no stale increment afterwards
    assert(HllStore.sources(spark, s"$dir/hll").size == 1)
  }

  test("a pathological appender that outruns every retry errors loudly, never silently drops") {
    val dir = java.nio.file.Files.createTempDirectory("hllstream_outrun").toString
    HllStream.applyBatch(rows(0, 200).toDF("g", "v"), dir, Seq("g"), col("v"))
    var n = 0
    HllStream.raceHook = () => {
      n += 1
      HllStore.append(spark, dir, rows(200 + n * 10, 210 + n * 10).toDF("g", "v"), Seq("g"), $"v")
    }
    val e = try intercept[RuntimeException] {
      HllStream.applyBatch(rows(5000, 5200).toDF("g", "v"), dir, Seq("g"), col("v"))
    } finally HllStream.raceHook = () => ()
    assert(e.getMessage.contains("gained generations"), e.getMessage)
  }

  test("re-applying a batch is a no-op (idempotent max — no fence needed)") {
    val dir = java.nio.file.Files.createTempDirectory("hllstream_re").toString
    val batch = rows(0, 800).toDF("g", "v")
    HllStream.applyBatch(batch, dir, Seq("g"), col("v"))
    val once = HllStore.estimate(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    // at-least-once re-delivery: same batch folds again, state unchanged
    HllStream.applyBatch(batch, dir, Seq("g"), col("v"))
    val twice = HllStore.estimate(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(twice == once)
    // a stream resuming with the wrong register width raises, never corrupts
    val e = intercept[Throwable] {
      HllStream.applyBatch(batch, dir, Seq("g"), col("v"), b = 5)
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs(e).contains("mismatch"), msgs(e))
  }
}
