package graft.pipeline

import graft.SparkSpec
import graft.ops.Sketches
import org.apache.spark.sql.functions._

class HllStoreSpec extends SparkSpec {
  import spark.implicits._

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (s"g${i % 2}", s"v$i")).toDF("g", "v")

  test("store estimate == single-pass estimate; increments fold losslessly") {
    val dir = java.nio.file.Files.createTempDirectory("hllstore").toString
    // build on the first 2000 rows, append two overlapping increments
    HllStore.build(spark, rows(0, 2000), Seq("g"), $"v", dir)
    HllStore.append(spark, dir, rows(1500, 3000), Seq("g"), $"v") // overlaps base
    HllStore.append(spark, dir, rows(3000, 4000), Seq("g"), $"v")
    val stored = HllStore.estimate(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    // the whole-data single-pass sketch is the ground truth: the store
    // fold must reproduce it EXACTLY (max ρ idempotent under overlap)
    val whole = Sketches.hllDistinct(rows(0, 4000), Seq("g"), $"v")
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(stored == whole)
    // three generations on disk before compaction
    assert(HllStore.sources(spark, HllStore.registersPath(dir)).size == 3)
    // compaction folds to one base and changes nothing observable
    val compacted = HllStore.compact(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(compacted == whole)
    assert(HllStore.sources(spark, HllStore.registersPath(dir)).size == 1)
    // appends keep working after compaction
    HllStore.append(spark, dir, rows(4000, 4500), Seq("g"), $"v")
    val after = HllStore.estimate(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val wholeAfter = Sketches.hllDistinct(rows(0, 4500), Seq("g"), $"v")
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(after == wholeAfter)
  }

  test("append sketches with the store's own width; estimate reads registers only") {
    val dir = java.nio.file.Files.createTempDirectory("hllstore_b").toString
    HllStore.build(spark, rows(0, 1000), Seq("g"), $"v", dir, b = 5)
    // the appended generation must carry the store's b=5, not the default
    HllStore.append(spark, dir, rows(1000, 1200), Seq("g"), $"v")
    val root = HllStore.registersPath(dir)
    val gen = spark.read.parquet(s"$root/registers_inc_0.parquet")
    assert(gen.select("b").distinct().as[Int].collect().toSeq == Seq(5))
    // estimate agrees with a b=5 single pass
    val stored = HllStore.estimate(spark, dir, Seq("g"))
      .orderBy("g").collect().map(_.toSeq).toSeq
    val whole = Sketches.hllDistinct(rows(0, 1200), Seq("g"), $"v", b = 5)
      .orderBy("g").collect().map(_.toSeq).toSeq
    assert(stored == whole)
    // register state is bounded: ≤ generations × groups × 2^b rows
    val regRows = HllStore.sources(spark, root)
      .map(p => spark.read.parquet(p).count()).sum
    assert(regRows <= 2L * 2 * 32, s"register rows $regRows")
  }
}
