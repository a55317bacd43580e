package graft.pipeline

import graft.{CachedFrames, Main, SparkSpec}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The corpus-build DAG as a user operates it: `--pipeline
  * build-corpus` through the CLI dispatch, published partitioned by
  * split, deterministic across re-runs, with curriculum phases on the
  * train slice only. The oracle row q_pipeline_corpus pins the
  * values; this spec pins the LIFECYCLE (write layout, read-back,
  * re-run stability).
  */
class CorpusBuildSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("corpus-build").toString

  test("build-corpus CLI publishes a split-partitioned corpus matching the frame") {
    val dir = tmp()
    val out = s"$dir/corpus"
    val readBack = Main.run(spark, Main.parseArgs(Array(
      "--pipeline", "build-corpus",
      "--input", s"$sf0001/documents.parquet",
      "--output", out)))

    // split is a PARTITION of the published layout, not a column a
    // trainer has to filter-scan for: a reader of split=train touches
    // zero val/test bytes.
    assert(new java.io.File(s"$out/split=train").isDirectory,
      "output must be partitioned by split with a train partition")

    val frame = CorpusBuild.corpusFrame(
      spark.read.parquet(s"$sf0001/documents.parquet"), CorpusBuild.Config())
    val expected = frame.collect().map(_.toSeq).toSet
    // partitionBy moves `split` to the end of the read-back schema;
    // compare on the frame's own column order.
    val got = readBack.select(frame.columns.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq).toSet
    assert(got == expected, "read-back corpus must equal the lazy frame")
    assert(expected.nonEmpty)
    CachedFrames.unpersistAll()
  }

  test("curriculum phases cover the train slice only; re-runs are bit-stable") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = CorpusBuild.corpusFrame(docs, CorpusBuild.Config()).collect()

    val bySplit = a.groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    val train = bySplit.getOrElse("train", Array.empty)
    assert(train.nonEmpty, "sf0.001 corpus must land train rows")
    assert(train.forall { r =>
      !r.isNullAt(r.fieldIndex("phase")) && {
        val p = r.getAs[Int]("phase"); p >= 1 && p <= 4
      }
    }, "every train row carries a phase in [1, 4]")
    assert((bySplit.getOrElse("val", Array.empty) ++
        bySplit.getOrElse("test", Array.empty))
      .forall(r => r.isNullAt(r.fieldIndex("phase")) &&
        r.isNullAt(r.fieldIndex("pctl_r"))),
      "val/test rows must carry NULL curriculum columns")

    // determinism: same input, same config → bit-identical corpus
    // (hash split + seeded mix, no rand() anywhere)
    val b = CorpusBuild.corpusFrame(docs, CorpusBuild.Config()).collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    CachedFrames.unpersistAll()
  }
}
