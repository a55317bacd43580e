package graft.streaming

import graft.SparkSpec
// Spark 4.1 moved MemoryStream under execution.streaming.runtime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SnapshotUpsertSpec extends SparkSpec {

  private def snapshot(path: String) =
    spark.read.parquet(path).orderBy("id")

  test("applyBatch bootstraps, upserts, deletes, and is re-apply idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snap").toString
    val path = s"$dir/state.parquet"
    // bootstrap from nothing: two inserts
    val b1 = Seq(
      (1L, "a", 1L, "I"), (2L, "b", 1L, "I")
    ).toDF("id", "v", "version", "op")
    SnapshotUpsert.applyBatch(b1, path, Seq("id"), "version", "op")
    assert(snapshot(path).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // update 1, delete 2, insert 3; within-batch compaction picks the
    // max version for key 1
    val b2 = Seq(
      (1L, "stale", 2L, "U"), (1L, "a2", 3L, "U"),
      (2L, "b", 2L, "D"), (3L, "c", 1L, "I")
    ).toDF("id", "v", "version", "op")
    SnapshotUpsert.applyBatch(b2, path, Seq("id"), "version", "op")
    val want = Seq((1L, "a2"), (3L, "c"))
    assert(snapshot(path).as[(Long, String)].collect().toSeq == want)
    // at-least-once: re-applying the same batch leaves the snapshot
    // unchanged (latest-per-key is stable)
    SnapshotUpsert.applyBatch(b2, path, Seq("id"), "version", "op")
    assert(snapshot(path).as[(Long, String)].collect().toSeq == want)
  }

  test("mid-swap crash leaves a recoverable snapshot (.old restored)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("snapcrash").toString
    val path = s"$dir/state.parquet"
    val b1 = Seq((1L, "a", 1L, "I")).toDF("id", "v", "version", "op")
    SnapshotUpsert.applyBatch(b1, path, Seq("id"), "version", "op")
    // simulate dying between the two renames: cur moved to .old,
    // .next never promoted
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(hconf)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + ".old")))
    val b2 = Seq((2L, "b", 1L, "I")).toDF("id", "v", "version", "op")
    SnapshotUpsert.applyBatch(b2, path, Seq("id"), "version", "op")
    // recovery restored batch 1's row before merging batch 2
    assert(snapshot(path).as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("streaming end-to-end: two micro-batches merge through foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("snapstream").toString
    val path = s"$dir/state.parquet"
    val input = MemoryStream[(Long, String, Long, String)]
    val changes = input.toDF().toDF("id", "v", "version", "op")
    val query = SnapshotUpsert.start(
      changes, path, s"$dir/ckpt", Seq("id"), "version", "op")
    try {
      input.addData((1L, "a", 1L, "I"), (2L, "b", 1L, "I"))
      query.processAllAvailable()
      assert(snapshot(path).as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b")))
      input.addData((2L, "b", 2L, "D"), (3L, "c", 1L, "I"))
      query.processAllAvailable()
      assert(snapshot(path).as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (3L, "c")))
    } finally query.stop()
  }
}
