package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Plain-Scala reference PageRank (same leak semantics). */
  private def refRank(
      edges: Seq[(Long, Long)],
      iterations: Int,
      damping: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val in = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      r = nodes.map(v => v -> ((1.0 - damping) / n + damping * in.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches the reference on a cycle (uniform fixed point)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iterations = 5)
      .as[(Long, Double)].collect().toMap
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-12, got.toString))
    graft.CachedFrames.unpersistAll()
  }

  test("pageRank matches the reference on an asymmetric graph with a dangling node") {
    // hub 1 feeds 2/3/4; 2 and 3 link back; 4 is dangling (leaks)
    val raw = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (3L, 2L))
    val expected = refRank(raw, iterations = 4)
    val got = Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", iterations = 4)
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"node $k: got ${got(k)}, want $v")
    }
    // dangling leak: total mass strictly below 1
    assert(got.values.sum < 1.0 - 1e-6)
    // the hub (highest in-degree from ranked pages) outranks the sink
    assert(got(1L) > got(4L))
    graft.CachedFrames.unpersistAll()
  }

  test("pageRank is partitioning-independent and validates inputs") {
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 2L))
    val a = Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 3)
      .as[(Long, Double)].collect().toMap
    graft.CachedFrames.unpersistAll()
    val b = Graph.pageRank(raw.toDF("src", "dst").repartition(7), "src", "dst", 3)
      .as[(Long, Double)].collect().toMap
    graft.CachedFrames.unpersistAll()
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(math.abs(b(k) - v) < 1e-12) }
    intercept[IllegalArgumentException] {
      Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 3, damping = 1.0)
    }
  }

  test("pageRank reliable-checkpoint variant produces identical ranks (VERDICT r14 #5)") {
    // The cluster path: executor loss mid-run recomputes from the
    // reliable checkpoint instead of killing the job. Ranks must be
    // bit-identical to the localCheckpoint default.
    val raw = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (3L, 2L))
    val local = Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 4)
      .as[(Long, Double)].collect().toMap
    graft.CachedFrames.unpersistAll()
    // opting in without a checkpoint dir is a hard error, not a
    // silent localCheckpoint fallback
    val hadDir = spark.sparkContext.getCheckpointDir
    if (hadDir.isEmpty) intercept[IllegalArgumentException] {
      Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 4,
        reliableCheckpoint = true)
    }
    val dir = java.nio.file.Files.createTempDirectory("pr-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val reliable = Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 4,
        reliableCheckpoint = true)
      .as[(Long, Double)].collect().toMap
    graft.CachedFrames.unpersistAll()
    assert(reliable == local) // bit-identical, not just tolerance-close
  }

  test("pageRank truncation cadence never changes ranks (0 = one-job chain)") {
    // truncateEvery trades per-iteration materialization (long runs)
    // against scheduling latency (short fixed runs); the ranks must be
    // bit-identical for every cadence.
    val raw = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 1L), (3L, 1L), (3L, 2L))
    def run(cadence: Int) = {
      val r = Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 4,
          truncateEvery = cadence)
        .as[(Long, Double)].collect().toMap
      graft.CachedFrames.unpersistAll()
      r
    }
    val everyIter = run(1)
    assert(run(0) == everyIter)
    assert(run(2) == everyIter)
    intercept[IllegalArgumentException] {
      Graph.pageRank(raw.toDF("src", "dst"), "src", "dst", 3, truncateEvery = -1)
    }
  }
}
