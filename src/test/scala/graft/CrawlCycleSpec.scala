package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Drives TWO crawl cycles end-to-end through the CLI dispatch
  * (`Main.run` with `--pipeline dedup-increment` args), with the
  * fingerprint + signature stores persisted on disk BETWEEN runs —
  * the X48 store lifecycle as a user would actually operate it.
  */
class CrawlCycleSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("crawl-cycle").toString

  // Quality-passing fixture texts (≥5 tokens, mostly alphabetic,
  // sane token lengths).
  private val textA =
    "the quick brown fox jumps over the lazy dog near the river bank every sunny morning"
  private val textB =
    "distributed query engines shuffle intermediate data between executor nodes whenever wide " +
      "aggregations require repartitioning rows by grouping keys so planners push partial " +
      "aggregation map side to cut network traffic before the final merge stage completes"
  // One mid-document token changed: 3 of ~33 word-3-grams differ, so
  // true Jaccard ≈ 0.83 — far above the 0.5 near-screen threshold.
  private val textBNear = textB.replace("network", "cluster")
  private val textD =
    "approximate nearest neighbor search buckets embedding vectors with locality sensitive " +
      "hashing before scoring candidates by cosine distance"

  private def writeDocs(path: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def runCycle(
      input: String, output: String, storeDir: String,
      extraArgs: Array[String] = Array.empty): Set[Long] = {
    val kept = Main.run(spark, Main.parseArgs(Array(
      "--pipeline", "dedup-increment",
      "--input", input, "--output", output, "--store_dir", storeDir) ++ extraArgs))
    kept.select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("two increments through the CLI share stores on disk") {
    val dir = tmp()
    val store = s"$dir/store"

    // Cycle 1: doc 4 is an exact intra-increment copy of doc 1
    // (stage 0 keeps the min id), doc 3 is junk (quality gate).
    writeDocs(s"$dir/inc1", Seq(
      1L -> textA, 2L -> textB, 3L -> "x x x", 4L -> textA))
    val kept1 = runCycle(s"$dir/inc1", s"$dir/out1", store)
    assert(kept1 == Set(1L, 2L))

    // Stores persisted between runs: one fingerprint + one signature
    // per survivor, junk and dropped copies absent.
    val fp1 = spark.read.parquet(s"$store/fingerprints")
    val sig1 = spark.read.parquet(s"$store/signatures")
    assert(fp1.count() == 2 && sig1.count() == 2)
    assert(sig1.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(!new java.io.File(s"$store/fingerprints.next").exists(),
      "swap must consume the staging dir")

    // Cycle 2: 10 = re-crawl of doc 1 (exact screen), 11 = near-copy
    // of doc 2 (near screen), 13 = junk (quality gate), 12 = genuinely
    // new (kept).
    writeDocs(s"$dir/inc2", Seq(
      10L -> textA, 11L -> textBNear, 12L -> textD, 13L -> "zz 9 !!"))
    val kept2 = runCycle(s"$dir/inc2", s"$dir/out2", store)
    assert(kept2 == Set(12L))

    // Stores absorbed exactly the cycle-2 survivor.
    val fp2 = spark.read.parquet(s"$store/fingerprints")
    val sig2 = spark.read.parquet(s"$store/signatures")
    assert(fp2.count() == 3 && sig2.count() == 3)
    assert(sig2.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 12L))

    // A third cycle replaying increment 2 drops everything: the
    // survivors of cycle 2 are now history too.
    val kept3 = runCycle(s"$dir/inc2", s"$dir/out3", store)
    assert(kept3.isEmpty)
    assert(spark.read.parquet(s"$store/signatures").count() == 3)

    CachedFrames.unpersistAll()
  }

  test("ttl expires store entries: old docs re-admit and the store stays bounded") {
    val dir = tmp()
    val store = s"$dir/store"
    val ttl = Array("--ttl_cycles", "2")

    writeDocs(s"$dir/inc1", Seq(1L -> textA))
    assert(runCycle(s"$dir/inc1", s"$dir/out1", store, ttl) == Set(1L)) // cycle 0
    writeDocs(s"$dir/inc2", Seq(2L -> textB))
    assert(runCycle(s"$dir/inc2", s"$dir/out2", store, ttl) == Set(2L)) // cycle 1
    // Cycle 2: doc 1's entry (cycle 0) is outside the 2-cycle window —
    // its re-crawl re-admits; doc 2's entry (cycle 1) still screens.
    writeDocs(s"$dir/inc3", Seq(10L -> textA, 11L -> textB))
    assert(runCycle(s"$dir/inc3", s"$dir/out3", store, ttl) == Set(10L))
    // Expired rows are gone from the written store: doc 1's original
    // entry dropped, doc 10's replacement + doc 2's entry remain.
    val sig = spark.read.parquet(s"$store/signatures")
    assert(sig.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 10L))
    CachedFrames.unpersistAll()
  }

  test("compactStore keeps only live-corpus entries") {
    import spark.implicits._
    val store = Seq((1L, Seq(1L, 2L)), (2L, Seq(3L, 4L)), (3L, Seq(5L, 6L)))
      .toDF("doc_id", "sig")
    val live = Seq(Tuple1(1L), Tuple1(3L)).toDF("doc_id")
    val got = ops.Dedup.compactStore(store, live, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }

  test("degenerate increments: all-junk and empty leave the stores intact") {
    val dir = tmp()
    val store = s"$dir/store"
    writeDocs(s"$dir/inc1", Seq(1L -> textA))
    assert(runCycle(s"$dir/inc1", s"$dir/out1", store) == Set(1L))

    // all-junk increment: nothing survives, store unchanged (cycle
    // still advances the swap without corrupting anything)
    writeDocs(s"$dir/inc2", Seq(20L -> "x y z"))
    assert(runCycle(s"$dir/inc2", s"$dir/out2", store).isEmpty)
    assert(spark.read.parquet(s"$store/signatures").count() == 1)

    // zero-row increment: every screen degenerates to a no-op
    writeDocs(s"$dir/inc3", Seq.empty[(Long, String)])
    assert(runCycle(s"$dir/inc3", s"$dir/out3", store).isEmpty)
    assert(spark.read.parquet(s"$store/signatures").count() == 1)
    assert(spark.read.parquet(s"$store/fingerprints").count() == 1)

    // and the store still screens correctly after the degenerate runs
    writeDocs(s"$dir/inc4", Seq(30L -> textA, 31L -> textD))
    assert(runCycle(s"$dir/inc4", s"$dir/out4", store) == Set(31L))
    CachedFrames.unpersistAll()
  }

  test("runWithMetrics reports per-stage counts from the single write action") {
    val dir = tmp()
    writeDocs(s"$dir/inc", Seq(
      1L -> textA, 2L -> textA,    // intra-exact collapses to one
      3L -> textB, 4L -> "x x x")) // junk gated by quality
    val (_, m) = graft.pipeline.CrawlCycle.runWithMetrics(spark,
      graft.pipeline.CrawlCycle.Config(
        input = s"$dir/inc", output = s"$dir/out", storeDir = s"$dir/store"))
    assert(m == Map(
      "increment_rows" -> 4L, "after_intra" -> 3L,
      "after_exact" -> 3L, "kept" -> 2L), s"got $m")
    CachedFrames.unpersistAll()
  }

  test("a mid-swap crash leaves a .old copy that the next run restores") {
    val dir = tmp()
    val store = s"$dir/store"
    writeDocs(s"$dir/inc1", Seq(1L -> textA))
    assert(runCycle(s"$dir/inc1", s"$dir/out1", store) == Set(1L))
    // Simulate dying between `rename cur -> .old` and `rename .next -> cur`:
    // the live dir is gone, only the .old copy survives.
    val sig = new java.io.File(s"$store/signatures")
    assert(sig.renameTo(new java.io.File(s"$store/signatures.old")))
    // The next cycle must restore the store instead of bootstrapping
    // empty (which would re-admit all of history) — the re-crawl of
    // doc 1 still screens out.
    writeDocs(s"$dir/inc2", Seq(10L -> textA.replace("sunny", "rainy"), 11L -> textD))
    assert(runCycle(s"$dir/inc2", s"$dir/out2", store) == Set(11L))
    assert(!new java.io.File(s"$store/signatures.old").exists())
    CachedFrames.unpersistAll()
  }

  test("first cycle bootstraps empty stores without hand-built schemas") {
    val dir = tmp()
    writeDocs(s"$dir/inc", Seq(1L -> textA))
    val kept = runCycle(s"$dir/inc", s"$dir/out", s"$dir/store")
    assert(kept == Set(1L))
    val sig = spark.read.parquet(s"$dir/store/signatures")
    // signature schema round-trips: k=16 long slots per doc
    assert(sig.select(size(col("sig"))).head().getInt(0) == 16)
    CachedFrames.unpersistAll()
  }
}
