package graft.pipeline

import graft.SparkSpec
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** X139 — the multimodal crawl-cycle: increments of binary media
  * screened exact-then-perceptual against persisted md5 + phash
  * stores, keep-old-drop-new, crash-safe swaps — driven through the
  * CLI dispatch exactly as a scheduler would.
  */
class MediaCycleSpec extends SparkSpec {
  import spark.implicits._

  private val bmps = "/root/repo/fixtures/bmps.ndjson"
  private val audio = "/root/repo/fixtures/audio.ndjson"

  private def media = {
    val bmp = Multimodal.ingestBase64(spark.read.json(bmps), "id", "b64", "image")
    val aud = Multimodal.ingestBase64(spark.read.json(audio), "id", "b64", "audio")
      .withColumn("id", col("id") + 100)
    bmp.unionByName(aud)
  }

  private def cli(input: String, output: String, store: String) =
    graft.Main.run(spark, graft.Main.parseArgs(Array(
      "--pipeline", "media-cycle",
      "--input", input, "--output", output, "--store_dir", store)))

  test("two CLI cycles: exact re-fetches and perceptual re-encodes drop, new + quarantine keep") {
    val dir = java.nio.file.Files.createTempDirectory("media-cycle").toString
    media.filter(col("id").isin(1, 2, 3, 101, 110)).write.parquet(s"$dir/inc1")
    media.filter(col("id").isin(2, 3, 4, 5, 6, 106, 111, 112)).write.parquet(s"$dir/inc2")

    val out1 = cli(s"$dir/inc1", s"$dir/out1", s"$dir/store")
    // bootstrap: nothing to screen against, all five kept
    assert(out1.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 101L, 110L))
    assert(new java.io.File(s"$dir/store/media/fingerprints").isDirectory)
    assert(new java.io.File(s"$dir/store/media/phashes").isDirectory)

    val out2 = cli(s"$dir/inc2", s"$dir/out2", s"$dir/store")
    // 2,3 byte-identical re-fetches -> exact drop; 4 is a byte-exact
    // copy of STORED 1 -> exact drop; 106 is the AIFF re-container of
    // stored WAV 101, 111 the half-gain re-encode of stored 110 ->
    // perceptual drops (new bytes, old hashes); 5 (different image),
    // 112 (different envelope) and 6 (quarantine, no phash) keep
    assert(out2.select("id").as[Long].collect().sorted.toSeq == Seq(5L, 6L, 112L))

    // stores grew by survivors only, kind-tagged, cycle-stamped
    val ph = spark.read.parquet(s"$dir/store/media/phashes")
    assert(ph.columns.sorted.toSeq == Seq("cycle", "kind", "phash"))
    assert(ph.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
      == Map("image" -> 4L, "audio" -> 3L)) // c1: 3 img + 2 aud; c2: 5, 112
    val fp = spark.read.parquet(s"$dir/store/media/fingerprints")
    assert(fp.count() == 8) // 5 + 3 survivors, quarantined row included
    assert(fp.select(max("cycle")).head.getInt(0) == 1)
  }

  test("re-running an already-absorbed increment drops everything (store wins, idempotent)") {
    val dir = java.nio.file.Files.createTempDirectory("media-cycle-re").toString
    media.filter(col("id").isin(1, 3, 110)).write.parquet(s"$dir/inc")
    assert(cli(s"$dir/inc", s"$dir/out1", s"$dir/store").count() == 3)
    val (again, metrics) = MediaCycle.runWithMetrics(spark, MediaCycle.Config(
      s"$dir/inc", s"$dir/out2", s"$dir/store"))
    assert(again.isEmpty, "every re-crawled asset must screen out")
    assert(metrics("increment_rows") == 3 && metrics("after_exact") == 0
      && metrics("kept") == 0)
    // stores unchanged in size: nothing was admitted
    assert(spark.read.parquet(s"$dir/store/media/fingerprints").count() == 3)
  }

  test("a crash between the swap's renames recovers: the store unit is atomic, never a mixed pair") {
    val dir = java.nio.file.Files.createTempDirectory("media-cycle-crash").toString
    media.filter(col("id").isin(1, 110)).write.parquet(s"$dir/inc")
    assert(cli(s"$dir/inc", s"$dir/out1", s"$dir/store").count() == 2)
    // simulate dying between swapIn's two renames: the WHOLE unit
    // (fingerprints AND phashes together) sits under media.old — the
    // single-swap layout's point vs the text cycle's per-store swaps,
    // where this crash position strands a fingerprint/phash MIXED pair
    val unit = new java.io.File(s"$dir/store/media")
    assert(unit.renameTo(new java.io.File(s"$dir/store/media.old")))
    val again = cli(s"$dir/inc", s"$dir/out2", s"$dir/store")
    assert(again.isEmpty, "recovery must restore BOTH screens before the cycle")
    assert(new java.io.File(s"$dir/store/media/fingerprints").isDirectory)
    assert(spark.read.parquet(s"$dir/store/media/phashes").count() == 2)
    assert(!new java.io.File(s"$dir/store/media.old").exists())
  }

  test("quarantined payloads screen exactly only: same bytes drop, mutated bytes keep") {
    val dir = java.nio.file.Files.createTempDirectory("media-cycle-q").toString
    def rec(id: Long, bytes: String) =
      (id, bytes.getBytes("UTF-8"), "application/octet-stream")
    Seq(rec(1, "undecodable payload A")).toDF("id", "content", "media_type")
      .write.parquet(s"$dir/inc1")
    Seq(rec(2, "undecodable payload A"), rec(3, "undecodable payload B"))
      .toDF("id", "content", "media_type").write.parquet(s"$dir/inc2")
    assert(cli(s"$dir/inc1", s"$dir/out1", s"$dir/store").count() == 1)
    val out2 = cli(s"$dir/inc2", s"$dir/out2", s"$dir/store")
    assert(out2.select("id").as[Long].collect().toSeq == Seq(3L),
      "byte-identical quarantine drops exactly; mutated bytes pass (no phash to screen)")
    // the phash store stays empty — quarantined rows never hash
    assert(spark.read.parquet(s"$dir/store/media/phashes").count() == 0)
  }
}
