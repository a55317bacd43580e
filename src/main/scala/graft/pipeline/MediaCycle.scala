package graft.pipeline

import graft.CachedFrames
import graft.io.{AtomicSwap, Sink}
import graft.ops.{Dedup, Multimodal}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** X139 media crawl-cycle: one CLI-driven increment of continuous
  * MULTIMODAL ingestion — the [[CrawlCycle]] store lifecycle with the
  * text screens replaced by their binary/perceptual twins, so the
  * image/audio side of the corpus gets the same
  * screen-against-history story the text side has had since X48.
  *
  * Per cycle, over an increment of `(id, content: binary,
  * media_type)` rows:
  *
  *   0. intra-increment exact dedup — md5 over the raw payload bytes,
  *      keep the lowest id (crawls re-fetch; byte-identical copies
  *      inside one batch are collapsed before anything decodes),
  *   1. exact screen: anti-join on the persisted byte-fingerprint
  *      store (one 16-byte-key join; history payloads untouched),
  *   2. perceptual screen: decode the survivors ONCE (images →
  *      [[Multimodal.dHash]], audio → [[Multimodal.audioFingerprint]]
  *      — a payload decodes as at most one kind), then keep-old-drop-
  *      new against the persisted phash store via the banded hamming
  *      join ([[Dedup.simhashIncrementPairs]], kind-keyed so image
  *      hashes never screen audio hashes; pigeonhole-exact at
  *      `maxHamming ≤ chunks − 1`). A re-encoded / re-scaled /
  *      re-containered / gain-shifted copy of an already-ingested
  *      asset is dropped even though its bytes are new.
  *
  * Undecodable payloads quarantine through: they carry no phash, are
  * screened exactly (stage 0/1) only, and survive to the output — a
  * 100 TB ingest quarantines bad media rows, it doesn't dedup them
  * blind.
  *
  * Store lifecycle improves on [[CrawlCycle]]'s two-swap layout: BOTH
  * tables live under ONE `<storeDir>/media` unit (`fingerprints/` +
  * `phashes/`), update plans read the current unit, the updated
  * frames land together in `media.next`, and a SINGLE [[AtomicSwap]]
  * promotes them (crash-safe, `.old` recovery at startup) — so no
  * crash position can leave a mixed pair (the text cycle's documented
  * wart: fingerprints from cycle N beside phashes from N−1 would drop
  * the re-run at the exact screen and never admit cycle N's hashes to
  * the perceptual store, silently re-admitting every future
  * re-encode). Every row is stamped with its admission cycle; the
  * stores grow by survivor rows only — one md5 + at most one (kind,
  * phash) per kept asset — so store size tracks the deduplicated
  * catalog, orders of magnitude smaller than the media bytes.
  * Within-increment PERCEPTUAL dedup is deliberately not screened
  * here (same contract as [[graft.ops.Dedup.dedupIncrement]]: the
  * store always wins a match; intra-increment near-dups are the
  * caller's composition), so a cycle's survivors may contain mutual
  * near-dups that then all enter the store.
  */
object MediaCycle {

  final case class Config(
      input: String,
      output: String,
      storeDir: String,
      maxHamming: Int = 7,
      chunks: Int = 8)

  def storePath(cfg: Config): String = s"${cfg.storeDir}/media"
  def fingerprintPath(cfg: Config): String = s"${storePath(cfg)}/fingerprints"
  def phashPath(cfg: Config): String = s"${storePath(cfg)}/phashes"

  /** (id, kind, phash) for every decodable payload — each decoder
    * quarantines foreign formats to NULL, and no payload decodes as
    * both kinds, so the union holds at most one row per asset. Narrow
    * per-partition decode, no shuffle introduced.
    */
  private def perceptualHashes(media: Dataset[Multimodal.MediaRecord]): DataFrame = {
    val img = Multimodal.dHash(media).toDF()
      .filter(col("phash").isNotNull)
      .select(col("id"), lit("image").as("kind"), col("phash"))
    val aud = Multimodal.audioFingerprint(media).toDF()
      .filter(col("phash").isNotNull)
      .select(col("id"), lit("audio").as("kind"), col("phash"))
    img.unionByName(aud)
  }

  /** Run one cycle; returns the kept survivors as read back from
    * `cfg.output` (the on-disk result, not the lazy plan).
    */
  def run(spark: SparkSession, cfg: Config): DataFrame =
    runWithMetrics(spark, cfg)._1

  /** [[run]] plus per-stage row counts via `Dataset.observe` — all
    * captured during the ONE output-write action ([[CrawlCycle]]'s
    * zero-extra-scan audit; decode is the expensive stage here, so an
    * extra counting scan would re-decode the increment).
    */
  def runWithMetrics(spark: SparkSession, cfg: Config): (DataFrame, Map[String, Long]) = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val hp = new Path(p); hp.getFileSystem(hconf).exists(hp)
    }
    val increment = spark.read.parquet(cfg.input)
      .select(col("id").cast("long").as("id"), col("content"), col("media_type"))
    AtomicSwap.recover(spark, storePath(cfg))
    def withCycle(df: DataFrame): DataFrame =
      if (df.columns.contains("cycle")) df
      else df.withColumn("cycle", lit(0))
    // Store read-backs: this module writes both tables with a fixed
    // schema, so when the on-disk column set matches (one driver-side
    // footer read — no job) the read states the schema and skips the
    // per-call inference job; any drifted/legacy layout falls back to
    // inference, preserving the old behavior loudly rather than
    // null-filling silently (r22, guide §6 fewer jobs).
    def storeRead(path: String, stated: String): DataFrame = {
      val want = spark.read.schema(stated).parquet(path).schema.fieldNames.toSet
      if (graft.io.ParquetFooters.columnNames(spark, path) == want)
        spark.read.schema(stated).parquet(path)
      else spark.read.parquet(path)
    }
    val fpStoreAll = withCycle(
      if (exists(fingerprintPath(cfg)))
        storeRead(fingerprintPath(cfg), "fingerprint STRING, cycle INT")
      else increment.limit(0).select(md5(col("content")).as("fingerprint")))
    val phStoreAll = withCycle(
      if (exists(phashPath(cfg)))
        storeRead(phashPath(cfg), "kind STRING, phash BIGINT, cycle INT")
      else perceptualHashes(increment.limit(0).as[Multimodal.MediaRecord])
        .select(col("kind"), col("phash")))
    // Current cycle = one past the newest admission (every admitted
    // asset has a fingerprint row; the phash store misses quarantined
    // ones). Read from parquet column statistics on the driver when
    // the store has the cycle column (r22 — was a max() agg job per
    // run); legacy/fresh layouts keep the tiny agg.
    val cycle: Int =
      if (exists(fingerprintPath(cfg)) &&
          graft.io.ParquetFooters
            .columnNames(spark, fingerprintPath(cfg)).contains("cycle"))
        graft.io.ParquetFooters
          .int32Range(spark, fingerprintPath(cfg), "cycle")
          .map(_._2 + 1).getOrElse(0)
      else Option(
        fpStoreAll.agg(max(col("cycle"))).head().get(0))
        .map(_.asInstanceOf[Int] + 1).getOrElse(0)
    val fpStore = fpStoreAll
    val phStore = phStoreAll

    val obsIn = org.apache.spark.sql.Observation()
    val obsIntra = org.apache.spark.sql.Observation()
    val obsExact = org.apache.spark.sql.Observation()
    val obsKept = org.apache.spark.sql.Observation()
    val withFp = increment.observe(obsIn, count(lit(1)).as("n"))
      .withColumn("fingerprint", md5(col("content")))
    val intra = withFp.join(
      withFp.groupBy(col("fingerprint")).agg(min(col("id")).as("id")),
      Seq("fingerprint", "id"), "left_semi")
      .observe(obsIntra, count(lit(1)).as("n"))
    val exactClean = intra
      .join(fpStore.select("fingerprint"), Seq("fingerprint"), "left_anti")
      .observe(obsExact, count(lit(1)).as("n"))
    // Decode ONCE: the phash frame feeds both the screen (below) and
    // the store update (after the write) — persistOnce keeps the
    // second consumer from re-decoding the increment.
    val phNew = CachedFrames.persistOnce(
      perceptualHashes(exactClean.select("id", "content", "media_type")
        .as[Multimodal.MediaRecord]))
    val dropped = Dedup.simhashIncrementPairs(
      phNew.select(col("id"), col("kind"), col("phash").as("simhash")),
      phStore.select(col("kind"), col("phash").as("simhash")),
      "id", bits = 64, chunks = cfg.chunks, maxHamming = cfg.maxHamming,
      extraKeys = Seq("kind"))
    val kept = exactClean.join(dropped.select("id"), Seq("id"), "left_anti")
      .select("id", "content", "media_type")

    Sink.parquetWrite(kept.observe(obsKept, count(lit(1)).as("n")), cfg.output)
    def n(o: org.apache.spark.sql.Observation): Long =
      o.get.get("n").map(_.asInstanceOf[Long]).getOrElse(0L)
    val metrics = Map(
      "increment_rows" -> n(obsIn),
      "after_intra" -> n(obsIntra),
      "after_exact" -> n(obsExact),
      "kept" -> n(obsKept))
    println("MEDIA_CYCLE " + metrics.map { case (k, v) => s"$k=$v" }.mkString(" "))

    // Store updates join against the MATERIALIZED survivors (the
    // screens ran once for the output write). The output was written
    // by THIS run with a statically known schema — state it on the
    // read-back so no footer-inference job runs (r21).
    val keptOnDisk = spark.read
      .schema("id LONG, content BINARY, media_type STRING")
      .parquet(cfg.output)
    val keptIds = keptOnDisk.select("id")
    val nextFpStore = fpStore.select(col("fingerprint"), col("cycle"))
      .union(keptOnDisk.select(md5(col("content")).as("fingerprint"))
        .withColumn("cycle", lit(cycle)))
    val nextPhStore = phStore.select(col("kind"), col("phash"), col("cycle"))
      .union(phNew.join(keptIds, Seq("id"), "left_semi")
        .select(col("kind"), col("phash"))
        .withColumn("cycle", lit(cycle)))
    // one staging unit, one swap: a crash leaves the WHOLE store at
    // cycle N−1 or N, never a fingerprint/phash mixed pair. Stale
    // staging from a crashed run is garbage in every position — drop
    // it rather than trust overwrite to cover every stale child.
    val nextUnit = storePath(cfg) + ".next"
    val nextP = new Path(nextUnit)
    nextP.getFileSystem(hconf).delete(nextP, true)
    nextFpStore.write.mode("overwrite").parquet(s"$nextUnit/fingerprints")
    nextPhStore.write.mode("overwrite").parquet(s"$nextUnit/phashes")
    AtomicSwap.swapIn(spark, storePath(cfg), nextUnit)
    // The decode cache is per-cycle working state: release it here so
    // a long-lived driver running many cycles in one JVM does not
    // accumulate cached decode frames until a global unpersistAll
    // (ADVICE r20).
    CachedFrames.release(phNew)
    (keptOnDisk, metrics)
  }
}
