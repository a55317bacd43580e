package graft.pipeline

import graft.CachedFrames
import graft.io.Sink
import graft.ops.{Dedup, TextAnalysis}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X48 crawl-cycle pipeline: one CLI-driven increment of a continuous
  * ingestion loop, the orchestration analogue of the reference's
  * multi-job runner (`/root/reference/run-all-pipelines.sh:3-239`) for
  * the dedup-store lifecycle.
  *
  * Per cycle: read the new-document increment, screen it against the
  * PERSISTED stores from all previous cycles, keep the survivors, and
  * write back updated stores for the next cycle —
  *
  *   0. intra-increment exact dedup (crawls re-fetch; identical copies
  *      inside one batch are the cheapest duplication, collapsed first
  *      so later stages and the stores never see them),
  *   1. exact screen: anti-join on the content-fingerprint store
  *      ([[Dedup.dedupExactAgainst]] — one 16-byte-key join, history
  *      text untouched),
  *   2. near screen: LSH-banded MinHash screen against the signature
  *      store ([[Dedup.dedupIncrement]] — shingling cost proportional
  *      to the increment, never the corpus),
  *   3. quality gate: the standard pre-training heuristics
  *      ([[TextAnalysis.qualityPredicate]]), so junk never enters the
  *      corpus or the stores.
  *
  * Store lifecycle: both stores live under `storeDir` and are REPLACED
  * atomically-per-store each cycle — the updated frames are written to
  * `<store>.next` (the update plans READ the current store, so an
  * in-place overwrite would truncate its own input), then swapped in
  * via rename cur→`.old`, rename `.next`→cur, drop `.old` — the live
  * store always has an on-disk copy, and [[run]] restores a stranded
  * `.old` at startup, so no crash point loses a store. A cycle that
  * dies before its swaps leaves the previous stores intact and is
  * simply re-run; dying BETWEEN the two stores' swaps leaves a mixed
  * pair (new fingerprints, old signatures) — the re-run then
  * over-screens exact re-crawls of the last increment and
  * under-screens their near-dups, both resolved by the re-run
  * completing (no corruption, the `.next` dirs are rebuilt). The stores grow by survivor
  * rows only (one fingerprint / one k-slot signature per kept doc),
  * so their size tracks the deduplicated corpus, orders of magnitude
  * smaller than the text at 100 TB.
  *
  * Retention: every store row is stamped with the cycle it was
  * admitted in. With `ttlCycles > 0`, entries older than that many
  * admissions expire — they stop screening (their docs become
  * re-admissible, the deliberate re-crawl freshness policy) and are
  * dropped from the written store, which therefore stays bounded at
  * the last-`ttlCycles`-of-survivors size instead of growing forever.
  * Liveness-based compaction (drop entries whose docs were retired
  * from the corpus) is [[graft.ops.Dedup.compactStore]], run offline
  * between cycles.
  *
  * First cycle: no stores exist yet — empty frames derived from the
  * increment's own plan (`increment.limit(0)`) bootstrap the exact
  * schemas with no hand-maintained StructTypes, and every screen
  * degenerates to a no-op.
  */
object CrawlCycle {

  final case class Config(
      input: String,
      output: String,
      storeDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 16,
      bands: Int = 8,
      shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBucketSize: Int = 0,
      qualityGate: Boolean = true,
      ttlCycles: Int = 0)

  def fingerprintPath(cfg: Config): String = s"${cfg.storeDir}/fingerprints"
  def signaturePath(cfg: Config): String = s"${cfg.storeDir}/signatures"

  /** Run one cycle; returns the kept survivors as read back from
    * `cfg.output` (the on-disk result, not the lazy plan).
    */
  def run(spark: SparkSession, cfg: Config): DataFrame =
    runWithMetrics(spark, cfg)._1

  /** [[run]] plus per-stage row counts — captured with
    * `Dataset.observe`, so all four stage counts materialize during
    * the ONE output-write action: zero extra jobs, zero extra scans
    * (the audit a 100 TB pipeline can actually afford). Keys:
    * `increment_rows`, `after_intra`, `after_exact`, `kept` (the
    * near-screen + quality drops are the `after_exact − kept` gap;
    * splitting them would need a second action, deliberately not
    * paid here).
    */
  def runWithMetrics(spark: SparkSession, cfg: Config): (DataFrame, Map[String, Long]) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String): Boolean = {
      val hp = new Path(p); hp.getFileSystem(hconf).exists(hp)
    }

    val increment = spark.read.parquet(cfg.input)
    // Mid-swap crash recovery (graft.io.AtomicSwap): a run that died
    // between the swap's renames left cur missing and .old holding
    // the pre-cycle store — restore it; the interrupted cycle is
    // simply re-run.
    for (p <- Seq(fingerprintPath(cfg), signaturePath(cfg)))
      graft.io.AtomicSwap.recover(spark, p)
    // Every store row carries the cycle it was admitted in; stores
    // written before stamping existed read as cycle 0.
    def withCycle(df: DataFrame): DataFrame =
      if (df.columns.contains("cycle")) df
      else df.withColumn("cycle", lit(0))
    val fpStoreAll = withCycle(
      if (exists(fingerprintPath(cfg))) spark.read.parquet(fingerprintPath(cfg))
      else Dedup.exactFingerprintStore(increment.limit(0), cfg.textCol))
    val sigStoreAll = withCycle(
      if (exists(signaturePath(cfg))) spark.read.parquet(signaturePath(cfg))
      else Dedup.signatures(increment.limit(0), cfg.textCol, cfg.idCol,
        cfg.k, cfg.shingleN))
    // Current cycle = one past the newest admission. One tiny agg over
    // the (corpus-sized-not-text-sized) store; Row(null) on empty.
    val cycle: Int = Option(
      sigStoreAll.agg(max(col("cycle"))).head().get(0))
      .map(_.asInstanceOf[Int] + 1).getOrElse(0)
    // TTL retention: entries older than `ttlCycles` admissions stop
    // screening — their docs become re-admissible (deliberate re-crawl
    // freshness policy; 0 = keep forever). Filtered BEFORE the
    // screens, so expiry and re-admission happen in the same cycle.
    def retained(df: DataFrame): DataFrame =
      if (cfg.ttlCycles > 0) df.filter(col("cycle") > cycle - cfg.ttlCycles)
      else df
    val fpStore = retained(fpStoreAll)
    val sigStore = retained(sigStoreAll)

    // Unnamed Observations auto-generate unique names: a fixed name
    // collides at analysis when two cycles run in ONE session (the
    // plan-keyed persist registry can surface the previous cycle's
    // CollectMetrics node alongside the current one).
    val obsIn = org.apache.spark.sql.Observation()
    val obsIntra = org.apache.spark.sql.Observation()
    val obsExact = org.apache.spark.sql.Observation()
    val obsKept = org.apache.spark.sql.Observation()
    val intra = Dedup.dedupExact(
      increment.observe(obsIn, count(lit(1)).as("n")), cfg.textCol, cfg.idCol)
    val exactClean = Dedup.dedupExactAgainst(
      intra.observe(obsIntra, count(lit(1)).as("n")), cfg.textCol, fpStore)
      .observe(obsExact, count(lit(1)).as("n"))
    val nearClean = Dedup.dedupIncrement(
      exactClean, cfg.textCol, cfg.idCol, sigStore, cfg.idCol,
      cfg.k, cfg.bands, cfg.shingleN, cfg.threshold,
      maxBucketSize = cfg.maxBucketSize)
    val stats = TextAnalysis.stats(col(cfg.textCol)).toMap
    val kept =
      if (cfg.qualityGate)
        nearClean.filter(TextAnalysis.qualityPredicate(
          stats("n_tokens"), stats("alpha_ratio"), stats("avg_token_len")))
      else nearClean

    Sink.parquetWrite(kept.observe(obsKept, count(lit(1)).as("n")), cfg.output)
    // A zero-row write runs no tasks, so an observation can come back
    // as an empty map — that IS a count of 0.
    def n(o: org.apache.spark.sql.Observation): Long =
      o.get.get("n").map(_.asInstanceOf[Long]).getOrElse(0L)
    val metrics = Map(
      "increment_rows" -> n(obsIn),
      "after_intra" -> n(obsIntra),
      "after_exact" -> n(obsExact),
      "kept" -> n(obsKept))
    println("CRAWL_CYCLE " + metrics.map { case (k, v) => s"$k=$v" }.mkString(" "))
    // Store updates join against the MATERIALIZED survivors: the
    // screens above ran once for the output write; re-deriving kept
    // lazily here would run them all again per store.
    val keptOnDisk = spark.read.parquet(cfg.output)
    val keptIds = keptOnDisk.select(cfg.idCol)

    // Same (plan, params) as the persistOnce'd frame inside
    // dedupIncrement → cache hit: the increment is shingled exactly
    // once per cycle even though both the screen and the store update
    // need its signatures.
    val incSigs = CachedFrames.persistOnce(
      Dedup.signatures(exactClean, cfg.textCol, cfg.idCol, cfg.k, cfg.shingleN))
    // Next stores = retained history ∪ this cycle's survivors stamped
    // with the current cycle. Expired rows drop here for good — the
    // store stays bounded under TTL instead of growing forever.
    val nextSigStore = sigStore.select(col(cfg.idCol), col("sig"), col("cycle"))
      .union(incSigs.join(keptIds, Seq(cfg.idCol), "left_semi")
        .select(col(cfg.idCol), col("sig"), lit(cycle).as("cycle")))
    // Disjoint by construction: stage 0 collapses within-increment
    // copies, stage 1 anti-joins the store — no distinct needed.
    val nextFpStore = fpStore.select(col("fingerprint"), col("cycle"))
      .union(Dedup.exactFingerprintStore(keptOnDisk, cfg.textCol)
        .withColumn("cycle", lit(cycle)))

    val nextFp = fingerprintPath(cfg) + ".next"
    val nextSig = signaturePath(cfg) + ".next"
    nextFpStore.write.mode("overwrite").parquet(nextFp)
    nextSigStore.write.mode("overwrite").parquet(nextSig)
    // cur -> .old, .next -> cur, drop .old: the live store always has
    // at least one on-disk copy (a bare delete-then-rename would
    // destroy the store if the rename never ran, and the next cycle
    // would silently bootstrap EMPTY and re-admit all of history).
    graft.io.AtomicSwap.swapIn(spark, fingerprintPath(cfg), nextFp)
    graft.io.AtomicSwap.swapIn(spark, signaturePath(cfg), nextSig)
    (keptOnDisk, metrics)
  }
}
