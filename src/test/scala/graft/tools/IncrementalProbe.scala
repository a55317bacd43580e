package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Dev probe for X48's scale claim: screening a new increment against
  * a persisted signature store must cost ~the increment, not the
  * corpus. On a replicated documents corpus (default /tmp/sf_x10,
  * 5,000 docs) it splits history/increment 90/10 and times:
  *
  *   A. store route — signatures(history) written to parquet once
  *      (amortized across every future increment), then
  *      nearDupPairsAgainst(increment, store);
  *   B. naive route — nearDupPairs over history ∪ increment
  *      (re-shingles everything each cycle), filtered to cross pairs.
  *
  * Both routes must produce the IDENTICAL cross-pair set (A's band
  * join over stored arrays vs B's same-corpus buckets), which the
  * probe asserts before printing timings. CachedFrames is flushed
  * between timed sections so neither route rides the other's caches.
  *
  * Run: `sbt "Test/runMain graft.tools.IncrementalProbe [dir]"`.
  */
object IncrementalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf_x10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val split = docs.filter(col("doc_id") <= maxId)
      .stat.approxQuantile("doc_id", Array(0.9), 0.001)(0).toLong
    val history = docs.filter(col("doc_id") < split)
    val increment = docs.filter(col("doc_id") >= split)
    val (nHist, nInc) = (history.count(), increment.count())
    println(s"[probe] corpus=$dir history=$nHist increment=$nInc split=$split")

    def timed[T](label: String)(f: => T): T = {
      graft.CachedFrames.unpersistAll()
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // one-time store build + write (amortized over future increments)
    val storeDir = java.nio.file.Files.createTempDirectory("sigstore").toString
    timed("store build+write (one-time)") {
      Dedup.signatures(history, "text", "doc_id")
        .write.mode("overwrite").parquet(storeDir)
    }

    val store = spark.read.parquet(storeDir)
    // two rounds: round 1 pays JIT/codegen warm-up for whichever route
    // runs first; round 2 is the steady-state comparison
    for (round <- 1 to 2) {
      val storePairs = timed(s"A$round: screen increment vs store") {
        Dedup.nearDupPairsAgainst(increment, "text", "doc_id", store, "doc_id",
            threshold = 0.5)
          .select(col("old_id"), col("new_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }

      val naivePairs = timed(s"B$round: naive re-shingle history+increment") {
        Dedup.nearDupPairs(docs, "text", "doc_id", threshold = 0.5)
          .filter(col("a") < split && col("b") >= split)
          .select(col("a"), col("b"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }

      assert(storePairs == naivePairs,
        s"route mismatch: onlyA=${(storePairs -- naivePairs).take(5)} " +
          s"onlyB=${(naivePairs -- storePairs).take(5)}")
      println(s"[probe] round $round: routes agree on ${storePairs.size} cross pairs")
    }
    spark.stop()
  }
}
