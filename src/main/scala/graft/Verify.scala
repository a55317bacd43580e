package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [queryName ...]")
    val sfDir = args(0)
    val outDir = args(1)
    // Dev-only subset: extra args name the queries to run (fast local
    // iteration on a new oracle). The driver passes exactly two args,
    // so its full-suite runs — and the completeness gate below — are
    // untouched.
    val subset: Option[Set[String]] =
      if (args.length > 2) Some(args.drop(2).toSet) else None
    subset.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Steady-state JVM hygiene (periodic GC + codegen cache sizing)
    // shared with Bench/Main via [[SessionDefaults]] (r22).
    val spark = SessionDefaults.steadyState(SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        // Vintage compat: older testdata shipped events.ts as parquet
        // TIMESTAMP(NANOS) readable only as raw longs; current testdata
        // is native timestamp[us]. Tables.events branches on the footer
        // schema, and this conf keeps BOTH vintages loadable.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Coverage honesty (VERDICT r12 #3): a throwing query used to
    // produce *nothing* — no result dir, no entry in the driver's
    // report — so breakage read as a silently smaller all-green table
    // (77→65 in r11/r12). Now every failure leaves an explicit
    // `<name>.ERROR` marker next to the result dirs and the run exits
    // nonzero, so the round artifact goes red instead of shrinking.
    var written = 0
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    val selected = subset match {
      case Some(s) => SparkEntry.queries.filter { case (n, _) => s(n) }
      case None => SparkEntry.queries
    }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // A stale marker from a previous failed run in the same outDir
        // must not shadow this success.
        Files.deleteIfExists(Paths.get(s"$outDir/$name.ERROR"))
        written += 1
      } catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: $msg")
        failures(name) = msg
        scala.util.Try(Files.writeString(Paths.get(s"$outDir/$name.ERROR"), msg))
      }
    }
    // shared intermediate caches (dedup signatures/shingles) are
    // reused ACROSS queries above, then released here
    CachedFrames.unpersistAll()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (written < selected.size) {
      System.err.println(
        s"[verify] INCOMPLETE: $written/${selected.size} queries written; " +
          s"failed: ${failures.keys.mkString(", ")}")
      sys.exit(1)
    }
  }
}
