package graft

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the shipped deployment artifact honest: `conf/
  * spark-defaults.conf` must stay parseable, carry the load-bearing
  * keys, and agree with the in-code SPJ config list — a drifted conf
  * (renamed key, stale value) fails the build instead of a
  * deployment.
  */
class DeployConfSpec extends AnyFunSuite {

  private lazy val entries: Map[String, String] = {
    val lines = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("conf/spark-defaults.conf")),
      java.nio.charset.StandardCharsets.UTF_8).linesIterator
    lines
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val cut = l.indexWhere(_.isWhitespace)
        assert(cut > 0, s"not a 'key value' conf line: $l")
        (l.substring(0, cut), l.substring(cut).trim)
      }
      .toMap
  }

  test("every uncommented line is a well-formed spark.* key with a value") {
    entries.foreach { case (k, v) =>
      assert(k.startsWith("spark."), s"non-spark key: $k")
      assert(k.matches("[A-Za-z0-9.]+"), s"malformed key: $k")
      assert(v.nonEmpty, s"valueless key: $k")
    }
    assert(entries.nonEmpty)
  }

  test("SPJ keys mirror Enrich.spjConfigs exactly (the KEEP IN SYNC contract)") {
    ops.Enrich.spjConfigs.foreach { case (k, v) =>
      assert(entries.get(k).contains(v), s"conf drifted from spjConfigs at $k")
    }
  }

  test("runtime keys: Kryo serializer resolves on this classpath; G1GC on both JVMs") {
    val ser = entries("spark.serializer")
    Class.forName(ser) // throws if the conf names a missing class
    assert(entries("spark.driver.extraJavaOptions").contains("-XX:+UseG1GC"))
    assert(entries("spark.executor.extraJavaOptions").contains("-XX:+UseG1GC"))
  }

  test("AQE and the Iceberg catalog surface are declared") {
    assert(entries("spark.sql.adaptive.enabled") == "true")
    assert(entries("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(entries("spark.sql.extensions")
      .contains("IcebergSparkSessionExtensions"))
    assert(entries.contains("spark.sql.catalog.lake"))
    // defaultCatalog must stay a COMMENTED placeholder: uncommented it
    // hard-fails every unqualified table reference on a jar-less
    // cluster (the conf's own warning), breaking the parquet fallback
    assert(!entries.contains("spark.sql.defaultCatalog"),
      "defaultCatalog must not ship uncommented — it breaks jar-less deployments")
  }
}
