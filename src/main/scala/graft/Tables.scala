package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness-table access for the driver testdata
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Scale notes: every loader is a plain parquet scan, so Catalyst
  * pushes filters/projections into the file source; at cluster scale
  * the same loaders work on a directory of many files. `events.ts` is
  * parquet TIMESTAMP(NANOS), which Spark cannot read natively
  * (PARQUET_TYPE_ILLEGAL) — we read it as raw nanos via
  * `spark.sql.legacy.parquet.nanosAsLong` and floor-divide to
  * microseconds, which matches DuckDB's own nanos→micros truncation.
  */
object Tables {

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Plain parquet table scan (S2 analogue of catalog-table scan). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))

  /** `events` with `ts` repaired to TIMESTAMP_NTZ microseconds.
    * `ts div 1000` is integral (floor) division — identical to the
    * DuckDB oracle's nanos→micros truncation, and safe for the
    * ~1.7e18 nanosecond epoch values (fits in Long; a double division
    * would lose precision past 2^53).
    *
    * REQUIRES `spark.sql.legacy.parquet.nanosAsLong=true` on the
    * session (events.ts is parquet TIMESTAMP(NANOS), unreadable
    * natively) — set at session BUILD, as Verify/Bench/EntrySmoke and
    * the test harness do. This loader deliberately does not mutate
    * session conf: a conf write here would silently affect every
    * other parquet read on the session and race concurrent queries.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    load(spark, sfDir, "events")
      .withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
