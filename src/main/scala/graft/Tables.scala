package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Harness-table access for the driver testdata
  * (`/root/testdata/sf*`; see TESTDATA.md).
  *
  * Scale notes: every loader is a plain parquet scan, so Catalyst
  * pushes filters/projections into the file source; at cluster scale
  * the same loaders work on a directory of many files. `events.ts`
  * has shipped as both parquet TIMESTAMP(NANOS) (read as raw nanos
  * via `spark.sql.legacy.parquet.nanosAsLong`) and native
  * timestamp[us]; `events` branches on the footer schema so either
  * vintage yields TIMESTAMP_NTZ micros.
  */
object Tables {

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Footer-schema memo, keyed by table path. A bare `read.parquet`
    * runs a one-task footer-inference job on EVERY call — ~600 such
    * jobs per 200-query bench run (each query loads 1-3 tables, twice
    * over two passes), pure per-query overhead (r21, guide §6). A
    * catalog-table scan (the S2 operator this loader stands in for)
    * resolves the schema from the metastore instead of the footer;
    * this memo is that catalog metadata — static per file, never a
    * query result. Keyed by full path so different SF dirs (and the
    * two events vintages) coexist.
    *
    * ASSUMES the file at a path is immutable for the JVM's lifetime
    * (true for the read-only testdata trees this loader serves; the
    * same assumption a metastore makes until a DDL invalidates it). A
    * test or long-lived driver that REWRITES a parquet file in place
    * must call [[clearSchemaCache]] first, or the stale memo reads
    * missing columns as nulls instead of erroring (ADVICE r21).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Drop every memoized footer schema — the invalidation hook for
    * callers that rewrite a table path within one JVM.
    */
  def clearSchemaCache(): Unit = schemaCache.clear()

  /** Plain parquet table scan (S2 analogue of catalog-table scan). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val p = path(sfDir, name)
    val schema = schemaCache.computeIfAbsent(p, _ => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(p)
  }

  /** `events` with `ts` normalized to TIMESTAMP_NTZ microseconds,
    * adapting to how the parquet file encodes the column:
    *
    *  - `LongType`: raw TIMESTAMP(NANOS) read via
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (older testdata).
    *    `ts div 1000` is integral (floor) division — identical to the
    *    DuckDB oracle's nanos→micros truncation, and safe for ~1.7e18
    *    nanosecond epoch values (fits in Long; a double division would
    *    lose precision past 2^53).
    *  - `TimestampNTZType`: native timestamp[us] (current testdata) —
    *    pass through unchanged.
    *  - `TimestampType`: session-zoned micros — cast to NTZ so every
    *    downstream consumer sees one type regardless of file vintage.
    *
    * The branch reads only the file footer schema (cheap; no data
    * scan). This loader deliberately does not mutate session conf:
    * a conf write here would silently affect every other parquet read
    * on the session and race concurrent queries.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"))
      case TimestampNTZType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampNTZType))
    }
  }

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
