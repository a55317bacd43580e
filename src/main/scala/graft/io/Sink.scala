package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioned / bucketed table sinks (S3 + S4).
  *
  * The reference writes every table with DataFrameWriterV2 to Iceberg
  * with an optional identity partition column and an optional
  * `bucket(n, col)` transform (`/root/reference/yelp_etl/common/
  * write.py:24-53`), committed atomically via `createOrReplace()`.
  *
  * Two sinks with one spec type:
  *   - [[icebergCreateOrReplace]] — the verbatim V2 path. Compiles
  *     against Spark core (`writeTo` is a core API); needs an Iceberg
  *     catalog at runtime. This is the 100 TB path: hidden
  *     partitioning gives partition pruning, the bucket transform
  *     gives storage-partitioned (shuffle-free) joins downstream.
  *   - [[parquetWrite]] — catalog-free fallback with the same
  *     *semantic* layout: `partitionBy(partitionCol)` for pruning and
  *     `repartition(buckets, bucketCol)` + sort-within-partitions for
  *     co-location (plain parquet has no metastore bucketing, so the
  *     bucket property is physical-only, not re-discoverable at read).
  */
object Sink {

  final case class PartitionSpec(
      partitionColumn: Option[String] = None,
      bucketColumn: Option[String] = None,
      buckets: Option[Int] = None)

  /** V2 writer transforms exactly as `create_partition_args`
    * (`write.py:36-53`) builds them: identity first, bucket second,
    * each optional.
    */
  def partitionTransforms(spec: PartitionSpec) =
    spec.partitionColumn.map(col).toSeq ++
      (for (c <- spec.bucketColumn; n <- spec.buckets)
        yield bucket(n, col(c))).toSeq

  /** Iceberg CTAS/RTAS (S3). `table` is a catalog name like
    * `lake.silver.yelp.business`. */
  def icebergCreateOrReplace(
      df: DataFrame,
      table: String,
      spec: PartitionSpec = PartitionSpec()): Unit = {
    val base = df.writeTo(table).using("iceberg")
      .option("write.object-storage.enabled", "true")
    val transforms = partitionTransforms(spec)
    val writer =
      if (transforms.isEmpty) base
      else base.partitionedBy(transforms.head, transforms.tail: _*)
    writer.createOrReplace()
  }

  /** Parquet-path fallback with equivalent layout semantics. */
  def parquetWrite(
      df: DataFrame,
      path: String,
      spec: PartitionSpec = PartitionSpec()): Unit = {
    val bucketed = (spec.bucketColumn, spec.buckets) match {
      case (Some(c), Some(n)) =>
        df.repartition(n, col(c)).sortWithinPartitions(col(c))
      case _ => df
    }
    val writer = bucketed.write.mode("overwrite")
    spec.partitionColumn
      .fold(writer)(p => writer.partitionBy(p))
      .parquet(path)
  }
}
