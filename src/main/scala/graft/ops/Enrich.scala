package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** "One Big Table" star-schema enrichment (J1 + P4).
  *
  * Reproduces the reference's enrich stage
  * (`/root/reference/yelp_etl/pipeline/enrich.py:44-61`): for each
  * dimension, alias every dim column with an `{entityType}_` prefix,
  * inner-join the fact on `fact(key) === dim(s"${entityType}_$key")`,
  * then drop the duplicated prefixed key.
  *
  * Scale design: the reference gets shuffle-free joins from Iceberg
  * bucket layouts + storage-partitioned-join configs
  * (`enrich.py:35-43` — see [[Enrich.spjConfigs]]). Without a V2
  * catalog we rely on (a) `broadcast()` for dimensions that fit in
  * executor memory — in the Yelp schema both dims (business ~150K,
  * user ~2M rows) broadcast comfortably, turning the whole OBT build
  * into a zero-shuffle map-side pipeline — and (b) AQE's
  * sort-merge→broadcast conversion + skew-join splitting otherwise.
  */
object Enrich {

  /** One dimension to pre-join: entity type (drives the column prefix
    * and join key), frame, join key name, and whether to broadcast.
    */
  final case class Dim(
      entityType: String,
      df: DataFrame,
      joinKey: String,
      broadcastHint: Boolean = true)

  /** The reference's per-entity join-key rule (`enrich.py:53-55`):
    * `user` dims join on user_id, everything else on business_id. */
  def yelpJoinKey(entityType: String): String =
    if (entityType == "user") "user_id" else "business_id"

  /** Prefix every column of `dim` with `{entityType}_` (P4,
    * `enrich.py:50-52`). */
  def prefixColumns(entityType: String, dim: DataFrame): DataFrame =
    dim.select(dim.columns.toSeq.map(c => col(c).as(s"${entityType}_$c")): _*)

  /** Iteratively join `fact` to every dimension, OBT-style. */
  def oneBigTable(fact: DataFrame, dims: Seq[Dim]): DataFrame =
    dims.foldLeft(fact) { (acc, d) =>
      val prefixed = prefixColumns(d.entityType, d.df)
      val right = if (d.broadcastHint) broadcast(prefixed) else prefixed
      val prefixedKey = s"${d.entityType}_${d.joinKey}"
      acc.join(right, acc(d.joinKey) === right(prefixedKey), "inner")
        .drop(prefixedKey)
    }

  /** The session configs the reference sets for shuffle-free joins
    * over bucketed V2 tables (`enrich.py:35-43`). No-ops without a V2
    * catalog but kept as the documented scale path: with Iceberg
    * bucket(N, key) layouts on both sides these make J1 zero-shuffle.
    */
  def spjConfigs: Map[String, String] = Map(
    "spark.sql.bucketing.coalesceBucketsInJoin.enabled" -> "true",
    "spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true",
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true")
}
