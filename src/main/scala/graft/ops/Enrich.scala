package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * `saltBuckets` > 0 selects the skew-salted shuffle join
    * ([[Skew.saltedJoin]]) for dimensions that are too large to
    * broadcast AND joined on a hot-keyed fact column (the case AQE's
    * post-shuffle skew split cannot always save: a single hot key
    * still lands in one map-side stream). Requires `factSaltSource`
    * on [[oneBigTable]]. The dim replicates `saltBuckets`-fold, so
    * keep it for genuinely skewed, non-broadcastable dims.
    */
  final case class Dim(
      entityType: String,
      df: DataFrame,
      joinKey: String,
      broadcastHint: Boolean = true,
      saltBuckets: Int = 0)

  /** The reference's per-entity join-key rule (`enrich.py:53-55`):
    * `user` dims join on user_id, everything else on business_id. */
  def yelpJoinKey(entityType: String): String =
    if (entityType == "user") "user_id" else "business_id"

  /** Prefix every column of `dim` with `{entityType}_` (P4,
    * `enrich.py:50-52`). */
  def prefixColumns(entityType: String, dim: DataFrame): DataFrame =
    dim.select(dim.columns.toSeq.map(c => col(c).as(s"${entityType}_$c")): _*)

  /** Iteratively join `fact` to every dimension, OBT-style.
    *
    * @param factSaltSource unique-ish fact column (e.g. its primary
    *   key) that seeds the deterministic salt for any dim with
    *   `saltBuckets` > 0 — salting the JOIN KEY itself would re-pile
    *   every copy of a hot key into one bucket.
    */
  def oneBigTable(
      fact: DataFrame,
      dims: Seq[Dim],
      factSaltSource: Option[Column] = None): DataFrame =
    dims.foldLeft(fact) { (acc, d) =>
      val prefixed = prefixColumns(d.entityType, d.df)
      val prefixedKey = s"${d.entityType}_${d.joinKey}"
      if (d.saltBuckets > 0) {
        val src = factSaltSource.getOrElse(sys.error(
          s"dim ${d.entityType} requests a salted join; pass factSaltSource"))
        // same-name key on both sides for the (key, salt) equi-join;
        // the merged join output keeps one key column, like the
        // drop(prefixedKey) below
        val dimForJoin = prefixed.withColumnRenamed(prefixedKey, d.joinKey)
        Skew.saltedJoin(acc, dimForJoin, d.joinKey, d.saltBuckets, src)
      } else {
        val right = if (d.broadcastHint) broadcast(prefixed) else prefixed
        acc.join(right, acc(d.joinKey) === right(prefixedKey), "inner")
          .drop(prefixedKey)
      }
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
