package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the shared `oversized*` audit convention documented on
  * [[Audit]]: one `group_size` column holding exactly the capped
  * quantity, only strictly-above-cap groups reported, and the audit
  * being the precise complement of its paired capped operator.
  */
class OversizedAuditSpec extends SparkSpec {
  import spark.implicits._

  private def sizeCol(df: DataFrame): Unit = {
    assert(df.columns.last == Audit.GroupSizeCol,
      s"audit must end with ${Audit.GroupSizeCol}, got ${df.columns.mkString(",")}")
  }

  // 12 copies of one boilerplate text (every band bucket size 12) and
  // two distinct singles.
  private lazy val docs = (
    (0L until 12L).map(_ -> "alpha beta gamma delta epsilon zeta eta theta") ++
      Seq(20L -> "one unrelated document about distributed joins entirely",
          21L -> "another unrelated document about partition pruning entirely")
    ).toDF("doc_id", "text")

  test("oversizedBuckets: group_size is the bucket row count; complement of the cap") {
    val bands = Dedup.lshBands(Dedup.signatures(docs, "text", "doc_id"), "doc_id")
    val audit = Dedup.oversizedBuckets(bands, 10)
    sizeCol(audit)
    val audited = audit.select("band", "band_hash", Audit.GroupSizeCol)
      .as[(Int, String, Long)].collect()
    assert(audited.nonEmpty && audited.forall(_._3 == 12L))
    // complement: pairs under the same cap touch no audited bucket —
    // the 12-copy clique contributes nothing, the singles don't pair
    assert(Dedup.nearDupPairs(docs, "text", "doc_id",
      threshold = 0.0, maxBucketSize = 10).count() == 0)
    // cap 0 = census: every nonempty bucket appears
    assert(Dedup.oversizedBuckets(bands, 0).count() ==
      bands.select("band", "band_hash").distinct().count())
    graft.CachedFrames.unpersistAll()
  }

  test("oversizedClusters: group_size is the cluster row count; complement of the cap") {
    val vecs = (
      (0L until 5L).map(i => (i, Seq(1f, 0f))) ++   // cluster 0, size 5
        Seq((10L, Seq(0f, 1f)), (11L, Seq(0f, 1f))) // cluster 1, size 2
      ).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1f, 0f), Seq(0f, 1f))
    val audit = Similarity.oversizedClusters(vecs, "vec_id", "embedding", centroids, 3)
    sizeCol(audit)
    assert(audit.as[(Int, Long)].collect().toSeq == Seq((0, 5L)))
    val capped = Similarity.semanticDedupPairs(
      vecs, "vec_id", "embedding", centroids, 0.99, maxClusterSize = 3)
    assert(capped.select("cluster").distinct().as[Int].collect().toSet == Set(1))
    graft.CachedFrames.unpersistAll()
  }

  test("oversizedIntervals: group_size is the bin span; complement of the cap") {
    val bin: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => floor(c / 10)
    val intervals = Seq(
      (1L, 0L, 9L),      // 1 bin
      (2L, 0L, 95L)      // 10 bins — oversized at cap 8
    ).toDF("iid", "lo", "hi")
    val audit = Joins.oversizedIntervals(intervals, "lo", "hi", bin, 8)
    sizeCol(audit)
    assert(audit.select("iid", Audit.GroupSizeCol)
      .as[(Long, Long)].collect().toSeq == Seq((2L, 10L)))
    val points = Seq(Tuple1(5L)).toDF("p")
    val joined = Joins.pointInIntervalJoin(
      points, "p", intervals, "lo", "hi", bin, maxBinsPerInterval = 8)
    assert(joined.select("iid").as[Long].collect().toSeq == Seq(1L))
  }
}
