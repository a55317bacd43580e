package graft.ops

/** Shared convention for the skew-cap audit frames.
  *
  * Several operators bound a quadratic blow-up with a size cap and
  * expose a companion audit of what the cap excludes:
  *
  *   - [[Dedup.oversizedBuckets]] ↔ `maxBucketSize` in
  *     [[Dedup.candidatePairs]] / the `*Against` incremental screens
  *     (LSH buckets: B docs → B² candidate pairs),
  *   - [[Similarity.oversizedClusters]] ↔ `maxClusterSize` in
  *     [[Similarity.semanticDedupPairs]] (k-means clusters: C vectors
  *     → C² cosine pairs),
  *   - [[Joins.oversizedIntervals]] ↔ `maxBinsPerInterval` in
  *     [[Joins.pointInIntervalJoin]] (an interval spanning N bins
  *     replicates N times).
  *
  * Convention, pinned by `OversizedAuditSpec`:
  *
  *   1. the audit returns the group's key column(s) plus ONE count
  *      column named [[Audit.GroupSizeCol]] — always the exact
  *      quantity the paired cap compares against;
  *   2. only groups STRICTLY above the cap appear (the audit is the
  *      precise complement: with the same cap, the capped operator
  *      processes every group the audit omits and none it reports);
  *   3. cap = 0 disables capping in the operator, so `audit(…, 0)`
  *      lists every nonempty group — a size census, same shape.
  *
  * The audits cost one map-side-combined count over the keyed frame —
  * never the quadratic term they guard — so running them every
  * pipeline cycle is cheap insurance: a sudden hot bucket/cluster/
  * interval shows up in the audit before it shows up as a straggler.
  */
object Audit {
  /** Uniform name of the size column in every `oversized*` audit. */
  val GroupSizeCol = "group_size"
}
