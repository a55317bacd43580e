package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over relational edge lists — the sibling of
  * [[Dedup.connectedComponents]] for WEIGHTED importance rather than
  * membership. A curation pipeline ranks hosts/domains by link
  * authority (the Common-Crawl-style quality prior) with exactly this
  * shape: edges as rows, iterations as joins, no graph library.
  *
  * 100 TB design: each PageRank iteration is one equi-join (edges ⋈
  * ranks on src) + one map-side-combined sum by dst + one left join
  * back to the node set — all key-partitioned shuffles with no
  * driver-side state beyond the fixed iteration counter.
  * `localCheckpoint` after each iteration truncates lineage so
  * iteration N plans O(1) work, not O(N) (the
  * [[Dedup.connectedComponents]] lesson). Edges and out-degrees
  * persist once for the whole loop.
  */
object Graph {

  /** Fixed-iteration PageRank: `(node, rank)` after `iterations`
    * synchronous updates of
    *
    *   `rank(v) = (1 − damping)/N + damping · Σ_{u→v} rank(u)/outdeg(u)`
    *
    * starting from `rank = 1/N`. Deterministic, engine-replayable: no
    * convergence test, no RNG, and dangling mass is NOT redistributed
    * (a dangling node's rank simply leaks — callers wanting the
    * stochastic-matrix variant add reverse edges or a sink node to the
    * edge list, which composes with this operator unchanged).
    *
    * N rides as a 1-row broadcast cross join (the [[TfIdf]] corpus-
    * scalar pattern) — no driver collect anywhere in the loop.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, s"damping must be in (0, 1): $damping")
    val e = graft.CachedFrames.persistOnce(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct())
    val nodes = graft.CachedFrames.persistOnce(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node")))
        .distinct())
    val outDeg = graft.CachedFrames.persistOnce(
      e.groupBy(col("src").as("node")).agg(count(lit(1)).as("__deg")))
    val n1 = nodes.agg(count(lit(1)).cast("double").as("__n"))
    var ranks = nodes.crossJoin(n1)
      .select(col("node"), (lit(1.0) / col("__n")).as("rank"))
      .localCheckpoint()
    for (_ <- 1 to iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg.withColumnRenamed("node", "src"), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") / col("__deg")).as("__in"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(n1)
        .select(
          col("node"),
          (lit(1.0 - damping) / col("__n") +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
