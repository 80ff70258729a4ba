package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in exact integer micro-units — the host/domain
  * quality prior of a crawl-curation pipeline (pages on well-linked
  * hosts are upweighted before model-based scoring; the classic
  * Common-Crawl host-ranking signal).
  *
  * Arithmetic: ranks are BIGINT micros RELATIVE TO UNIFORM — 1e6 =
  * the uniform share, independent of N (a mass-normalized 1e6/N
  * encoding floors the teleport term to ZERO past a million nodes,
  * exactly the web-graph scale this operator advertises; the
  * per-node encoding stays integral at any N). Per edge, node u
  * sends `r_u · w_e div W_u` (W_u = u's total out-weight); the new
  * rank is `(150·1e6 + 850·Σ_in) div 1000` (d = 0.85 in milli).
  * Every step is integer multiply / floor-divide / order-independent
  * sum, so the ranks replay bit-for-bit in any engine — the floor
  * drops lose a few micros deterministically, where a float PR would
  * spread them as rounding noise. Headroom: 850·Σ_in overflows only
  * if one node drains ~10^16 micros of in-mass — 10 billion nodes'
  * ENTIRE rank pointed at one single node - beyond any real host graph.
  *
  * Scale shape: each iteration is two vocabulary-sized equi-joins
  * (edges ⋈ ranks on src — shuffles |edges| rows keyed by src — and a
  * dst-keyed hash agg);
  * the rank table is node-sized (no teleport broadcast needed — the
  * teleport term is a constant under the relative encoding).
  * Iterations chain lineage linearly —
  * callers running many iterations should checkpoint every few (the
  * x8 label-propagation pattern); the 3-iteration curation prior here
  * doesn't need it.
  */
object PageRank {

  /** @param edges (src, dst, w) weighted directed edges
    * @param nodes one row per node id (column `node`) — defines N and
    *              catches sink/isolated nodes
    * @return (node, rank_micro) after `iters` rounds */
  def pageRank(edges: DataFrame, nodes: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    // the edge table (and its out-weight aggregate) is consumed by
    // every iteration — persist both, or each round replays the
    // caller's whole edge-extraction lineage (audited: 6 window
    // passes over the source table for 3 rounds without the persist)
    val e = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy("src").agg(sum(col("w")).as("w_out"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank_micro"))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(outdeg, "src")
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("rank_micro * w div w_out").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          expr("(150000000L + 850 * coalesce(s, 0L)) div 1000").as("rank_micro"))
    }
    graft.Caching.releaseAfterFirstUse(ranks, e, outdeg)
  }
}
