package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list — the canonical iterative
  * graph centrality a curation pipeline uses to weight sources or
  * items by link authority (the quality prior web-scale corpus
  * filtering derives from the hyperlink graph).
  *
  * Integer micro-grid form (the repo's oracle-parity idiom): ranks
  * live on an e6 grid, each node starts at 1.0 (1,000,000), and one
  * iteration is
  *   r'(v) = 150000 + (85 · Σ_{u→v} (r(u) div outdeg(u))) div 100
  * — exact long arithmetic with truncating `div` at every step, so a
  * SQL oracle can unroll the iterations as CTEs and hash-match
  * bit-for-bit. The usual damping d = 0.85 with per-node teleport
  * mass 0.15 (total mass ≈ n, the "rank 1 per page" convention).
  *
  * Scale shape: one keyed outdegree aggregate, then per iteration one
  * keyed join (edges ⋈ ranks on src — rank and degree tables are
  * node-keyed, UNHINTED: node count is corpus-sized, never broadcast)
  * and one keyed sum by dst. Lineage is cut with `localCheckpoint`
  * each iteration (the [[graft.pipeline.Bpe]] contract) so the plan
  * stays iteration-count-free. Nodes without in-edges keep the bare
  * teleport mass via the left join. Dangling nodes (no OUT-edges)
  * leak their mass — the standard simplification; symmetrize the
  * edge list (as the co-occurrence builder does) when the graph must
  * be dangling-free. */
object PageRank {

  /** @param edges directed edge list; duplicate edges count once
    *              per row (pre-`distinct` them for an unweighted walk)
    * @param iters fixed iteration count (power iterations)
    * @return (node, rank_e6, outdeg) — outdeg 0 rows never occur for
    *         symmetrized inputs */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val degreed = nodes.join(outdeg, Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint()
    var ranks = degreed.select(col("node"), lit(1000000L).as("rank_e6"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.join(outdeg, Seq("node"))
                .select(col("node").as("src"),
                        expr("rank_e6 div outdeg").as("share")),
              Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("share")).as("in_share"))
      ranks = degreed.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(in_share, 0) div 100"))
            .as("rank_e6"))
        .localCheckpoint()
    }
    ranks.join(degreed, Seq("node"))
      .select(col("node"), col("rank_e6"), col("outdeg"))
  }

  /** Undirected co-occurrence edges from (group, item) membership:
    * every ordered pair of DISTINCT items sharing a group, deduped
    * across groups. The self-join is keyed by group — candidate
    * volume is Σ_g |g|² , bounded by the group-size cap the caller
    * enforces upstream (basket-sized groups, not corpus-sized). */
  def coOccurrenceEdges(membership: DataFrame, groupCol: String,
                        itemCol: String): DataFrame = {
    val m = membership.select(col(groupCol).as("g"), col(itemCol).as("item"))
      .distinct()
    m.select(col("g"), col("item").as("src"))
      .join(m.select(col("g"), col("item").as("dst")), Seq("g"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
  }
}
