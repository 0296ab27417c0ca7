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
    // The adjacency is materialized ONCE, PACKED BY SOURCE NODE:
    // (src, outdeg, dsts[]). An iteration is then a node-sized keyed
    // join (adjacency ⋈ ranks — both node-count rows), an explode
    // back to edge grain in pure PROJECTION (no shuffle), and one
    // keyed sum with map-side partial aggregation. The naive
    // edge-grain loop instead re-shuffles the full edge table every
    // iteration (the rank side's checkpointed size is unknown at
    // plan time, so Catalyst picks a sort-merge join) — measured
    // 16.5 s naive → 8.2 s edge-grain-checkpointed → 2.9 s packed,
    // at sf0.1 (2.39 M edges, 20 k nodes, 5 iterations).
    //
    // Hub caveat: a node's out-neighborhood is one array row. For
    // co-occurrence graphs degree is capped by basket structure; on
    // power-law web graphs split hub rows into bounded sub-rows
    // (salt the src) before packing — the update rule is additive,
    // so sub-row shares sum correctly.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val adj = e.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("dsts"),
           count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val degreed = nodes
      .join(adj.select(col("src").as("node"), col("outdeg")), Seq("node"), "left")
      .select(col("node"), coalesce(col("outdeg"), lit(0L)).as("outdeg"))
      .localCheckpoint()
    var ranks = degreed.select(col("node"), lit(1000000L).as("rank_e6"))
    for (_ <- 1 to iters) {
      val contribs = adj
        .join(ranks.select(col("node").as("src"), col("rank_e6")), Seq("src"))
        .select(explode(col("dsts")).as("node"),
                expr("rank_e6 div outdeg").as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).as("in_share"))
      ranks = degreed.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("85 * coalesce(in_share, 0) div 100"))
            .as("rank_e6"))
        .localCheckpoint()
      // per-iteration lineage cut: rank tables are node-count-sized,
      // so the materialization is cheap and each iteration runs as
      // its own AQE-planned job (measured faster than nesting the
      // whole chain into one lazy DAG)
    }
    ranks.join(degreed, Seq("node"))
      .select(col("node"), col("rank_e6"), col("outdeg"))
  }

  /** Multi-source BFS distances: hop distance from a seed set,
    * iterative frontier expansion — per round ONE keyed join
    * (edges ⋈ current frontier), a distinct, and an anti-join
    * against the settled set; every intermediate is node-sized, the
    * edge list is checkpointed once (the [[pageRank]] lesson).
    * Unreached nodes are absent (no sentinel rows). The classic
    * "blast radius" / taint-reach query over any relationship
    * graph. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
                   seeds: DataFrame, seedCol: String,
                   maxDepth: Int): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 64, "maxDepth in [1, 64]")
    // Packed adjacency (the [[pageRank]] lesson, same hub caveat):
    // per round the frontier join is NODE-sized, neighbor generation
    // is a pure explode projection — the naive edge-grain loop
    // re-shuffles the full edge table every round instead (measured
    // 4.6 s → 3.1 s warm on the q215 chain at sf0.1, 2.39 M edges).
    val adj = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .groupBy(col("src")).agg(collect_set(col("dst")).as("dsts"))
      .localCheckpoint()
    var dist = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    for (d <- 1 to maxDepth) {
      val frontier = dist.filter(col("dist") === (d - 1).toLong)
        .select(col("node").as("src"))
      val next = adj.join(frontier, Seq("src"))
        .select(explode(col("dsts")).as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(d.toLong))
      dist = dist.unionByName(next).localCheckpoint()
    }
    dist
  }

  /** Personalized PageRank: the random walk restarts at a SEED SET
    * instead of uniformly — the "related to these items" relevance
    * score (recsys similar-items, fraud seed expansion, taint
    * relevance ranking). Same packed-adjacency iteration shape as
    * [[pageRank]] (node-sized keyed join + projection explode +
    * keyed sum per iteration); the only change is the restart
    * vector: 1e6 div |S| on each seed present in the graph, 0
    * elsewhere, with r₀ = restart and
    * r_{k+1} = (15·restart) div 100 + (85·Σ in-shares) div 100 on
    * the exact e6 integer grid (integer div truncation is part of
    * the contract — the oracle replays it). The seed count joins in
    * as a 1-row frame (never collected). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           seeds: DataFrame, seedCol: String,
                           iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64, "iters in [1, 64]")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    val adj = e.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("dsts"), count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val seedNodes = seeds.select(col(seedCol).as("node")).distinct()
      .join(nodes, Seq("node"), "left_semi")
    val nSeeds = seedNodes.agg(count(lit(1)).as("n_seeds"))
    val restart = nodes
      .join(seedNodes.withColumn("is_seed", lit(1L)), Seq("node"), "left")
      .crossJoin(nSeeds)
      .select(col("node"),
        when(col("is_seed").isNotNull, expr("1000000 div n_seeds"))
          .otherwise(lit(0L)).as("restart_e6"))
      .localCheckpoint()
    var ranks = restart.select(col("node"), col("restart_e6").as("rank_e6"))
    for (_ <- 1 to iters) {
      val contribs = adj
        .join(ranks.select(col("node").as("src"), col("rank_e6")), Seq("src"))
        .select(explode(col("dsts")).as("node"),
                expr("rank_e6 div outdeg").as("share"))
        .groupBy(col("node"))
        .agg(sum(col("share")).as("in_share"))
      ranks = restart
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (expr("(15 * restart_e6) div 100") +
           expr("85 * coalesce(in_share, 0) div 100")).as("rank_e6"))
        .localCheckpoint()
    }
    ranks
  }

  /** Undirected co-occurrence edges from (group, item) membership:
    * every ordered pair of DISTINCT items sharing a group, deduped
    * across groups. The self-join is keyed by group — candidate
    * volume is Σ_g |g|² , bounded by the group-size cap the caller
    * enforces upstream (basket-sized groups, not corpus-sized). */
  def coOccurrenceEdges(membership: DataFrame, groupCol: String,
                        itemCol: String): DataFrame =
    membership.select(col(groupCol).as("g"), col(itemCol).as("item"))
      // collect each basket once and generate pairs in PROJECTION
      // (two lateral explodes): same |basket|² candidate volume as
      // the keyed self-join form, but one groupBy shuffle instead of
      // shuffling the membership table twice through a join —
      // measured 8.2 s → 5.3 s on the q192 chain at sf0.1.
      // collect_set is basket-bounded (the caller's cap), never
      // corpus-bounded.
      .groupBy(col("g")).agg(collect_set(col("item")).as("items"))
      .select(explode(col("items")).as("src"), col("items"))
      .select(col("src"), explode(col("items")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
      .distinct()
}
