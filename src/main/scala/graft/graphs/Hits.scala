package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS (Kleinberg 1999) hubs-and-authorities over a directed edge
  * list — the complement to [[PageRank]]: authority flows from
  * being pointed AT by good hubs, hub-ness from pointing at good
  * authorities. The natural fit is a bipartite supply graph
  * (supplier → part, crawler → page): hubs rank the left side,
  * authorities the right.
  *
  * Integer e6 grid, max-normalized per half-step (the standard HITS
  * normalization, on integers: s'' = s'·1e6 div max(s') — the max is
  * a 1-row broadcast, never a driver collect). Every arithmetic step
  * is exact long math, so the SQL oracle unrolls iterations as CTEs
  * and hash-matches. Headroom bound: raw·1e6 must stay under 2^63 —
  * raw ≤ 1e6·maxdeg ⇒ maxdeg ≤ ~9·10⁶; salt-split hotter nodes (the
  * [[PageRank]] hub caveat) above that.
  *
  * Scale shape mirrors PageRank: the edge list is checkpointed once;
  * each half-step is one keyed join + keyed sum + 1-row max
  * broadcast; rank tables are node-sized, UNHINTED. */
object Hits {

  private def normalize(raw: DataFrame, outCol: String): DataFrame = {
    val mx = raw.agg(max(col("raw")).as("mx"))
    raw.crossJoin(broadcast(mx))
      .select(col("node"), expr("raw * 1000000 div mx").as(outCol))
  }

  /** @return one row per node touched by its side:
    *         (kind ∈ {hub, authority}, node, score_e6) */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 32, "iters in [1, 32]")
    // Packed adjacency in BOTH directions (the [[PageRank.pageRank]]
    // lesson — same hub caveat): each half-step joins a node-sized
    // score table against a node-sized packed row and explodes in
    // projection, instead of re-shuffling the edge table per step.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    val adjF = e.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("dsts")).localCheckpoint()
    val adjR = e.groupBy(col("dst"))
      .agg(collect_list(col("src")).as("srcs")).localCheckpoint()
    var hubs = adjF.select(col("src").as("node"), lit(1000000L).as("h"))
    var auths: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = adjF
        .join(hubs.select(col("node").as("src"), col("h")), Seq("src"))
        .select(explode(col("dsts")).as("node"), col("h"))
        .groupBy(col("node")).agg(sum(col("h")).as("raw"))
      auths = normalize(aRaw, "a").localCheckpoint()
      val hRaw = adjR
        .join(auths.select(col("node").as("dst"), col("a")), Seq("dst"))
        .select(explode(col("srcs")).as("node"), col("a"))
        .groupBy(col("node")).agg(sum(col("a")).as("raw"))
      hubs = normalize(hRaw, "h").localCheckpoint()
    }
    hubs.select(lit("hub").as("kind"), col("node"), col("h").as("score_e6"))
      .unionByName(auths.select(lit("authority").as("kind"), col("node"),
        col("a").as("score_e6")))
  }
}
