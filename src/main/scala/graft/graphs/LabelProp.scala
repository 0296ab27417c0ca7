package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (LPA) over an undirected edge list —
  * the near-linear community detector curation pipelines run when
  * modularity scoring ([[Modularity]]) needs a partition to score:
  * every node starts in its own community (label = node id) and each
  * round adopts the most frequent label among its neighbors.
  *
  * Deterministic fixed-round form (the [[PageRank]]/[[KCore]]
  * oracle-parity idiom): exactly `rounds` SYNCHRONOUS rounds — all
  * nodes update from the same previous-round labels — with the
  * tie rule (count DESC, label ASC), so a SQL oracle unrolls the
  * rounds as CTEs and hash-matches bit-for-bit. (Classic LPA
  * randomizes update order precisely to break label oscillation on
  * bipartite-ish structure; the fixed-round synchronous form trades
  * that for replayability — callers wanting convergence run more
  * rounds and check the label histogram stabilizes.)
  *
  * Scale shape: per round ONE keyed join (edges ⋈ labels on src — both
  * node/edge-keyed, UNHINTED), one (dst, label) count aggregate, and
  * one per-node argmax via `max_by` (keyed aggregate, no window);
  * lineage cut per round with `localCheckpoint`. Isolated nodes keep
  * their own label through the left join. */
object LabelProp {

  /** @param edges undirected edge list (symmetrized + deduped
    *              internally, self-loops dropped); node ids must be
    *              non-negative longs (the argmax negates labels)
    * @return (node, label) after `rounds` synchronous rounds */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "rounds in [1, 64]")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
              greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    val nodes = e.select(col("u").as("node")).distinct().localCheckpoint()
    var labels = nodes.select(col("node"), col("node").cast("long").as("label"))
    for (_ <- 1 to rounds) {
      val votes = e
        .join(labels.select(col("node").as("u"), col("label")), Seq("u"))
        .groupBy(col("v").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // (count DESC, label ASC) argmax: max over (cnt, -label)
      val next = votes.groupBy(col("node"))
        .agg(max_by(col("label"), struct(col("cnt"), -col("label")))
               .as("label"))
      labels = nodes
        .join(next, Seq("node"), "left")
        .select(col("node"),
                coalesce(col("label"), col("node").cast("long")).as("label"))
        .localCheckpoint()
    }
    labels
  }
}
