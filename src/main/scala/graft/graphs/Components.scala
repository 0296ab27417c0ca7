package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the standalone
  * graph-tier form of the clustering the dedup pipeline does with
  * union-find over candidate pairs ([[graft.pipeline.TextDedup]]):
  * every node converges to the smallest node id reachable from it,
  * which becomes the component id.
  *
  * Fixed-round form (the [[KCore]]/[[PageRank]] oracle-parity
  * idiom): exactly `rounds` propagation steps, each ONE keyed join
  * (edges ⋈ labels) + one keyed min aggregate — everything node- or
  * edge-sized, nothing global. Labels shrink monotonically, so once
  * a round changes nothing the state is the true component map;
  * `rounds` must cover the component DIAMETER in label-hops (min
  * labels travel one hop per round). A production caller loops
  * until convergence on the same per-round plan (or switches to the
  * pointer-doubling variant when diameters are deep); the dedup
  * tier's adaptive union-find remains the right tool for
  * candidate-pair clustering. */
object Components {

  /** @param edges undirected edge list (symmetrized internally,
    *              self-loops irrelevant)
    * @return (node, component) — component = min reachable node id
    *         within `rounds` hops; isolated nodes absent (no edges,
    *         no row) */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 64, "rounds in [1, 64]")
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .distinct()
      .localCheckpoint()
    var labels = e.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("component"))
    for (_ <- 1 to rounds) {
      val fromNeighbors = e
        .join(labels.select(col("node").as("u"), col("component")), Seq("u"))
        .select(col("v").as("node"), col("component"))
      labels = labels.unionAll(fromNeighbors)
        .groupBy(col("node"))
        .agg(min(col("component")).as("component"))
        .localCheckpoint()
    }
    labels
  }
}
