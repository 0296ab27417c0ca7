package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a GIVEN partition of an undirected graph —
  * the score that tells you whether a community assignment (a label
  * propagation result, an attribute like brand/category, a dedup
  * cluster id) actually concentrates edges inside communities:
  * Q = Σ_c [ e_c/m − (d_c/2m)² ] where e_c counts intra-community
  * edges, d_c sums member degrees, m counts all edges. Scoring a
  * partition is the cheap, oracle-exact half of community detection
  * (the search half is iterative); pipelines use it to decide whether
  * an attribute is a real community structure worth sharding by.
  *
  * Everything is integer-exact until the last division: per-community
  * contributions ride the common denominator 4m², so
  * q_num_c = 4·m·e_c − d_c² is an exact long and Q = Σ q_num_c / 4m².
  * The plan is three keyed aggregates and two keyed joins (degree,
  * community restriction) — nothing corpus-global except the 1-row
  * edge count, which joins in by literal-free cross join. */
object Modularity {

  /** @param edges undirected edge list (symmetrized + deduped
    *              internally, self-loops dropped)
    * @param comm  (node, community) assignment; nodes absent from
    *              the map drop out of the graph
    * @return one row per community: (community, n_nodes, d_c, e_c,
    *         q_num, q_e6) where q_e6 = round(1e6 · q_num / 4m²) is
    *         the community's additive contribution to Q */
  def modularityByCommunity(edges: DataFrame, srcCol: String, dstCol: String,
                            comm: DataFrame, nodeCol: String,
                            commCol: String): DataFrame = {
    val cmap = comm.select(col(nodeCol).as("node"), col(commCol).as("c"))
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
              greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .join(cmap.select(col("node").as("a"), col("c").as("ca")), Seq("a"))
      .join(cmap.select(col("node").as("b"), col("c").as("cb")), Seq("b"))
    val m = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("a").as("node"), col("ca").as("c"))
      .unionAll(und.select(col("b").as("node"), col("cb").as("c")))
      .groupBy(col("node"), col("c")).agg(count(lit(1)).as("deg"))
    val dc = deg.groupBy(col("c"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("d_c"))
    val ec = und.filter(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(count(lit(1)).as("e_c"))
    dc.join(ec, Seq("c"), "left")
      .select(col("c"), col("n_nodes"), col("d_c"),
              coalesce(col("e_c"), lit(0L)).as("e_c"))
      .crossJoin(m)
      .withColumn("q_num",
        lit(4L) * col("m") * col("e_c") - col("d_c") * col("d_c"))
      .select(col("c").as(commCol), col("n_nodes"), col("d_c"), col("e_c"),
        col("q_num"),
        round(col("q_num").cast("double") / (lit(4.0) * col("m") * col("m"))
          * 1000000.0).cast("long").as("q_e6"))
  }
}
