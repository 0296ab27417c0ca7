package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling over an undirected edge list — the graph-density
  * filter that separates a cohesive core from its sparse periphery
  * (recommendation graphs keep the k-core as the trainable backbone;
  * fraud pipelines flag it as the collusion candidate set). A node is
  * in the k-core iff it survives repeated deletion of all nodes with
  * degree < k among the survivors.
  *
  * Fixed-round form (the repo's oracle-parity idiom, like
  * [[PageRank.pageRank]]'s fixed power iterations): exactly `peels`
  * deletion rounds, so a SQL oracle can unroll the rounds as CTEs and
  * hash-match bit-for-bit. Peeling is monotone — once a round deletes
  * nothing the state is the true k-core and further rounds are
  * no-ops — so `peels` only needs to cover the peel depth (rarely
  * more than a handful of rounds on real graphs; a production caller
  * that must guarantee convergence loops until `dropped.isEmpty`,
  * same per-round plan).
  *
  * Scale shape: per round ONE keyed degree aggregate over the
  * surviving edge list and two semi-joins to restrict edges to
  * survivors — everything node- or edge-keyed, nothing global,
  * nothing broadcast (both tables are corpus-sized). Lineage is cut
  * per round with `localCheckpoint` (the [[PageRank]] contract), and
  * the edge list SHRINKS monotonically, so late rounds are cheaper
  * than early ones. */
object KCore {

  /** Peel the graph `peels` times at threshold `k`.
    *
    * @param edges undirected edge list (symmetrized + deduped
    *              internally, self-loops dropped)
    * @return one row per node: (node, round_out, last_deg, in_core)
    *         where round_out is the 1-based round the node was
    *         deleted in (peels+1 for survivors), last_deg its degree
    *         at deletion time (for survivors: the degree RECOMPUTED
    *         after the final round's deletions, i.e. the true
    *         end-state degree — so a survivor whose last_deg < k
    *         tells the caller the peel depth undershot convergence),
    *         and in_core the survivor flag. */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, peels: Int): DataFrame = {
    require(k >= 1, "k >= 1")
    require(peels >= 1 && peels <= 64, "peels in [1, 64]")
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
              greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // directed both ways so degree is one keyed count by src
    var cur = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    var remaining = cur.select(col("u").as("node")).distinct()
    var out: DataFrame = null
    for (round <- 1 to peels) {
      // survivors with zero surviving edges vanish from the edge
      // list — the left join + coalesce keeps them at degree 0 so
      // they are deleted THIS round, not silently lost
      val deg = remaining
        .join(cur.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg")),
              Seq("node"), "left")
        .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
        .localCheckpoint()
      val dropped = deg.filter(col("deg") < k.toLong)
        .select(col("node"), lit(round.toLong).as("round_out"),
                col("deg").as("last_deg"), lit(0L).as("in_core"))
      out = if (out == null) dropped.localCheckpoint()
            else out.unionByName(dropped).localCheckpoint()
      remaining = deg.filter(col("deg") >= k.toLong).select(col("node"))
      val keep = remaining.select(col("node").as("u"))
      cur = cur.join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
    }
    // survivors' degree is RECOMPUTED over the post-final-round edge
    // list: last_deg is the true end-state degree, and last_deg < k
    // on any survivor is the caller-visible signal that `peels`
    // undershot the true peel depth (at convergence all survivors
    // show last_deg >= k)
    val core = remaining
      .join(cur.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg")),
            Seq("node"), "left")
      .select(col("node"), lit((peels + 1).toLong).as("round_out"),
              coalesce(col("deg"), lit(0L)).as("last_deg"),
              lit(1L).as("in_core"))
    out.unionByName(core)
  }
}
