package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over an undirected edge
  * list — the "which items SHOULD be connected" scores a
  * recommendation pipeline ranks candidate pairs by, and a dedup
  * pipeline uses to propose merges the direct-evidence graph missed.
  * For every NON-adjacent pair (u, v) sharing at least `minCommon`
  * neighbors:
  *   - `cn`          common-neighbor count (exact),
  *   - `ra_e6`       Resource-Allocation index Σ_z 1e6 div deg(z)
  *                   (Zhou-Lü-Zhang) — each term one truncating
  *                   integer division, the sum exact, so the oracle
  *                   replays it bit-for-bit (RA is chosen over
  *                   Adamic-Adar's 1/ln deg precisely because it
  *                   needs no transcendental: engine-portable
  *                   integer arithmetic),
  *   - `jaccard_e6`  1e6·cn div (deg u + deg v − cn) (exact).
  *
  * Scale shape: the wedge join (edges ⋈ edges on the shared
  * neighbor z) is the [[Triangles]] cost, Σ_z deg(z)² — bounded on
  * support-thresholded graphs; hub-heavy graphs cap z's degree first
  * (the df-cap discipline). One keyed groupBy folds wedges to pairs,
  * an anti-join against the edge list removes already-connected
  * pairs, and two node-keyed joins attach degrees. No windows, no
  * broadcasts of corpus-sized tables. */
object LinkPredict {

  def resourceAllocation(edges: DataFrame, srcCol: String, dstCol: String,
                         minCommon: Long = 2L): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
              greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val e = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    // wedges through z: (z, u) x (z, v) with u < v; each z contributes
    // its RA weight once per pair it connects
    val wz = e.select(col("u").as("z"), col("v").as("n"))
      .join(deg.select(col("node").as("z"), col("deg").as("deg_z")), Seq("z"))
    val pairs = wz.select(col("z"), col("n").as("pu"), col("deg_z"))
      .join(wz.select(col("z"), col("n").as("pv")), Seq("z"))
      .filter(col("pu") < col("pv"))
      .groupBy(col("pu"), col("pv"))
      .agg(count(lit(1)).as("cn"),
           sum(expr("1000000 div deg_z")).as("ra_e6"))
      .filter(col("cn") >= minCommon)
    val open = pairs.join(
      und.select(col("a").as("pu"), col("b").as("pv")),
      Seq("pu", "pv"), "left_anti")
    open
      .join(deg.select(col("node").as("pu"), col("deg").as("deg_u")), Seq("pu"))
      .join(deg.select(col("node").as("pv"), col("deg").as("deg_v")), Seq("pv"))
      .select(col("pu").as("u"), col("pv").as("v"), col("cn"),
              col("ra_e6"), col("deg_u"), col("deg_v"),
              expr("cn * 1000000 div (deg_u + deg_v - cn)").as("jaccard_e6"))
  }

  /** Degree assortativity — the Pearson correlation of endpoint
    * degrees over the (symmetrized) edge list: positive means hubs
    * link to hubs (social-graph shape), negative means hubs link to
    * leaves (star/catalog shape) — the one-number diagnostic that
    * tells a sampler whether degree-stratified negatives are needed.
    * All five moment sums are exact longs over the directed-both-ways
    * edge rows (the standard Newman formula); only the final ratio is
    * a rounded double. One wedge-free pass: two node-keyed joins and
    * one global aggregate. */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
              greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val e = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint()
    val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val m = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .agg(count(lit(1)).as("m2"),
           sum(col("du")).as("s_u"), sum(col("dv")).as("s_v"),
           sum(col("du") * col("dv")).as("s_uv"),
           sum(col("du") * col("du")).as("s_uu"),
           sum(col("dv") * col("dv")).as("s_vv"))
    // moment sums stay exact longs; products are taken in DOUBLE
    // (m2·s_uv can exceed long range on big graphs) — IEEE ops in a
    // fixed expression shape, so the oracle's identical tree matches
    // bit-for-bit before the single round-6
    def d(c: String) = col(c).cast("double")
    m.select(col("m2"),
      round((d("m2") * d("s_uv") - d("s_u") * d("s_v")) /
            (sqrt(d("m2") * d("s_uu") - d("s_u") * d("s_u")) *
             sqrt(d("m2") * d("s_vv") - d("s_v") * d("s_v"))), 6)
        .as("assortativity"))
  }
}
