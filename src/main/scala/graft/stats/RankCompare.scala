package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked-list agreement — rank-biased overlap (Webber, Moffat &
  * Zobel 2010), the standard "do two rankings agree, weighted toward
  * the top" score: RBO@D = Σ_{d=1..D} (1−p)·p^{d−1}·(o_d/d), where
  * o_d is the overlap of the two top-d prefixes and p the
  * top-weightedness (here the classic p = 9/10). Kendall-style
  * whole-permutation distances treat position 1 and position 1000
  * alike; search/curation ranking comparisons need the top-heavy
  * view.
  *
  * Exactness: with p = 9/10, (1−p)·p^{d−1} = 9^{d−1}/10^d — every
  * per-depth term is the exact rational 9^{d−1}·o_d·10⁶ div (10^d·d),
  * quantized by ONE truncating division per depth BEFORE the sum
  * (the ANOVA per-group-rounding rule), in decimal(38) (9¹⁹·20·10⁶ ≈
  * 3·10²⁵ at D = 20). A SQL oracle replays every term. */
object RankCompare {

  /** RBO@D between two rankings of the same items per group.
    *
    * @param ranks (group, posA, posB) rows — one row per item
    *              holding its 1-based position in each ranking;
    *              items outside a ranking's top D simply carry a
    *              larger position (or are absent — absent rows
    *              contribute to no prefix)
    * @param depth D (≤ 30: 9²⁹·10⁶ is the decimal(38) comfort bound)
    * @return per group: (group, depth, n_common, rbo_e6) — n_common
    *         the items inside BOTH top-D prefixes */
  def rbo(ranks: DataFrame, groupCol: String, posACol: String,
          posBCol: String, depth: Int = 20): DataFrame = {
    require(depth >= 1 && depth <= 30, "depth in [1, 30]")
    val spark = ranks.sparkSession
    // m = the first depth at which the item is inside both prefixes
    val m = ranks
      .select(col(groupCol).as("grp"),
        greatest(col(posACol).cast("long"), col(posBCol).cast("long"))
          .as("m"))
      .where(col("m") <= depth.toLong)
      .groupBy(col("grp"), col("m")).agg(count(lit(1)).as("c"))
    // per-depth overlap o_d = Σ_{m ≤ d} c — the depth dimension is a
    // D-row broadcast frame carrying 9^{d−1} and 10^d as EXACT
    // decimal literals (double power() goes inexact past 9¹⁶)
    import spark.implicits._
    val depths = (1 to depth).map(d =>
        (d.toLong, BigInt(9).pow(d - 1).toString,
         BigInt(10).pow(d).toString))
      .toDF("d", "p9s", "p10s")
      .select(col("d"), col("p9s").cast("decimal(38,0)").as("p9"),
        col("p10s").cast("decimal(38,0)").as("p10"))
    val terms = m.join(broadcast(depths), col("m") <= col("d"))
      .groupBy(col("grp"), col("d")).agg(sum(col("c")).as("o_d"),
        first(col("p9")).as("p9"), first(col("p10")).as("p10"))
      .withColumn("term_e6", expr(
        "CAST(p9 * o_d * 1000000 div (p10 * d) AS BIGINT)"))
    val agg = terms.groupBy(col("grp"))
      .agg(max(when(col("d") === depth.toLong, col("o_d")))
             .as("n_common"),
           sum(col("term_e6")).as("rbo_e6"))
    // groups whose prefixes share nothing still get a (0, 0) row
    ranks.select(col(groupCol).as("grp")).distinct()
      .join(agg, Seq("grp"), "left")
      .select(col("grp").as(groupCol), lit(depth.toLong).as("depth"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("rbo_e6"), lit(0L)).as("rbo_e6"))
  }

  /** Normalized Kendall tau distance between two rankings' shared
    * top-D items per group — the UNWEIGHTED companion to [[rbo]]:
    * RBO asks "do the tops agree"; tau distance asks "of the items
    * both rankings kept, how many pairs do they ORDER differently"
    * — discordant pairs / C(m, 2) over the m items inside both
    * top-D prefixes (Kendall 1938's distance form; 0 = identical
    * order, 10⁶ = exactly reversed).
    *
    * Exact: the pair scan is the D²-bounded self-join of the common
    * prefix (config-bounded — never corpus rows), discordance an
    * integer count, the normalization one truncating e6 division.
    * Positions inside a ranking are distinct by construction
    * (row_number upstream), so there are no ties to adjudicate.
    *
    * @param ranks (group, posA, posB) rows, 1-based positions
    * @param depth D
    * @return per group: (group, depth, n_common, n_discordant,
    *         tau_dist_e6) — null distance when m &lt; 2 */
  def kendallTauDistance(ranks: DataFrame, groupCol: String,
                         posACol: String, posBCol: String,
                         depth: Int = 20): DataFrame = {
    require(depth >= 1, "depth >= 1")
    val common = ranks
      .select(col(groupCol).as("grp"),
        col(posACol).cast("long").as("pa"),
        col(posBCol).cast("long").as("pb"))
      .where(col("pa") <= depth.toLong && col("pb") <= depth.toLong)
    val pairs = common.as("x")
      .join(common.as("y"),
        col("x.grp") === col("y.grp") && col("x.pa") < col("y.pa"))
      .groupBy(col("x.grp").as("grp"))
      .agg(count(lit(1)).as("n_pairs"),
           sum(when(col("x.pb") > col("y.pb"), 1L).otherwise(0L))
             .as("n_discordant"))
    val m = common.groupBy(col("grp")).agg(count(lit(1)).as("n_common"))
    ranks.select(col(groupCol).as("grp")).distinct()
      .join(m, Seq("grp"), "left")
      .join(pairs, Seq("grp"), "left")
      .select(col("grp").as(groupCol), lit(depth.toLong).as("depth"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        coalesce(col("n_discordant"), lit(0L)).as("n_discordant"),
        when(coalesce(col("n_common"), lit(0L)) < 2L,
          lit(null).cast("long"))
          .otherwise(expr(
            "n_discordant * 1000000 div (n_common * (n_common - 1) div 2)"))
          .as("tau_dist_e6"))
  }
}
