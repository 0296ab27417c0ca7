package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association rules over (basket, item) membership —
  * support / confidence / lift for co-occurring item pairs, the
  * market-basket form of the collocation mining the text tier does
  * with PMI ([[graft.pipeline.TextAnalysis]] q188). All statistics
  * are exact longs on the e6 grid, so the SQL oracle hash-matches.
  *
  * Scale shape: the pair generation is the [[PageRank
  * .coOccurrenceEdges]] keyed self-join (Σ|basket|², bounded by
  * basket size, never corpus size); supports are keyed aggregates;
  * the margins join back by item key, UNHINTED — item vocabularies
  * are corpus-sized (the lmSurprisal lesson). */
object Assoc {

  /** @param minSupport minimum co-basket count for a pair to surface
    * @return one row per unordered pair (a < b):
    *         (item_a, item_b, n_ab, n_a, n_b, n_baskets,
    *          conf_ab_e6 = P(b|a), conf_ba_e6 = P(a|b),
    *          lift_e6 = (conf_ab_e6 · N) div n_b) */
  def pairRules(membership: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1)
    val m = membership.select(col(basketCol).as("g"), col(itemCol).as("item"))
      .distinct()
    // 1-row frame, broadcast — never a driver-side count
    val nB = m.agg(countDistinct(col("g")).as("n_baskets"))
    val itemSup = m.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val pairs = m.select(col("g"), col("item").as("item_a"))
      .join(m.select(col("g"), col("item").as("item_b")), Seq("g"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    pairs
      .join(itemSup.select(col("item").as("item_a"), col("n_item").as("n_a")),
            Seq("item_a"))
      .join(itemSup.select(col("item").as("item_b"), col("n_item").as("n_b")),
            Seq("item_b"))
      .crossJoin(broadcast(nB))
      // lift factored as (conf · N) div n_b: every intermediate stays
      // under conf(≤1e6) · N — overflow-free at 10⁹ baskets, unlike
      // the naive n_ab·N·1e6 numerator
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"), col("n_baskets"),
        expr("n_ab * 1000000 div n_a").as("conf_ab_e6"),
        expr("n_ab * 1000000 div n_b").as("conf_ba_e6"),
        expr("(n_ab * 1000000 div n_a) * n_baskets div n_b").as("lift_e6"))
  }
}
