package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket association rules — the co-occurrence family's
  * RULE member next to the co-purchase GRAPH builders
  * ([[graft.graphs.Triangles]] et al.): support / confidence / lift
  * for item pairs that clear an Apriori-style support prune, the
  * classic "what does this item pull into the cart" signal (and, for
  * a training corpus, "which tags/sources co-occur beyond chance").
  *
  * Exactness: supports are exact long counts; confidence and lift are
  * integer-div micro-ratios (conf_e6 = c_ab·1e6 div c_a; lift_e6 =
  * c_ab·N·1e6 div (c_a·c_b), the product promoted to decimal(38) —
  * c_ab·N·1e6 exceeds int64 as soon as pair counts and basket counts
  * are both ≥ ~10⁵). Nothing floats, so the oracle replays every row.
  *
  * Scale shape: the Apriori property prunes BEFORE the quadratic
  * step — only items above minItemSupport enter the pair join (a
  * pair can never out-support its rarest item), and the pair join is
  * KEYED BY BASKET, so its volume is Σ|basket|² bounded by the
  * basket-size cap (the [[graft.graphs]] co-occurrence contract:
  * order lines, session carts — never an unbounded group). The
  * frequent-item filter is a keyed semi-join (item vocabulary is
  * corpus-unbounded — never broadcast); the one cross join ships the
  * 1-row basket count. */
object AssocRules {

  /** @param baskets (basket, item) rows; duplicates collapse
    * @param minItemSupport items in fewer baskets are pruned before
    *        the pair join (Apriori)
    * @param minPairSupport pairs in fewer baskets emit no rule
    * @return per directed rule: (antecedent, consequent, n_pair,
    *         n_ante, n_cons, n_baskets, conf_e6, lift_e6) — both
    *         directions of every surviving pair */
  def associationRules(baskets: DataFrame, basketCol: String,
                       itemCol: String, minItemSupport: Long,
                       minPairSupport: Long): DataFrame = {
    require(minItemSupport >= 1 && minPairSupport >= 1,
            "supports must be >= 1")
    val b = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .distinct()
    val nB = b.select(countDistinct(col("bk")).as("n_baskets"))
    val itemC = b.groupBy(col("it"))
      .agg(count(lit(1)).as("c_item"))
      .filter(col("c_item") >= minItemSupport)
    val freq = b.join(itemC.select(col("it")), Seq("it"), "left_semi")
    val pairs = freq.select(col("bk"), col("it").as("ia"))
      .join(freq.select(col("bk"), col("it").as("ib")), Seq("bk"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib"))
      .agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minPairSupport)
    val directed = pairs.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("c_pair"))
      .unionByName(pairs.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("c_pair")))
    directed
      .join(itemC.select(col("it").as("antecedent"),
                         col("c_item").as("n_ante")), Seq("antecedent"))
      .join(itemC.select(col("it").as("consequent"),
                         col("c_item").as("n_cons")), Seq("consequent"))
      .crossJoin(nB)
      .select(col("antecedent"), col("consequent"),
        col("c_pair").as("n_pair"), col("n_ante"), col("n_cons"),
        col("n_baskets"),
        expr("c_pair * 1000000 div n_ante").as("conf_e6"),
        expr("CAST(c_pair AS DECIMAL(38,0)) * n_baskets * 1000000" +
             " div (CAST(n_ante AS DECIMAL(38,0)) * n_cons)")
          .cast("long").as("lift_e6"))
  }
}
