package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concentration / inequality measures per group — the data-audit
  * statistics that answer "is this corpus dominated by a few
  * sources?" (training-mix design) and "is this revenue dominated by
  * a few customers?" (warehouse risk): the Gini coefficient and the
  * top-decile Lorenz share.
  *
  * Gini rides the rank formula G = Σ(2i − n − 1)·x_(i) / (n·Σx) over
  * the ascending sort — tie order is irrelevant because equal x
  * collapse the coefficient sum over any permutation of a tied block
  * — so the numerator is one exact long per group and the only
  * double is the final ratio. Windows are keyed per group and sized
  * by the group's member count (customers per segment, documents per
  * source), never the corpus. */
object Concentration {

  /** @param values (group, value) rows; value must be an exact
    *               nonnegative integer (cents)
    * @return one row per group: (group, n, total, gini_e6,
    *         top_decile_share_e6) — gini on [0,1e6], and the share of
    *         the total held by the top ceil(n/10) members */
  def gini(values: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val rows = values.select(col(groupCol).as("grp"),
                             col(valueCol).cast("long").as("x"))
    val wAsc = Window.partitionBy(col("grp")).orderBy(col("x"))
    val wDesc = Window.partitionBy(col("grp")).orderBy(col("x").desc)
    val ranked = rows
      .withColumn("i", row_number().over(wAsc).cast("long"))
      .withColumn("rd", row_number().over(wDesc).cast("long"))
    // two-phase: n sits inside both the Gini coefficient and the
    // top-decile cutoff, so aggregate counts first and join back
    // (a group-keyed 2-column frame, not a second corpus window)
    val nt = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
    val giniNum = ranked.join(nt, Seq("grp"))
      .groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("total")).as("total"),
           sum((lit(2L) * col("i") - col("n") - 1L) * col("x")).as("gnum"),
           // top ceil(n/10) by descending rank (rd ≤ ⌈n/10⌉ ⟺
           // 10·rd ≤ n+9, kept in exact integers — Column./ is double
           // division); boundary ties are value-equal so the sum is
           // order-invariant
           sum(when(col("rd") * 10L <= col("n") + 9L, col("x"))
             .otherwise(0L)).as("top_c"))
    giniNum.select(col("grp").as(groupCol), col("n"), col("total"),
      when(col("total") === 0L, lit(null))
        .otherwise(round(col("gnum").cast("double") / (col("n") * col("total"))
          * 1000000.0)).cast("long").as("gini_e6"),
      when(col("total") === 0L, lit(null))
        .otherwise(round(col("top_c").cast("double") / col("total")
          * 1000000.0)).cast("long").as("top_decile_share_e6"))
  }
}
