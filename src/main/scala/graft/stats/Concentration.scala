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

  /** Theil T inequality index per group — the ENTROPY member of the
    * family: [[gini]] reads rank-weighted spread; Theil
    * T = Σ (xᵢ/S)·ln(n·xᵢ/S) is additively DECOMPOSABLE (between-
    * group + within-group inequality sum exactly to the total),
    * which is why mix-design audits prefer it. 0 = perfect equality,
    * ln(n) = one member holds everything.
    *
    * Float discipline: a raw Σ of per-row ln terms is summation-
    * order-dependent, so each row's contribution is e6-rounded FIRST
    * and the sum runs over exact longs (the gTest per-cell rule);
    * the ln argument is the single expression (x·n)/S on doubles —
    * identical IEEE in both engines (the q312 ln-parity precedent).
    * Zero-valued members contribute exactly 0 (lim x·ln x = 0) and
    * are excluded before the log.
    *
    * @param values (group, value) rows; value exact nonnegative
    *               integer (cents)
    * @return per group: (group, n, total, theil_e6) — null when the
    *         group total is 0 */
  def theilIndex(values: DataFrame, groupCol: String,
                 valueCol: String): DataFrame = {
    val rows = values.select(col(groupCol).as("grp"),
                             col(valueCol).cast("long").as("x"))
    val nt = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
    val term = (col("x").cast("double") / col("total")) *
      log(col("x").cast("double") * col("n") / col("total")) * lit(1e6)
    val sums = rows.where(col("x") > 0L)
      .join(nt, Seq("grp"))
      .withColumn("term_e6", round(term).cast("long"))
      .groupBy(col("grp"))
      .agg(sum(col("term_e6")).as("tsum"))
    // a positive total implies at least one positive member, so tsum
    // is only null for the total = 0 groups the null guard covers
    nt.join(sums, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("n"), col("total"),
        when(col("total") === 0L, lit(null).cast("long"))
          .otherwise(col("tsum")).as("theil_e6"))
  }

  /** ABC (Pareto) classification per group: members sorted by
    * descending value; class A while the running cumulative share is
    * ≤ aPct% of the group total, B while ≤ bPct%, C after — the
    * inventory-management / corpus-mix "which items carry the
    * weight" labeling. Thresholds compare in exact integers
    * (cum·100 ≤ total·pct — no percentage doubles), ties order by
    * id so same-valued members classify deterministically. The
    * window is group-keyed and member-count sized.
    *
    * @return (group, id, value, cum, abc_class) for every member */
  def abcClasses(values: DataFrame, groupCol: String, idCol: String,
                 valueCol: String, aPct: Int = 70, bPct: Int = 90): DataFrame = {
    require(0 < aPct && aPct < bPct && bPct < 100, "0 < aPct < bPct < 100")
    val rows = values.select(col(groupCol).as("grp"), col(idCol).as("rid"),
                             col(valueCol).cast("long").as("x"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("x").desc, col("rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nt = rows.groupBy(col("grp")).agg(sum(col("x")).as("total"))
    rows
      .withColumn("cum", sum(col("x")).over(w))
      .join(nt, Seq("grp"))
      .select(col("grp").as(groupCol), col("rid").as(idCol),
        col("x").as(valueCol), col("cum"),
        when(col("cum") * 100L <= col("total") * aPct.toLong, "A")
          .when(col("cum") * 100L <= col("total") * bPct.toLong, "B")
          .otherwise("C").as("abc_class"))
  }
}
