package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-way ANOVA and Cramér's V — the "is this categorical split
  * real" pair: ANOVA for a numeric metric across k groups (does mean
  * revenue differ by segment?), Cramér's V for the effect SIZE of a
  * categorical association (the χ² test says dependent; V says how
  * much, on [0, 1], comparable across table shapes).
  *
  * Float discipline (the q230/q235 ledger rule): raw sums are exact
  * longs in cents; the per-group variance terms are each ONE double
  * expression rounded to the e6 grid BEFORE any cross-group sum, so
  * the totals are order-free long sums and the final F / V is a
  * single deterministic expression over integers — the oracle's
  * identical tree hash-matches. */
object Anova {

  /** One-way ANOVA over integer values — callers pick the UNIT, and
    * the unit is a scale decision: sums of squares grow ~n·σ², so a
    * cents-valued metric overflows int64 SS around n·σ² ≈ 10¹⁹
    * (caught live: cents² at sf0.1 already trips ANSI overflow —
    * q258 feeds WHOLE DOLLARS, the q240/CUPED whole-currency
    * convention). Per group: (group, n_g, t_sum, mean_e2, ssb_term)
    * with the global (ssb, ssw, k, n, f) broadcast onto every row —
    * the q235 output convention (the per-group decomposition IS the
    * readout; F alone hides where the variance lives).
    *
    * SSB_g = n_g·(mean_g − mean)², SSW_g = S_g − T_g²/n_g — each one
    * double expression rounded per group to the integer unit² grid
    * (~9+ significant digits of the statistic at any feasible n),
    * then summed as order-free longs. F = (SSB/(k−1)) / (SSW/(n−k)),
    * null when degenerate (k < 2 or n ≤ k). Scale shape: one keyed
    * pass over the rows, then group-alphabet-sized aggregates. */
  def anovaOneWay(df: DataFrame, groupCol: String,
                  valueCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"),
                         col(valueCol).cast("long").as("v"))
    // Σv² in DECIMAL(38): v² fits a long for cents values, but the
    // group sum does not at scale — decimal keeps it exact (DuckDB's
    // sum(BIGINT) promotes to HUGEINT, the same exact arithmetic);
    // a double sum here would be float-order-dependent
    val perG = rows.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(col("v")).as("t_sum"),
           sum(col("v").cast("decimal(19,0)") *
               col("v").cast("decimal(19,0)")).as("s2"))
    val tot = perG.agg(sum(col("n_g")).as("n"), sum(col("t_sum")).as("t"),
                       count(lit(1)).as("k"))
    val terms = perG.crossJoin(broadcast(tot))
      .withColumn("mean_g", col("t_sum").cast("double") / col("n_g"))
      .withColumn("mean_all", col("t").cast("double") / col("n"))
      .withColumn("ssb_term",
        round(col("n_g").cast("double") *
              (col("mean_g") - col("mean_all")) *
              (col("mean_g") - col("mean_all"))).cast("long"))
      .withColumn("ssw_term",
        round(col("s2").cast("double") - col("t_sum").cast("double") *
               col("t_sum").cast("double") / col("n_g"))
          .cast("long"))
    val g = terms.agg(sum(col("ssb_term")).as("ssb"),
                      sum(col("ssw_term")).as("ssw"))
    terms.crossJoin(broadcast(g))
      .select(col("grp").as(groupCol), col("n_g"), col("t_sum"),
        round(col("mean_g") * 100.0).cast("long").as("mean_e2"),
        col("ssb_term"), col("ssb"), col("ssw"),
        col("k"), col("n"),
        when(col("k") > 1L && col("n") > col("k"),
          round((col("ssb").cast("double") / (col("k") - 1)) /
                (col("ssw").cast("double") / (col("n") - col("k"))), 6))
          .as("f"))
  }

  /** Brown–Forsythe variance-equality test — [[anovaOneWay]] run on
    * the absolute deviations from each group's EXACT LOWER MEDIAN
    * (the robust Levene variant: a median center keeps the test
    * honest under skew, and the lower median is an exact order
    * statistic both engines agree on). ANOVA answers "do the means
    * differ"; this answers "do the SPREADS differ" — the
    * homoscedasticity gate in front of it.
    *
    * Scale shape: medians ride
    * [[graft.scale.GridPrefix.groupedPrefixSums]] over the per-group
    * value grid (no one-task sort however wide a group), one keyed
    * join pins each row to its group median, then the one-pass ANOVA
    * ledger. Output schema is [[anovaOneWay]]'s with the deviation
    * unit. */
  def brownForsythe(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"),
                         col(valueCol).cast("long").as("v"))
    val grid = rows.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(grid, "grp", "v",
      Seq("c"))
    val m = grid.groupBy(col("grp")).agg(sum(col("c")).as("n_tot"))
    val med = pre.join(m, Seq("grp"))
      .filter(col("cum_c") >= expr("(n_tot + 1) div 2"))
      .groupBy(col("grp")).agg(min(col("v")).as("med"))
    val z = rows.join(med, Seq("grp"))
      .select(col("grp").as(groupCol), abs(col("v") - col("med")).as("z"))
    anovaOneWay(z, groupCol, "z")
  }

  /** Cramér's V of a two-way contingency table — χ² per the q235
    * e6-rounded-term ledger, then V = sqrt(χ² / (n·(min(r,c)−1))).
    * One output row: (n, r, c, chi2_e6, v). All aggregates are
    * attribute-grid-sized; corpus rows are touched once. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val c = df.select(col(aCol).as("a"), col(bCol).as("b"))
    val obs = c.groupBy(col("a"), col("b")).agg(count(lit(1)).as("obs"))
    val rowt = c.groupBy(col("a")).agg(count(lit(1)).as("row_n"))
    val colt = c.groupBy(col("b")).agg(count(lit(1)).as("col_n"))
    val n = c.agg(count(lit(1)).as("n"))
    val terms = rowt.crossJoin(colt).crossJoin(broadcast(n))
      .join(obs, Seq("a", "b"), "left")
      .select(col("row_n"), col("col_n"), col("n"),
              coalesce(col("obs"), lit(0L)).as("obs"))
      .withColumn("e", (col("row_n") * col("col_n")).cast("double") / col("n"))
      .withColumn("term_e6",
        round((col("obs").cast("double") - col("e"))
          * (col("obs").cast("double") - col("e")) / col("e")
          * 1000000.0).cast("long"))
    val dims = rowt.agg(count(lit(1)).as("r"))
      .crossJoin(colt.agg(count(lit(1)).as("c")))
    terms.agg(sum(col("term_e6")).as("chi2_e6"))
      .crossJoin(broadcast(dims)).crossJoin(broadcast(n))
      .select(col("n"), col("r"), col("c"), col("chi2_e6"),
        round(sqrt((col("chi2_e6").cast("double") / 1000000.0) /
                   (col("n") * (least(col("r"), col("c")) - 1))), 6).as("v"))
  }
}
