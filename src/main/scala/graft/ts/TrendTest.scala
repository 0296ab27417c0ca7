package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Non-parametric trend detection over per-key day grids — the
  * robust pair to the smoothing tier: Mann–Kendall answers "is there
  * a monotone trend at all" without assuming linearity or normal
  * errors, and Theil–Sen estimates its slope as a pairwise median
  * that one outlier day cannot drag (the OLS slope q43 fits is
  * exactly the estimator a single corrupted day CAN drag).
  *
  * Both ride the same PAIR frame: per key, all (earlier, later)
  * observation pairs — n·(n−1)/2 rows for an n-day grid, a
  * calendar-bounded quadratic (the documented bounded-grid contract:
  * daily/weekly/monthly grids, never raw events; a decade of days is
  * ~6.7M pairs per key, distributed rows, no window). Everything to
  * the final z / median is exact long arithmetic, so the oracle
  * replays it; the one double each is a single fixed expression
  * (z's sqrt, rounded to e6 — the established v_e6 convention).
  */
object TrendTest {

  private def obsOf(daily: DataFrame, keyCol: String, dateCol: String,
                    vCol: String): DataFrame =
    daily.select(col(keyCol).as("k"), col(dateCol).as("d"),
                 col(vCol).cast("long").as("y"))

  private def pairsOf(obs: DataFrame): DataFrame = {
    val a = obs.select(col("k"), col("d").as("d1"), col("y").as("y1"))
    val b = obs.select(col("k"), col("d").as("d2"), col("y").as("y2"))
    a.join(b, Seq("k")).filter(col("d1") < col("d2"))
  }

  /** Mann–Kendall trend test. S = Σ_{i<j} sign(y_j − y_i) over the
    * time-ordered grid; Var(S)·18 kept as the exact integer
    * n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5) (the standard tie
    * correction), z with the ±1 continuity correction.
    * @return per key: (key, n_obs, s_stat, var18, z_e6) — z_e6 null
    *         when var18 ≤ 0 (n < 2 or all values tied) */
  def mannKendall(daily: DataFrame, keyCol: String, dateCol: String,
                  vCol: String): DataFrame = {
    val obs = obsOf(daily, keyCol, dateCol, vCol)
    val s = pairsOf(obs)
      .groupBy(col("k"))
      .agg(sum(when(col("y2") > col("y1"), 1L)
                 .when(col("y2") < col("y1"), -1L)
                 .otherwise(0L)).as("s_stat"))
    val n = obs.groupBy(col("k")).agg(count(lit(1)).as("n_obs"))
    val ties = obs.groupBy(col("k"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("k"))
      .agg(sum(col("t") * (col("t") - 1L) * (col("t") * 2L + 5L))
             .as("tie18"))
    n.join(s, Seq("k")).join(ties, Seq("k"))
      .withColumn("var18",
        col("n_obs") * (col("n_obs") - 1L) * (col("n_obs") * 2L + 5L)
          - col("tie18"))
      .select(col("k").as(keyCol), col("n_obs"), col("s_stat"),
        col("var18"),
        when(col("var18") <= 0L, lit(null).cast("long"))
          .otherwise(round(
            (col("s_stat") - signum(col("s_stat"))).cast("double")
              / sqrt(col("var18").cast("double") / 18.0) * 1e6)
            .cast("long")).as("z_e6"))
  }

  /** Theil–Sen slope: the LOWER MEDIAN of the pairwise slopes
    * (y_j − y_i)/(d_j − d_i), each slope e6-scaled and truncated to
    * the integer grid BEFORE ranking (one rounding per pair, so the
    * median is an exact order statistic both engines agree on; the
    * dy·1e6 product runs in decimal(38) — at corpus scale daily
    * deltas exceed int64/1e6).
    *
    * The median rank rides [[graft.scale.GridPrefix
    * .groupedPrefixSums]] over the per-key slope-value grid — no
    * per-key sort in one task, however many pairs a key owns; the
    * per-key totals read off the checkpointed prefix's max running
    * sum instead of re-executing the pair join (59 → 32 s at
    * sf0.1). A two-phase selection variant (coarse adaptive cells →
    * median cell → in-cell rank) was built and MEASURED SLOWER
    * (40 s): its per-key stats/median-cell tables come out of
    * localCheckpoint with no usable size estimate, so both of its
    * pair-stream joins planned as full shuffle sort-merge — and a
    * broadcast hint there would be the per-series-table scale bug
    * the r10 review class forbids. The CDF prefix pays one
    * materialization and keeps every join keyed.
    * @return per key: (key, n_pairs, slope_e6) — the lower median
    *         (rank ⌈m/2⌉) of the e6 slope grid */
  def theilSen(daily: DataFrame, keyCol: String, dateCol: String,
               vCol: String): DataFrame = {
    val obs = obsOf(daily, keyCol, dateCol, vCol)
    val slopes = pairsOf(obs)
      .select(col("k"),
        expr("(CAST(y2 - y1 AS DECIMAL(38,0)) * 1000000) div " +
             "nullif(datediff(d2, d1), 0)").as("slope_e6"))
    val grid = slopes.groupBy(col("k"), col("slope_e6"))
      .agg(count(lit(1)).as("c"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
      grid, "k", "slope_e6", Seq("c"))
    // per-key totals from the CHECKPOINTED prefix's max running sum —
    // not a second pass that would re-execute the pair self-join
    val m = pre.groupBy(col("k")).agg(max(col("cum_c")).as("n_pairs"))
    pre.join(m, Seq("k"))
      .filter(col("cum_c") >= expr("(n_pairs + 1) div 2"))
      .groupBy(col("k"), col("n_pairs"))
      .agg(min(col("slope_e6")).as("slope_e6"))
      .select(col("k").as(keyCol), col("n_pairs"), col("slope_e6"))
  }
}
