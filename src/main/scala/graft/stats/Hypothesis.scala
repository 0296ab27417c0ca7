package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-sample hypothesis tests over grouped observations — the
  * drift-detection / experiment-readout statistics that complement
  * the parametric z-test (q214): the Kolmogorov–Smirnov distance
  * compares whole DISTRIBUTIONS (any shift in shape, not just the
  * mean), and the Mann–Whitney rank-sum test is the non-parametric
  * mean-shift test that survives the heavy-tailed metrics (revenue,
  * latency) where the z-test's normality assumption is fiction.
  *
  * Both ride the repo's value-grid discipline
  * ([[graft.pipeline.CorpusSketch.exactPercentiles]]): every window
  * runs over the per-group DISTINCT-value grid, never corpus rows,
  * so the sort is bounded by the value domain; arms are folded into
  * grid columns by one keyed aggregate. Statistics are exact-integer
  * to the last step (cumulative counts, rank sums, tie terms are all
  * longs), with one deterministic double expression at the end — so
  * a SQL oracle replays them bit-for-bit. */
object Hypothesis {

  /** Two-sample Kolmogorov–Smirnov per group: D = max over the pooled
    * value grid of |F_a(v) − F_b(v)|, computed as the exact integer
    * max of |cum_a·n_b − cum_b·n_a| (scale-free numerator — no
    * per-row division, no float drift in the argmax).
    *
    * @param obs   (group, arm, value) rows; arm must be 0 or 1;
    *              value must already be an exact integer grid (cents)
    * @return one row per group: (group, n_a, n_b, d_e6, d_at) where
    *         d_e6 is the e6-rounded KS distance and d_at the SMALLEST
    *         grid value achieving it */
  def ksTest(obs: DataFrame, groupCol: String, armCol: String,
             valueCol: String): DataFrame = {
    val g = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
    val tot = g.groupBy(col("grp"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    // per-group CDFs via the GROUPED distributed prefix: one group's
    // value grid approaches corpus cardinality for cents metrics, so
    // the per-group cumulative must not be a one-task sort
    val cum = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("ca", "cb"))
      .withColumnRenamed("cum_ca", "cuma")
      .withColumnRenamed("cum_cb", "cumb")
      .drop("cum_before_ca", "cum_before_cb")
      .join(tot, Seq("grp"))
      .withColumn("dnum", abs(col("cuma") * col("n_b") - col("cumb") * col("n_a")))
    // exact integer argmax with earliest-value ties: max_by on the
    // (dnum, −v) struct — the q217 deterministic-mode comparator
    cum.groupBy(col("grp"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
           max(col("dnum")).as("dmax"),
           max_by(col("v"), struct(col("dnum"), -col("v"))).as("d_at"))
      .select(col("grp").as(groupCol), col("n_a"), col("n_b"),
        round(col("dmax").cast("double") / (col("n_a") * col("n_b"))
          * 1000000.0).cast("long").as("d_e6"),
        col("d_at"))
  }

  /** Mann–Whitney U (rank-sum with midranks) per group, arm 0 as the
    * reference arm. Midranks over the pooled grid are kept exact by
    * doubling: 2·midrank(v) = 2·cum_<v + count(v) + 1 is always an
    * integer, so the doubled rank sum `r2_a = Σ ca·(2·midrank)` and
    * doubled statistic `u2_a = r2_a − n_a(n_a+1)` are exact longs.
    * The normal approximation uses the standard tie correction
    * (Σ(t³−t) over grid cells): z = (U − n_a·n_b/2) / σ with
    * σ² = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))); null when the
    * variance degenerates (all values tied).
    *
    * @return one row per group: (group, n_a, n_b, u2_a, z_e6) */
  def mannWhitneyU(obs: DataFrame, groupCol: String, armCol: String,
                   valueCol: String): DataFrame = {
    val g = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    // doubled midranks over the grouped distributed prefix (same
    // scale rationale as ksTest above)
    val ranked = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("c"))
      .withColumn("r2", lit(2L) * col("cum_before_c") + col("c") + 1L)
    val agg = ranked.groupBy(col("grp"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
           sum(col("ca") * col("r2")).as("r2_a"),
           sum(col("c") * col("c") * col("c") - col("c")).as("tiesum"))
      .withColumn("n", col("n_a") + col("n_b"))
      .withColumn("u2_a", col("r2_a") - col("n_a") * (col("n_a") + 1L))
    val varU = col("n_a").cast("double") * col("n_b") / 12.0 *
      ((col("n") + 1L).cast("double") -
       col("tiesum").cast("double") / (col("n") * (col("n") - 1L)))
    val z = (col("u2_a") - col("n_a") * col("n_b")).cast("double") / 2.0 /
      sqrt(varU)
    agg.select(col("grp").as(groupCol), col("n_a"), col("n_b"), col("u2_a"),
      when(varU <= 0.0, lit(null))
        .otherwise(round(z * 1000000.0)).cast("long").as("z_e6"))
  }

  /** Welch's unequal-variance t-test per group — the MEANS member of
    * the two-sample family (q214's z compares proportions, the MWU
    * compares ranks; this compares means without assuming the two
    * arms share a variance). Moments are exact integer/decimal(38)
    * aggregates (Σv² overflows int64 for cents metrics); t and the
    * Welch–Satterthwaite df are single fixed double trees over them,
    * replayed verbatim by the oracle.
    *
    * @param obs (group, arm, value) rows; arm 0/1; value an exact
    *            integer grid (cents)
    * @return per group: (group, n_a, n_b, t_e6, df_e6) — null when
    *         either arm has n &lt; 2 or both variances vanish */
  def welchT(obs: DataFrame, groupCol: String, armCol: String,
             valueCol: String): DataFrame = {
    val agg = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
           sum(when(col("arm") === 0L, col("v")).otherwise(0L)).as("s_a"),
           sum(when(col("arm") === 1L, col("v")).otherwise(0L)).as("s_b"),
           sum(when(col("arm") === 0L,
             col("v").cast("decimal(38,0)") * col("v"))).as("q_a"),
           sum(when(col("arm") === 1L,
             col("v").cast("decimal(38,0)") * col("v"))).as("q_b"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val sA = col("s_a").cast("double")
    val sB = col("s_b").cast("double")
    val vA = (col("q_a").cast("double") - sA * sA / nA) / (nA - lit(1.0))
    val vB = (col("q_b").cast("double") - sB * sB / nB) / (nB - lit(1.0))
    val seA = vA / nA
    val seB = vB / nB
    val se2 = seA + seB
    val t = (sA / nA - sB / nB) / sqrt(se2)
    val df = se2 * se2 /
      (seA * seA / (nA - lit(1.0)) + seB * seB / (nB - lit(1.0)))
    val ok = col("n_a") >= 2L && col("n_b") >= 2L && se2 > lit(0.0)
    agg.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
      when(ok, round(t * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("t_e6"),
      when(ok, round(df * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("df_e6"))
  }

  /** Kruskal–Wallis H — the k-GROUP rank test completing the family:
    * [[mannWhitneyU]] compares two arms' ranks, ANOVA (q258) compares
    * k means parametrically; this compares k groups' rank
    * distributions with no normality assumption (the non-parametric
    * twin of one-way ANOVA, reducing to MWU at k = 2).
    *
    * Midranks over the POOLED value grid are kept exact by doubling
    * (the [[mannWhitneyU]] device); the doubled per-group rank sum
    * s2_g = Σ c_g·(2·midrank) is an exact decimal. With doubled
    * sums, H = 12/(N(N+1))·Σ n_g(R̄_g − (N+1)/2)² becomes
    * 3/(N(N+1)) · Σ (s2_g − n_g(N+1))²/n_g — each group's term an
    * exact truncating integer division (the ANOVA ledger rule:
    * per-group rounding BEFORE the cross-group sum keeps the total
    * order-free), the final H one double tree with the standard tie
    * correction C = 1 − Σ(t³−t)/(N³−N).
    *
    * Scale shape: pooled-grid prefix rides
    * [[graft.scale.GridPrefix.prefixSums]] (no one-task sort over a
    * wide value grid), per-(group, value) counts join the grid by
    * value — keyed, never broadcast by hint.
    * @return per group: (group, n_g, r2_sum, h_term, n, k, h_e6) —
    *         the per-group decomposition with the global H broadcast
    *         (the q235/q258 output convention); h_e6 tie-corrected,
    *         null when k < 2 or all values tied */
  def kruskalWallis(df: DataFrame, groupCol: String,
                    valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = df.select(col(groupCol).as("grp"),
                         col(valueCol).cast("long").as("v"))
    val gridAll = rows.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val pre = graft.scale.GridPrefix.prefixSums(gridAll, "v", "c")
      .withColumn("r2", lit(2L) * col("cum_before") + col("c") + 1L)
    val tot = pre.agg(sum(col("c")).as("n"),
      sum(col("c") * col("c") * col("c") - col("c")).as("tiesum"),
      count(lit(1)).as("n_vals"))
    val perG = rows.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c_g"))
      .join(pre.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("grp"))
      .agg(sum(col("c_g")).as("n_g"),
           sum(col("c_g").cast(d38) * col("r2")).as("r2_sum"))
    val terms = perG.crossJoin(broadcast(tot))
      // (s2_g − n_g(N+1))² / n_g — exact truncating division per
      // group (scale: dev ~ n_g·N, dev²/n_g ~ n_g·N² — decimal(38)
      // holds to ~10¹⁸ rows)
      .withColumn("h_term", expr(
        "CAST((r2_sum - CAST(n_g AS DECIMAL(38,0)) * (n + 1))" +
          " * (r2_sum - CAST(n_g AS DECIMAL(38,0)) * (n + 1))" +
          " div n_g AS BIGINT)"))
    val g = terms.agg(sum(col("h_term")).as("h_sum"),
                      count(lit(1)).as("k"))
    val c = lit(1.0) - col("tiesum").cast("double") /
      (col("n").cast("double") * col("n") * col("n") - col("n"))
    val h = lit(3.0) * col("h_sum").cast("double") /
      (col("n").cast("double") * (col("n") + 1L)) / c
    terms.crossJoin(broadcast(g))
      .select(col("grp").as(groupCol), col("n_g"),
        col("r2_sum").cast("long").as("r2_sum"), col("h_term"),
        col("n"), col("k"),
        when(col("k") < 2L || c <= lit(0.0),
          lit(null).cast("long"))
          .otherwise(round(h * 1e6).cast("long")).as("h_e6"))
  }
}
