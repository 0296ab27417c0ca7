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

  /** Cochran–Armitage trend test — binary outcome vs ORDERED dose
    * groups: where the chi-square independence test (q213) asks "is
    * outcome associated with group at all", this asks the sharper
    * one-degree question "does the success rate move MONOTONICALLY
    * with the group score" (quality-gate pass rate vs document-length
    * band, conversion vs recency bucket). Permutation-null z:
    *
    *   z = (N·U − R·Σwₙ) / sqrt(R(N−R)·(N·Σw²n − (Σwₙ)²)/(N−1))
    *
    * with U = Σ wᵢrᵢ, Σwₙ = Σ wᵢnᵢ — the numerator and the variance
    * radicand exact integer aggregates over the k per-group (nᵢ, rᵢ)
    * counts (decimal(38): R(N−R)·N·Σw²n ~ N³w²/4 holds to ~10⁹ rows
    * at w ≤ 10; scores are small ordered ranks by contract), one
    * fixed double tree at the end. Null when the radicand vanishes
    * (constant outcome or a single group). TWO aggregates (per-group
    * then global — k rows in between); corpus touched once.
    *
    * @param df rows with an integer score column (the ordered dose,
    *           small by contract) and a 0/1 outcome column
    * @return one row: (n, r, k, z_e6) */
  def cochranArmitage(df: DataFrame, scoreCol: String,
                      outcomeCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val perG = df.select(col(scoreCol).cast("long").as("w"),
                         col(outcomeCol).cast("long").as("y"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_g"), sum(col("y")).as("r_g"))
    val a = perG.agg(sum(col("n_g")).as("n"), sum(col("r_g")).as("r"),
      count(lit(1)).as("k"),
      sum(col("w") * col("r_g")).as("u"),
      sum(col("w") * col("n_g")).as("wn"),
      sum(col("w") * col("w") * col("n_g")).as("w2n"))
    val numN = col("n").cast(d38) * col("u") - col("r").cast(d38) * col("wn")
    val radicand = col("r").cast(d38) * (col("n") - col("r")) *
      (col("n").cast(d38) * col("w2n") - col("wn").cast(d38) * col("wn"))
    val z = numN.cast("double") /
      sqrt(radicand.cast("double") / (col("n") - 1L))
    a.select(col("n"), col("r"), col("k"),
      when(radicand <= lit(0) || col("n") < 2L, lit(null).cast("long"))
        .otherwise(round(z * 1e6).cast("long")).as("z_e6"))
  }

  /** Cliff's delta — the EFFECT SIZE the rank tests above leave out:
    * [[mannWhitneyU]]'s z says whether arm 0 stochastically dominates
    * arm 1; δ = P(a > b) − P(a &lt; b) says by HOW MUCH, on a scale
    * ([−1, 1]) that doesn't grow with n the way z does — the number
    * an experiment readout ships next to the p-value.
    *
    * Exact over the pooled per-group value grid: #(a&gt;b) =
    * Σ_v ca(v)·cum_b(&lt;v) and #(a&lt;b) = Σ_v ca(v)·(n_b −
    * cum_b(≤v)) are exact integer products (decimal(38) — the pair
    * count is n_a·n_b), δ one truncating e6 division. Same grouped
    * grid-prefix shape as [[mannWhitneyU]] (no one-task sort,
    * corpus touched once).
    * @param obs (group, arm, value) rows; arm 0/1; value integer
    * @return per group: (group, n_a, n_b, delta_e6) — null when
    *         either arm is empty */
  def cliffsDelta(obs: DataFrame, groupCol: String, armCol: String,
                  valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("cb"))
    // #(a<b) = Σ ca·(n_b − cum_b(≤v)) = n_a·n_b − Σ ca·cum_b(≤v):
    // fold the inclusive-cumulative product instead of carrying n_b
    // into the sum (no window-inside-aggregate)
    val agg = pre.groupBy(col("grp"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
           sum(col("ca").cast(d38) * col("cum_before_cb")).as("gt"),
           sum(col("ca").cast(d38) * col("cum_cb")).as("s_le"))
    agg.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
      when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("long"))
        .otherwise(expr(
          "CAST((gt - (CAST(n_a AS DECIMAL(38,0)) * n_b - s_le)) * 1000000" +
            " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"))
        .as("delta_e6"))
  }

  /** Anderson–Darling k-sample test (Scholz–Stephens A²akN, the
    * midrank/tie-adjusted form) — the TAIL-SENSITIVE member of the
    * two-or-more-sample family: KS weighs the single largest CDF gap
    * (middle-heavy), Kruskal–Wallis only shifts in location; A²
    * integrates the squared gap with 1/(F(1−F)) weighting, so it
    * catches distributions that differ in the TAILS (the heavy-tail
    * drift a revenue or latency metric shows first).
    *
    * Doubled-count ledger (exact integers end to end): per pooled
    * distinct value j with tie count l_j, B2_j = 2·cum_j − l_j and
    * per group M2_ij = 2·cum_ij − c_ij double the Scholz–Stephens
    * midpoint counts; the cell ratio
    * (N·M2 − n_i·B2)² / (B2(2N−B2) − N·l_j) is exact (denominator
    * l(N−l) > 0 at the edges whenever the grid has ≥ 2 values), and
    * its e6 quantization splits the division
    * ((q div d)·10⁶ + (q mod d)·10⁶ div d) so the largest
    * intermediate is num² ≤ 4N⁴ — inside decimal(38) to N ≈ 10⁹.
    * One truncation per cell, one per group (the ANOVA ledger rule),
    * one final; A²_e6 = (N−1)·T div N².
    *
    * Scale shape: pooled grid via [[graft.scale.GridPrefix
    * .prefixSums]]; the DENSE (group × grid) frame is k·L rows (k
    * config-small — every group needs its cumulative at EVERY pooled
    * value because absent cells still carry weight), cumulated by
    * the GROUPED prefix; aggregates keyed. Null when k &lt; 2 or the
    * grid is a single value.
    * @return per group: (group, n_g, n, k, a2_e6) — the global
    *         statistic broadcast onto each group row (q317
    *         convention) */
  def andersonDarlingK(df: DataFrame, groupCol: String,
                       valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = df.select(col(groupCol).as("grp"),
                         col(valueCol).cast("long").as("v"))
    val grid = graft.scale.GridPrefix.prefixSums(
        rows.groupBy(col("v")).agg(count(lit(1)).as("l")), "v", "l")
      .withColumn("b2", lit(2L) * col("cum") - col("l"))
      .drop("cum_before")
    val tot = grid.agg(max(col("cum")).as("n"),
                       count(lit(1)).as("n_vals"))
    val grps = rows.groupBy(col("grp")).agg(count(lit(1)).as("n_g"))
    val perGV = rows.groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c_ij"))
    // dense (group × pooled-grid) frame: absent cells count 0 but
    // still contribute (the group's CDF is flat there, the pooled
    // weight is not)
    val dense = grid.crossJoin(broadcast(grps))
      .join(perGV, Seq("grp", "v"), "left")
      .na.fill(0L, Seq("c_ij"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(
        dense, "grp", "v", Seq("c_ij"))
      .withColumn("m2", lit(2L) * col("cum_c_ij") - col("c_ij"))
      .crossJoin(broadcast(tot))
    val num = col("n").cast(d38) * col("m2") -
      col("n_g").cast(d38) * col("b2")
    val cells = cum
      .withColumn("num2", num * num)
      .withColumn("den",
        col("b2").cast(d38) * (lit(2L) * col("n") - col("b2")) -
          col("n").cast(d38) * col("l"))
      // e6 ratio with the division split: q·10⁶ would overflow
      // decimal(38) where q alone does not; den = 0 only on the
      // single-value degenerate grid (output nulled below) — the
      // guard keeps ANSI division from throwing there
      .withColumn("ratio_e6", expr(
        "CASE WHEN den <= 0 THEN CAST(0 AS DECIMAL(38,0)) ELSE" +
          " (num2 div den) * 1000000 + (num2 % den) * 1000000 div den" +
          " END"))
      .withColumn("cell", col("l").cast(d38) * col("ratio_e6"))
    val perG = cells.groupBy(col("grp"))
      .agg(max(col("n_g")).as("n_g"), sum(col("cell")).as("g_sum"),
           max(col("n")).as("n"), max(col("n_vals")).as("n_vals"))
      .withColumn("gi", expr("g_sum div n_g"))
    val t = perG.agg(sum(col("gi")).as("t_sum"), count(lit(1)).as("k"))
    perG.crossJoin(broadcast(t))
      .select(col("grp").as(groupCol), col("n_g"), col("n"), col("k"),
        when(col("k") < 2L || col("n_vals") < 2L, lit(null).cast("long"))
          .otherwise(expr(
            "CAST((CAST(n AS DECIMAL(38,0)) - 1) * t_sum" +
              " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
          .as("a2_e6"))
  }

  /** G-test of independence — the log-likelihood-ratio twin of the
    * Pearson χ² (q213): G = 2ΣO·ln(O·N/(R·C)) is additive across
    * table partitions (a drill-down's G values sum to the parent's —
    * the property χ² lacks) and better-behaved when expected counts
    * are small-ish. Same contingency input as χ², same asymptotic
    * null.
    *
    * Exactness: counts/marginals exact integers; each PRESENT cell's
    * O·ln(O·N/(R·C)) is one fixed double tree e6-rounded BEFORE the
    * sum (the q306 per-cell discipline — absent cells contribute 0
    * by the 0·ln0 convention and are never materialized), the total
    * an exact long sum doubled at the end. Cell grid is
    * (levels × levels)-sized; corpus touched once.
    * @return one row: (n, r_levels, c_levels, dof, g_e6) */
  def gTest(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.select(col(aCol).as("a"), col(bCol).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rt = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val ct = cells.groupBy(col("b")).agg(sum(col("o")).as("c_t"))
    val tt = rt.agg(sum(col("r")).as("n"),
      count(lit(1)).as("r_levels"))
    val cc = ct.agg(count(lit(1)).as("c_levels"))
    val term = (col("o").cast("double") *
      log(col("o").cast("double") * col("n") /
        (col("r").cast("double") * col("c_t")))) * lit(1e6)
    cells.join(rt, Seq("a")).join(ct, Seq("b"))
      .crossJoin(broadcast(tt)).crossJoin(broadcast(cc))
      .withColumn("term_e6", round(term).cast("long"))
      .groupBy(col("n"), col("r_levels"), col("c_levels"))
      .agg(sum(col("term_e6")).as("gsum"))
      .select(col("n"), col("r_levels"), col("c_levels"),
        ((col("r_levels") - 1L) * (col("c_levels") - 1L)).as("dof"),
        (lit(2L) * col("gsum")).as("g_e6"))
  }

  /** Ansari–Bradley scale test — the DISPERSION member of the rank
    * family: [[mannWhitneyU]] detects location shifts,
    * Brown–Forsythe detects spread parametrically (deviations from
    * medians); this detects spread with RANKS ONLY — scores
    * a(r) = min(r, N+1−r) are largest in the middle of the pooled
    * ordering, so an arm squeezed toward the center scores high and
    * an arm pushed to the tails scores low, whatever the shapes.
    *
    * Exact permutation moments (no even/odd-N cases, ties handled by
    * construction): with doubled midranks r2, the doubled score
    * s2 = min(r2, 2N+2−r2); W2 = Σ ca·s2, and against the ACTUAL
    * score multiset S1 = Σ c·s2, S2 = Σ c·s2²:
    *
    *   z = (N·W2 − n_a·S1) / sqrt(n_a·n_b·(N·S2 − S1²)/(N−1))
    *
    * — numerator and radicand exact integer aggregates
    * (decimal(38): S2 ~ N³), one fixed double tree, null when the
    * radicand vanishes. Same grouped grid-prefix shape as the MWU.
    * @param obs (group, arm, value) rows; arm 0/1; value integer
    * @return per group: (group, n_a, n_b, w2, z_e6) */
  def ansariBradley(obs: DataFrame, groupCol: String, armCol: String,
                    valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val ranked = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("c"))
      .withColumn("r2", lit(2L) * col("cum_before_c") + col("c") + 1L)
    val tot = ranked.groupBy(col("grp"))
      .agg(sum(col("c")).as("n_all"))
    val scored = ranked.join(tot, Seq("grp"))
      .withColumn("s2",
        least(col("r2"), lit(2L) * col("n_all") + 2L - col("r2")))
    val agg = scored.groupBy(col("grp"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
           sum(col("ca") * col("s2")).as("w2"),
           sum(col("c") * col("s2")).as("s1"),
           sum(col("c").cast(d38) * col("s2") * col("s2")).as("s2sq"))
      .withColumn("n", col("n_a") + col("n_b"))
    val numN = col("n").cast(d38) * col("w2") -
      col("n_a").cast(d38) * col("s1")
    val radicand = col("n_a").cast(d38) * col("n_b") *
      (col("n").cast(d38) * col("s2sq") -
        col("s1").cast(d38) * col("s1"))
    val z = numN.cast("double") /
      sqrt(radicand.cast("double") / (col("n") - 1L))
    agg.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
      col("w2"),
      when(radicand <= lit(0) || col("n") < 2L, lit(null).cast("long"))
        .otherwise(round(z * 1e6).cast("long")).as("z_e6"))
  }

  /** Jonckheere–Terpstra trend test — ORDERED k-sample alternatives:
    * [[kruskalWallis]] asks "do the k groups differ at all";
    * [[cochranArmitage]] asks the ordered question for BINARY
    * outcomes; this asks it for continuous ones — "do the values
    * trend UP with the group's dose rank" — by summing the pairwise
    * Mann–Whitney counts U_gh over every dose-ordered group pair.
    * Far more power than KW when the alternative really is ordered.
    *
    * Doubled exact ledger: J2 = Σ_v Σ_h c_h(v)·Σ_{g&lt;h}(2·cum_g(&lt;v)
    * + c_g(v)) — per pooled value v, the inner sum is a running sum
    * over the k dose-ordered groups (a k-row window per value), and
    * the per-group cumulatives ride the same dense (group × grid)
    * frame as [[andersonDarlingK]]. E[J2] = (N² − Σn_g²)/2 exact;
    * Var(J) is the Hollander–Wolfe three-term tie formula, every
    * ingredient an exact integer aggregate and the variance one
    * fixed double tree both engines replay. Null when Var ≤ 0.
    * @param df rows with an integer dose column (small ordered
    *           ranks) and an integer value column
    * @return one row: (n, k, j2, e2, z_e6) */
  def jonckheereTerpstra(df: DataFrame, doseCol: String,
                         valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = df.select(col(doseCol).cast("long").as("g"),
                         col(valueCol).cast("long").as("v"))
    val grid = rows.groupBy(col("v")).agg(count(lit(1)).as("l"))
    val grps = rows.groupBy(col("g")).agg(count(lit(1)).as("n_g"))
    val perGV = rows.groupBy(col("g"), col("v"))
      .agg(count(lit(1)).as("c"))
    val dense = grid.crossJoin(broadcast(grps))
      .join(perGV, Seq("g", "v"), "left")
      .na.fill(0L, Seq("c"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(
        dense, "g", "v", Seq("c"))
      .withColumn("a", lit(2L) * col("cum_before_c") + col("c"))
    // running Σ_{g<h} A_g at fixed v: the window partition is ONE
    // value's k dose rows — config-small, never data-wide
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v")).orderBy(col("g"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val j = cum
      .withColumn("pref_a", coalesce(sum(col("a")).over(w), lit(0L)))
      .agg(sum(col("c").cast(d38) * col("pref_a")).as("j2"))
    // tie/group ledgers for E and the three-term variance
    // g18/t18 are ~2n³ in the group/tie size: like the adjacent
    // g3/t3/sn2 terms, the first factor goes to decimal(38,0) so a
    // dose group or tie block past ~1.66M rows can't overflow int64
    val tg = grps.agg(sum(col("n_g")).as("n"), count(lit(1)).as("k"),
      sum(col("n_g").cast(d38) * col("n_g")).as("sn2"),
      sum(col("n_g").cast(d38) * (col("n_g") - 1L) *
        (col("n_g") * 2L + 5L)).as("g18"),
      sum(col("n_g").cast(d38) * (col("n_g") - 1L) *
        (col("n_g") - 2L)).as("g3"),
      sum(col("n_g") * (col("n_g") - 1L)).as("g2"))
    val tv = grid.agg(
      sum(col("l").cast(d38) * (col("l") - 1L) *
        (col("l") * 2L + 5L)).as("t18"),
      sum(col("l").cast(d38) * (col("l") - 1L) *
        (col("l") - 2L)).as("t3"),
      sum(col("l") * (col("l") - 1L)).as("t2"))
    val nD = col("n").cast("double")
    val term1 = (col("n").cast(d38) * (col("n") - 1L) *
      (lit(2L) * col("n") + 5L) - col("g18") - col("t18"))
      .cast("double") / 72.0
    val term2 = col("g3").cast("double") * col("t3").cast("double") /
      (lit(36.0) * (nD * (nD - 1.0) * (nD - 2.0)))
    val term3 = col("g2").cast("double") * col("t2").cast("double") /
      (lit(8.0) * (nD * (nD - 1.0)))
    val variance = term1 + term2 + term3
    // E[J2] = (N² − Σn²)/2 — Σ_{g≠h} n_g·n_h is even, so exact
    val z = (col("j2") - col("e2")).cast("double") / 2.0 / sqrt(variance)
    j.crossJoin(broadcast(tg)).crossJoin(broadcast(tv))
      .withColumn("e2", expr(
        "CAST((CAST(n AS DECIMAL(38,0)) * n - sn2) div 2 AS BIGINT)"))
      .select(col("n"), col("k"), col("j2").cast("long").as("j2"),
        col("e2"),
        when(col("k") < 2L || variance <= 0.0, lit(null).cast("long"))
          .otherwise(round(z * 1e6).cast("long")).as("z_e6"))
  }

  /** Friedman test — the REPEATED-MEASURES member closing the rank
    * family: [[kruskalWallis]] compares k INDEPENDENT groups; this
    * compares k treatments measured on the SAME blocks (k event
    * types' daily volumes ranked within each day, k quality gates'
    * scores per document), killing the between-block variance the
    * way a paired t-test kills between-subject variance. Complete
    * blocks only (a block missing a treatment is dropped — the
    * standard Friedman contract); midranks within blocks.
    *
    * With doubled midranks r2 = 2·cum_&lt;v + t + 1 (exact integers,
    * the [[mannWhitneyU]] device), the tie-corrected statistic
    * χ²_F = (k−1)·Σ_j (R2_j − n(k+1))² / (A2 − C2) with
    * R2_j = Σ_blocks r2_ij, A2 = Σ_ij r2_ij², C2 = n·k·(k+1)² — all
    * exact integer aggregates (numerator decimal(38) ~ n²k³), one
    * truncating e6 division. Null when A2 = C2 (every block fully
    * tied). Scale shape: the within-block rank window partitions by
    * BLOCK — each partition is k rows (config-small treatments),
    * blocks spread across tasks; no pooled sort anywhere.
    *
    * @param df (block, treatment, value) rows, ONE row per pair
    * @return per treatment: (treatment, r2_sum, n_blocks, k,
    *         chi2_e6) — the per-treatment decomposition with the
    *         global statistic broadcast (the q317 convention) */
  def friedman(df: DataFrame, blockCol: String, trtCol: String,
               valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
    val rows = df.select(col(blockCol).as("blk"), col(trtCol).as("trt"),
                         col(valueCol).cast("long").as("v"))
    val kTot = rows.select(col("trt")).distinct()
      .agg(count(lit(1)).as("k"))
    // complete blocks only: exactly one row per (block, treatment)
    // and all k treatments present
    val complete = rows.groupBy(col("blk"))
      .agg(count(lit(1)).as("c_rows"),
           count_distinct(col("trt")).as("c_trt"))
      .crossJoin(broadcast(kTot))
      .filter(col("c_rows") === col("c_trt") && col("c_trt") === col("k"))
      .select(col("blk"), col("k"))
    val inBlk = rows.join(complete, Seq("blk"))
    // doubled midranks within the k-row block: cum over the block's
    // per-value counts (window partition = one block = k rows)
    val cnt = inBlk.groupBy(col("blk"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum",
        sum(col("c")).over(w.partitionBy(col("blk")).orderBy(col("v"))))
      .withColumn("r2", lit(2L) * (col("cum") - col("c")) + col("c") + 1L)
    val ranked = inBlk.join(cnt.select(col("blk"), col("v"), col("r2")),
      Seq("blk", "v"))
    val perT = ranked.groupBy(col("trt"))
      .agg(sum(col("r2")).as("r2_sum"), count(lit(1)).as("n_blocks"),
           max(col("k")).as("k"),
           sum(col("r2") * col("r2")).as("a2_part"))
    val tot = perT.agg(sum(col("a2_part")).as("a2"),
      max(col("n_blocks")).as("n"), max(col("k")).as("kk"))
    val terms = perT.crossJoin(broadcast(tot))
      .withColumn("dev2", (col("r2_sum").cast(d38) -
        col("n").cast(d38) * (col("kk") + 1L)) *
        (col("r2_sum").cast(d38) - col("n").cast(d38) * (col("kk") + 1L)))
    val g = terms.agg(sum(col("dev2")).as("num"),
      max(col("a2") - col("n").cast(d38) * col("kk") *
        (col("kk") + 1L) * (col("kk") + 1L)).as("den"))
    terms.crossJoin(broadcast(g))
      .select(col("trt").as(trtCol), col("r2_sum"), col("n_blocks"),
        col("k"),
        when(col("den") <= lit(0) || col("k") < 2L,
          lit(null).cast("long"))
          .otherwise(expr(
            "CAST((k - 1) * num * 1000000 div den AS BIGINT)"))
          .as("chi2_e6"))
  }

  /** Page's trend test — the ORDERED-ALTERNATIVE sharpening of
    * [[friedman]], completing the repeated-measures pair the way
    * [[jonckheereTerpstra]] sharpens [[kruskalWallis]]: Friedman asks
    * "do the k treatments differ at all?", Page's L asks "do they
    * INCREASE with the treatment's dose rank?" — and when the
    * alternative really is monotone, L buys the same power at far
    * smaller samples. L = Σ_j c_j·R_j with c_j the dose's rank among
    * the k doses and R_j the treatment's within-block rank sum.
    *
    * Doubled-midrank ledger (the [[friedman]] device): L2 = Σ c_j·R2_j
    * doubles L, E[L2] = n·k(k+1)² (ties leave E unchanged — Σ of
    * midranks per block is invariant), Var[L2] = n·k²(k+1)²(k−1)/36
    * (the standard Page variance; like the textbook test it is NOT
    * tie-adjusted — documented, midranks only stabilize L itself).
    * Every ingredient an exact integer aggregate; z one fixed double
    * tree. Same complete-blocks contract and k-row block windows as
    * [[friedman]] — no pooled sort.
    *
    * @param df (block, dose, value) rows — dose an integer whose
    *           ORDER carries the hypothesis (rank is computed here)
    * @return per dose: (dose, c_rank, r2_sum, n_blocks, k, l2,
    *         z_e6) — L2 and z broadcast (q317 convention); z null
    *         when k < 3 (Page needs an ordering to sharpen) */
  def pageTrend(df: DataFrame, blockCol: String, doseCol: String,
                valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
    val rows = df.select(col(blockCol).as("blk"),
                         col(doseCol).cast("long").as("dose"),
                         col(valueCol).cast("long").as("v"))
    val kTot = rows.select(col("dose")).distinct()
      .agg(count(lit(1)).as("k"))
    val complete = rows.groupBy(col("blk"))
      .agg(count(lit(1)).as("c_rows"),
           count_distinct(col("dose")).as("c_trt"))
      .crossJoin(broadcast(kTot))
      .filter(col("c_rows") === col("c_trt") && col("c_trt") === col("k"))
      .select(col("blk"), col("k"))
    val inBlk = rows.join(complete, Seq("blk"))
    val cnt = inBlk.groupBy(col("blk"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum",
        sum(col("c")).over(w.partitionBy(col("blk")).orderBy(col("v"))))
      .withColumn("r2", lit(2L) * (col("cum") - col("c")) + col("c") + 1L)
    val ranked = inBlk.join(cnt.select(col("blk"), col("v"), col("r2")),
      Seq("blk", "v"))
    // dose rank 1..k: a k-row window over the DISTINCT doses
    val doseRank = rows.select(col("dose")).distinct()
      .withColumn("c_rank",
        row_number().over(w.orderBy(col("dose"))).cast("long"))
    val perT = ranked.groupBy(col("dose"))
      .agg(sum(col("r2")).as("r2_sum"), count(lit(1)).as("n_blocks"),
           max(col("k")).as("k"))
      .join(broadcast(doseRank), Seq("dose"))
    val tot = perT.agg(
      sum(col("c_rank").cast(d38) * col("r2_sum")).as("l2"),
      max(col("n_blocks")).as("n"), max(col("k")).as("kk"))
    perT.crossJoin(broadcast(tot))
      .select(col("dose").as(doseCol), col("c_rank"), col("r2_sum"),
        col("n_blocks"), col("k"),
        col("l2").cast("long").as("l2"),
        when(col("kk") < 3L || col("n") < 1L, lit(null).cast("long"))
          .otherwise(round(
            // E[L2] = n·k(k+1)²/2 (exact: k(k+1)² is always even)
            (col("l2").cast("double") -
              col("n").cast("double") * col("kk") * (col("kk") + 1L)
                * (col("kk") + 1L) / 2.0) /
            sqrt(col("n").cast("double") * col("kk") * col("kk")
              * (col("kk") + 1L) * (col("kk") + 1L) * (col("kk") - 1L)
              / 36.0) * 1e6).cast("long"))
          .as("z_e6"))
  }

  /** Kendall's W (coefficient of concordance, tie-corrected) — the
    * EFFECT SIZE over [[friedman]]'s evidence the way Cliff's δ sits
    * over Mann–Whitney: χ²_F says the n blocks don't rank the k
    * treatments at random; W ∈ [0, 1] says how strongly they AGREE
    * (1 = every block ranks identically), on a scale that doesn't
    * grow with n.
    *
    * Tie-corrected form on the doubled-midrank ledger: with
    * R2_j = 2·R_j and per-block tie term T_b = Σ_ties (t³ − t),
    *   W = (3·(ΣR2² − n²k(k+1)²)) / (n²k(k²−1) − 12·n·ΣT_b/... )
    * computed here as num = 3·(ΣR2_j² − n²·k·(k+1)²) and
    * den = n²·k·(k²−1) − n·ΣT_b (the standard
    * 12ΣR²−3n²k(k+1)² over n²k(k²−1)−nΣT with both sides ×4/4) —
    * exact integer aggregates, one truncating e6 division. Complete
    * blocks, k-row block windows, no pooled sort.
    * @return one row: (n_blocks, k, sum_t, w_e6) — null when k < 2
    *         or den ≤ 0 (every block fully tied) */
  def kendallW(df: DataFrame, blockCol: String, trtCol: String,
               valueCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = org.apache.spark.sql.expressions.Window
    val rows = df.select(col(blockCol).as("blk"), col(trtCol).as("trt"),
                         col(valueCol).cast("long").as("v"))
    val kTot = rows.select(col("trt")).distinct()
      .agg(count(lit(1)).as("k"))
    val complete = rows.groupBy(col("blk"))
      .agg(count(lit(1)).as("c_rows"),
           count_distinct(col("trt")).as("c_trt"))
      .crossJoin(broadcast(kTot))
      .filter(col("c_rows") === col("c_trt") && col("c_trt") === col("k"))
      .select(col("blk"), col("k"))
    val inBlk = rows.join(complete, Seq("blk"))
    val cnt = inBlk.groupBy(col("blk"), col("v"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum",
        sum(col("c")).over(w.partitionBy(col("blk")).orderBy(col("v"))))
      .withColumn("r2", lit(2L) * (col("cum") - col("c")) + col("c") + 1L)
    // per-block tie term Σ(c³ − c) — c ≤ k, config-small
    val ties = cnt.agg(coalesce(
      sum(col("c") * col("c") * col("c") - col("c")), lit(0L)).as("sum_t"))
    val ranked = inBlk.join(cnt.select(col("blk"), col("v"), col("r2")),
      Seq("blk", "v"))
    val perT = ranked.groupBy(col("trt"))
      .agg(sum(col("r2")).as("r2_sum"), count(lit(1)).as("n_blocks"),
           max(col("k")).as("k"))
    val tot = perT.agg(
      sum(col("r2_sum").cast(d38) * col("r2_sum")).as("sr2"),
      max(col("n_blocks")).as("n"), max(col("k")).as("kk"))
      .crossJoin(broadcast(ties))
    tot.select(col("n").as("n_blocks"), col("kk").as("k"), col("sum_t"),
      when(col("kk") < 2L, lit(null).cast("long"))
        .otherwise(expr(
          // 12ΣR² = 3ΣR2² (R2 = 2R), so numerator and denominator
          // both sit on the STANDARD scale — no ×4 anywhere
          "CASE WHEN CAST(n AS DECIMAL(38,0)) * n * kk * (kk * kk - 1)" +
            " - CAST(n AS DECIMAL(38,0)) * sum_t <= 0 THEN NULL ELSE" +
            " CAST((3 * (sr2 - CAST(n AS DECIMAL(38,0)) * n * kk" +
            " * (kk + 1) * (kk + 1))) * 1000000" +
            " div (CAST(n AS DECIMAL(38,0)) * n * kk * (kk * kk - 1)" +
            " - CAST(n AS DECIMAL(38,0)) * sum_t) AS BIGINT) END"))
        .as("w_e6"))
  }

  /** Mood's median test — the BLUNT-BUT-ROBUST k-sample member: score
    * every observation only by "above the pooled median or not", then
    * χ² on the k×2 table. Far less powerful than [[kruskalWallis]]
    * under clean shift alternatives, but immune to outliers and the
    * first test a heavy-tailed latency metric gets. Ties at the
    * median count as NOT-above (the scipy ties='below' convention).
    *
    * Pooled LOWER median per group key from the grouped value grid
    * (min v with cum ≥ (n+1) div 2 — the [[graft.scale.GridPrefix]]
    * device, no one-task sort); cells/marginals exact integers; χ²'s
    * per-arm pair of (O−E)²/E terms is one fixed double tree
    * e6-rounded BEFORE the k-term sum (the gTest per-cell discipline
    * — a floating k-cell sum is summation-order-dependent).
    * @param obs (group, arm, value) rows — k arms inside each group
    * @return per (group, arm): (group, arm, n_above, n_le, med_c,
    *         chi2_e6) — χ² broadcast per group; null when any
    *         marginal is empty or k < 2 */
  def moodMedian(obs: DataFrame, groupCol: String, armCol: String,
                 valueCol: String): DataFrame = {
    val g = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(count(lit(1)).as("c"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("c"))
    val med = pre.groupBy(col("grp"))
      .agg(max(col("cum_c")).as("n"))
      .join(pre, Seq("grp"))
      .filter(expr("cum_c >= (n + 1) div 2")) // exact LOWER median rank
      .groupBy(col("grp"), col("n")).agg(min(col("v")).as("med"))
    val cells = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .join(med, Seq("grp"))
      .groupBy(col("grp"), col("arm"), col("med"))
      .agg(sum(when(col("v") > col("med"), 1L).otherwise(0L)).as("n_above"),
           sum(when(col("v") <= col("med"), 1L).otherwise(0L)).as("n_le"))
    val marg = cells.groupBy(col("grp"))
      .agg(sum(col("n_above")).as("tot_above"), sum(col("n_le")).as("tot_le"),
           count(lit(1)).as("k"))
    // per-arm term e6-rounded BEFORE the sum (the gTest per-cell
    // discipline): the k-cell floating sum would otherwise be
    // summation-order-dependent between engines
    val eA = (col("n_above") + col("n_le")).cast("double") *
      col("tot_above") / col("n_tot")
    val eL = (col("n_above") + col("n_le")).cast("double") *
      col("tot_le") / col("n_tot")
    val devA = col("n_above").cast("double") - eA
    val devL = col("n_le").cast("double") - eL
    val chi = cells.join(marg, Seq("grp"))
      .withColumn("n_tot", col("tot_above") + col("tot_le"))
      // empty marginal ⇒ zero expected count: the output is nulled
      // below, but ANSI mode would raise on the 0/0 before the null
      // lands — short-circuit the term
      .withColumn("term_e6",
        when(col("tot_above") === 0L || col("tot_le") === 0L, lit(0L))
          .otherwise(
            round((devA * devA / eA + devL * devL / eL) * 1e6)
              .cast("long")))
      .groupBy(col("grp"))
      .agg(sum(col("term_e6")).as("chi2_e6_sum"), max(col("k")).as("k"),
           min(col("tot_above")).as("ta"), min(col("tot_le")).as("tl"))
    cells.join(chi, Seq("grp"))
      .select(col("grp").as(groupCol), col("arm"), col("n_above"),
        col("n_le"), col("med").as("med_c"),
        when(col("k") < 2L || col("ta") === 0L || col("tl") === 0L,
          lit(null).cast("long"))
          .otherwise(col("chi2_e6_sum")).as("chi2_e6"))
  }

  /** Two-sample Cramér–von Mises test per group (Anderson's rank
    * form) — the WHOLE-CURVE companion to [[ksTest]]: KS reads the
    * single worst CDF gap, [[andersonDarlingK]] weights the tails;
    * CvM integrates the SQUARED gap across the entire distribution,
    * the classic middle ground (more power than KS against diffuse
    * shape changes, less tail-obsessed than AD).
    *
    *   U = n·Σᵢ(rᵢ − i)² + m·Σⱼ(sⱼ − j)²,
    *   T = U/(n·m·N) − (4nm − 1)/(6N),   N = n + m
    *
    * where rᵢ are arm A's pooled ranks and i its own-arm ranks
    * (Anderson 1962). With midranks doubled for ties the per-tie-
    * block contribution has the closed form (D = R2 − 2·pa, the
    * doubled pooled midrank minus twice the arm-prefix):
    *
    *   Σ_{t=1..c}(D − 2t)² = c·D² − 2D·c(c+1) + 4·(c(c+1)(2c+1)/6)
    *
    * — exact longs per grid row (the div-6 is exact: sum-of-squares
    * identity), summed into a decimal(38) U4 = 4U, with T one double
    * tree, e6-rounded. Grid shape: per-group pooled distinct-value
    * grid via [[graft.scale.GridPrefix.groupedPrefixSums]] — the
    * ranking is a distributed prefix, never a one-task sort.
    *
    * @param obs (group, arm, value) rows; arm 0/1; value an exact
    *            integer grid (cents)
    * @return per group: (group, n_a, n_b, u4, t_e6) — t null when
    *         either arm is empty */
  def cramerVonMises(obs: DataFrame, groupCol: String, armCol: String,
                     valueCol: String): DataFrame = {
    val g = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("ca", "cb", "c"))
      .withColumn("r2", lit(2L) * col("cum_before_c") + col("c") + 1L)
    // per-tie-block Σ(pooled − own)² in closed form, per arm (the
    // div 6 is an exact integral division — sum-of-squares identity);
    // first factors ride decimal(38,0): cnt·D² is ~4N³ in the pooled
    // size, past int64 for N ≳ 1.3M rows (the jonckheere g18 rule)
    def blockSq(cnt: String, pre: String) = expr(
      s"CAST($cnt AS DECIMAL(38,0)) * (r2 - 2 * $pre) * (r2 - 2 * $pre)" +
        s" - CAST(2 AS DECIMAL(38,0)) * (r2 - 2 * $pre) * $cnt * ($cnt + 1)" +
        s" + 4 * (CAST($cnt AS DECIMAL(38,0)) * ($cnt + 1) * (2 * $cnt + 1) div 6)")
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val agg = cum
      .withColumn("sqa", blockSq("ca", "cum_before_ca"))
      .withColumn("sqb", blockSq("cb", "cum_before_cb"))
      .groupBy(col("grp"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
           sum(col("sqa").cast(d38)).as("sa"),
           sum(col("sqb").cast(d38)).as("sb"))
      .withColumn("u4",
        col("n_a").cast(d38) * col("sa") + col("n_b").cast(d38) * col("sb"))
    val nD = col("n_a").cast("double")
    val mD = col("n_b").cast("double")
    val bigN = nD + mD
    val t = col("u4").cast("double") / 4.0 / (nD * mD * bigN) -
      (lit(4.0) * nD * mD - 1.0) / (lit(6.0) * bigN)
    agg.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
      col("u4").cast("long").as("u4"),
      when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast("long"))
        .otherwise(round(t * 1e6).cast("long")).as("t_e6"))
  }

  /** Mantel–Haenszel test over stratified 2×2 tables — the
    * CONFOUNDER-PROOF association test: q235's chi-square over one
    * pooled table falls to Simpson's paradox when a stratifier
    * (nation, cohort, source) drives both exposure and outcome; MH
    * pools the per-stratum evidence instead, testing the common odds
    * ratio across strata (Mantel & Haenszel 1959).
    *
    * Per stratum i with cells (a=exposed∧outcome, n1=exposed,
    * m1=outcome, N): E_i = n1·m1/N, V_i = n1·n0·m1·m0/(N²(N−1)),
    * and the continuity-corrected statistic
    *
    *   χ²MH = (|Σa − ΣE| − 1/2)² / ΣV.
    *
    * Ledger rule: E and V are rationals with per-stratum
    * denominators, so each is quantized e6 by one truncating
    * decimal(38) division BEFORE the cross-stratum sum (the ANOVA
    * per-group-rounding rule: the total is summation-order-free).
    * The common odds-ratio estimate rides the same device:
    * OR = Σ(a·d/N) / Σ(b·c/N) with e6-truncated per-stratum terms.
    *
    * @param obs (stratum, exposed, outcome) rows; exposed/outcome
    *            0/1 longs
    * @return per stratum: (stratum, a, n1, m1, n) with the global
    *         (chi2_e6, or_e6) broadcast (q235 output convention);
    *         chi2 null when ΣV = 0, OR null when the denominator
    *         term is 0 */
  def mantelHaenszel(obs: DataFrame, stratumCol: String, expCol: String,
                     outCol: String): DataFrame = {
    val cells = obs
      .select(col(stratumCol).as("st"), col(expCol).cast("long").as("e"),
              col(outCol).cast("long").as("o"))
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("e") === 1L && col("o") === 1L, 1L).otherwise(0L)).as("a"),
           sum(col("e")).as("n1"), sum(col("o")).as("m1"))
      .withColumn("b", col("n1") - col("a"))          // exposed, no outcome
      .withColumn("c", col("m1") - col("a"))          // unexposed, outcome
      .withColumn("d", col("n") - col("n1") - col("c"))
      .withColumn("n0", col("n") - col("n1"))
      .withColumn("m0", col("n") - col("m1"))
    // per-stratum e6-truncated rationals (strata with N < 2 carry
    // zero V by the formula's (N−1) guard; N ≥ 1 always here)
    val quant = cells
      .withColumn("e_e6", expr(
        "CAST(CAST(n1 AS DECIMAL(38,0)) * m1 * 1000000 div n AS BIGINT)"))
      .withColumn("v_e6", expr(
        "CASE WHEN n < 2 THEN 0 ELSE CAST(" +
          "CAST(n1 AS DECIMAL(38,0)) * n0 * m1 * m0 * 1000000" +
          " div (CAST(n AS DECIMAL(38,0)) * n * (n - 1)) AS BIGINT) END"))
      .withColumn("ad_e6", expr(
        "CAST(CAST(a AS DECIMAL(38,0)) * d * 1000000 div n AS BIGINT)"))
      .withColumn("bc_e6", expr(
        "CAST(CAST(b AS DECIMAL(38,0)) * c * 1000000 div n AS BIGINT)"))
    val glob = quant.agg(sum(col("a")).as("sum_a"),
      sum(col("e_e6")).as("sum_e6"), sum(col("v_e6")).as("sum_v6"),
      sum(col("ad_e6")).as("sum_ad6"), sum(col("bc_e6")).as("sum_bc6"))
    // (|Σa·10⁶ − ΣE₆| − 5·10⁵)² / (ΣV₆·10⁶), clamped at 0 before
    // squaring (the standard correction convention)
    val cc = greatest(abs(col("sum_a") * 1000000L - col("sum_e6"))
      - 500000L, lit(0L))
    val chi = cc.cast("double") * cc.cast("double") /
      (col("sum_v6").cast("double") * 1e6)
    val orr = col("sum_ad6").cast("double") / col("sum_bc6")
    quant.select(col("st").as(stratumCol), col("a"), col("n1"),
        col("m1"), col("n"))
      .crossJoin(broadcast(glob.select(
        when(col("sum_v6") <= 0L, lit(null).cast("long"))
          .otherwise(round(chi * 1e6).cast("long")).as("chi2_e6"),
        when(col("sum_bc6") <= 0L, lit(null).cast("long"))
          .otherwise(round(orr * 1e6).cast("long")).as("or_e6"))))
  }

  /** Brunner–Munzel test per group — the modern replacement for
    * [[mannWhitneyU]] when the two arms may differ in VARIANCE or
    * shape (the Behrens–Fisher situation in ranks): MWU's variance
    * assumes exchangeability under H₀; BM studentizes the relative
    * effect P(X &lt; Y) + ½P(X = Y) with per-arm placement variances
    * and a Welch-type df (Brunner & Munzel 2000), so unequal spreads
    * don't masquerade as location shifts.
    *
    * Exact ledger (doubled midranks, value-grid): with R2c the
    * pooled and R2w the within-arm doubled midranks, each member's
    * centered placement scales to the INTEGER
    * u = n·(R2c − R2w) − (ΣR2 − n(n+1)); the arm's variance
    * ingredient is Σc·u² (decimal(38) — u ~ 2N²), and
    * n·S² = Σu²/(4n(n−1)). The statistic and df are two double
    * trees over (NUM2 = n_a·ΣR2_b − n_b·ΣR2_a, Σu²_a, Σu²_b),
    * replayed term-for-term by the oracle. Grid shape: one grouped
    * prefix ([[graft.scale.GridPrefix.groupedPrefixSums]]), no
    * pooled sort.
    *
    * @param obs (group, arm, value) rows; arm 0/1; value an exact
    *            integer grid
    * @return per group: (group, n_a, n_b, w_e6, df_e6) — null when
    *         either arm has n &lt; 2 or both placement variances
    *         vanish */
  def brunnerMunzel(obs: DataFrame, groupCol: String, armCol: String,
                    valueCol: String): DataFrame = {
    val d38s = "decimal(38,0)"
    val g = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
      .groupBy(col("grp"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("ca", "cb", "c"))
      .withColumn("r2c", lit(2L) * col("cum_before_c") + col("c") + 1L)
      .withColumn("r2wa", lit(2L) * col("cum_before_ca") + col("ca") + 1L)
      .withColumn("r2wb", lit(2L) * col("cum_before_cb") + col("cb") + 1L)
    val sums = cum.groupBy(col("grp"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
           sum(col("ca").cast("decimal(38,0)") * col("r2c")).as("sr2a"),
           sum(col("cb").cast("decimal(38,0)") * col("r2c")).as("sr2b"))
    val joined = cum.join(sums, Seq("grp"))
      .withColumn("ua", expr(
        s"CAST(n_a AS $d38s) * (r2c - r2wa) - (sr2a - CAST(n_a AS $d38s) * (n_a + 1))"))
      .withColumn("ub", expr(
        s"CAST(n_b AS $d38s) * (r2c - r2wb) - (sr2b - CAST(n_b AS $d38s) * (n_b + 1))"))
    val agg = joined.groupBy(col("grp"))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
           first(col("sr2a")).as("sr2a"), first(col("sr2b")).as("sr2b"),
           sum(col("ca").cast("decimal(38,0)") * col("ua") * col("ua"))
             .as("su2a"),
           sum(col("cb").cast("decimal(38,0)") * col("ub") * col("ub"))
             .as("su2b"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val vx = col("su2a").cast("double") / (lit(4.0) * nA * (nA - 1.0))
    val vy = col("su2b").cast("double") / (lit(4.0) * nB * (nB - 1.0))
    val num2 = (col("n_a").cast("decimal(38,0)") * col("sr2b") -
      col("n_b").cast("decimal(38,0)") * col("sr2a"))
    val w = num2.cast("double") /
      (lit(2.0) * (col("n_a") + col("n_b")) * sqrt(vx + vy))
    val df = ((vx + vy) * (vx + vy)) /
      (vx * vx / (nA - 1.0) + vy * vy / (nB - 1.0))
    val ok = col("n_a") >= 2L && col("n_b") >= 2L &&
      (vx + vy) > lit(0.0)
    agg.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
      when(ok, round(w * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("w_e6"),
      when(ok, round(df * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("df_e6"))
  }

  /** Grubbs' maximum studentized deviate per group — the one-number
    * outlier audit: G = max|x − x̄|/s (Grubbs 1950), the screening
    * statistic behind every "is the worst point an outlier" gate.
    * Where the quality tiers score rows, this scores the GROUP: a G
    * far above the t-based critical value says the group's extremum
    * is not from the same population.
    *
    * Exactness: the argmax runs on the exact integer deviation
    * |v·n − Σv| (scale-free — no per-row division), ties broken
    * toward the SMALLEST value (the ksTest d_at convention); G is
    * one double tree over (maxdev, n, Σv, Σv²), e6-rounded. The
    * deviation ledger rides decimal(38,0): v·n is past int64 for
    * cents metrics at ≳10⁹ rows.
    *
    * @param obs (group, value) rows; value an exact integer grid
    * @return per group: (group, n, x_at, g_e6) — null g when n &lt; 3
    *         or the group is constant */
  def grubbsMax(obs: DataFrame, groupCol: String,
                valueCol: String): DataFrame = {
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val base = obs.select(col(groupCol).as("grp"),
                          col(valueCol).cast("long").as("v"))
    val mom = base.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
           sum(col("v").cast(d38) * col("v")).as("q"))
    val dev = base.join(mom, Seq("grp"))
      .withColumn("dnum", abs(col("v").cast(d38) * col("n") - col("s1")))
    val arg = dev.groupBy(col("grp"))
      .agg(max(col("dnum")).as("dmax"),
           max_by(col("v"), struct(col("dnum"), -col("v"))).as("x_at"),
           first(col("n")).as("n"), first(col("s1")).as("s1"),
           first(col("q")).as("q"))
    val nD = col("n").cast("double")
    val va = (col("q").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / nD) /
      (nD - 1.0)
    val g = col("dmax").cast("double") / nD / sqrt(va)
    arg.select(col("grp").as(groupCol), col("n"), col("x_at"),
      when(col("n") < 3L || va <= 0.0, lit(null).cast("long"))
        .otherwise(round(g * 1e6).cast("long")).as("g_e6"))
  }

  /** Hodges–Lehmann two-sample shift estimator per group — the
    * ROBUST effect size the rank tests leave implicit:
    * [[mannWhitneyU]] says the arms differ; HL says BY HOW MUCH —
    * the median of all n_a·n_b pairwise differences (x − y), the
    * estimator whose breakdown point and efficiency made it the
    * standard robust shift readout (Hodges & Lehmann 1963).
    *
    * Exactness: the repo's lower-median convention — the smallest
    * difference whose cumulative pair-weight reaches
    * (n_a·n_b + 1) div 2 — so the result is a grid value, not an
    * interpolation.
    *
    * Scale contract (bounded-grid, the trend_fold discipline): pairs
    * are counted on the DISTINCT-VALUE grid — grid_a × grid_b within
    * each group with weight ca·cb — so the cross product is
    * |V_a|·|V_b|, bounded by the value domain (calendar-bucketed
    * sums: months × months), never raw n_a·n_b rows. Feed it
    * calendar-aggregated or quantized metrics, not raw cents.
    *
    * @param obs (group, arm, value) rows; arm 0/1; value an exact
    *            integer grid
    * @return per group: (group, n_a, n_b, n_pairs, hl_c) — null hl
    *         when either arm is empty */
  def hodgesLehmannShift(obs: DataFrame, groupCol: String, armCol: String,
                         valueCol: String): DataFrame = {
    val base = obs
      .select(col(groupCol).as("grp"), col(armCol).cast("long").as("arm"),
              col(valueCol).cast("long").as("v"))
    val ga = base.where(col("arm") === 0L)
      .groupBy(col("grp"), col("v").as("va"))
      .agg(count(lit(1)).as("ca"))
    val gb = base.where(col("arm") === 1L)
      .groupBy(col("grp"), col("v").as("vb"))
      .agg(count(lit(1)).as("cb"))
    val diffs = ga.join(gb, Seq("grp"))            // keyed grid cross
      .groupBy(col("grp"), (col("va") - col("vb")).as("d"))
      .agg(sum(col("ca") * col("cb")).as("w"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(diffs, "grp", "d",
        Seq("w"))
    val tot = diffs.groupBy(col("grp")).agg(sum(col("w")).as("n_pairs"))
    val counts = base.groupBy(col("grp"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"))
    // lower median: the SMALLEST d whose inclusive cumulative weight
    // reaches (W+1) div 2 — min over qualifying grid rows
    cum.join(tot, Seq("grp"))
      .where(expr("cum_w >= (n_pairs + 1) div 2"))
      .groupBy(col("grp"))
      .agg(min(col("d")).as("hl_c"), first(col("n_pairs")).as("n_pairs"))
      .join(counts, Seq("grp"), "right")
      .select(col("grp").as(groupCol), col("n_a"), col("n_b"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("hl_c"))
  }
}
