package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-rater agreement — Cohen's κ between two binary verdict
  * columns (two quality gates, a model vs a rule, two dedup passes):
  * how much the raters agree BEYOND the agreement their marginal
  * rates would produce by chance. Raw agreement flatters any pair of
  * gates that both say "keep" 95% of the time; κ subtracts that.
  *
  * Exactness: κ = (p_o − p_e)/(1 − p_e) clears denominators to
  * κ = (n·agree − Σ marginal products) / (n² − Σ marginal products)
  * — every term an exact count product (decimal(38); n·agree
  * overflows int64 past ~3·10⁹ rows), one truncating integer
  * division at the end. One keyed-free aggregate; corpus touched
  * once. */
object Agreement {

  /** @param df rows with two 0/1 (or boolean) verdict columns
    * @return one row: (n, n_agree, kappa_e6) — kappa_e6 null when
    *         the chance-agreement denominator vanishes (a rater is
    *         constant and matches the other's marginal exactly) */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val agg = df.select(col(aCol).cast("long").as("a"),
                        col(bCol).cast("long").as("b"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
           sum(col("a")).as("ma1"), sum(col("b")).as("mb1"))
      // Σ marginal products = ma1·mb1 + ma0·mb0 (the chance-agreement
      // numerator p_e·n²)
      .withColumn("pe_n2",
        col("ma1").cast(d38) * col("mb1") +
          (col("n") - col("ma1")).cast(d38) * (col("n") - col("mb1")))
      .withColumn("den", col("n").cast(d38) * col("n") - col("pe_n2"))
    agg.select(col("n"), col("n_agree"),
      when(col("den") === lit(0), lit(null).cast("long"))
        .otherwise(expr(
          "CAST((CAST(n AS DECIMAL(38,0)) * n_agree - pe_n2) * 1000000" +
            " div den AS BIGINT)")).as("kappa_e6"))
  }

  /** McNemar's test — the PAIRED complement to [[cohenKappa]]: κ asks
    * "do two gates agree beyond chance"; McNemar asks "do they
    * DISAGREE asymmetrically" — b = #(a=1, b=0) vs c = #(a=0, b=1),
    * the question that decides whether replacing gate A with gate B
    * changes the keep set in one direction (marginal homogeneity).
    * The off-diagonal counts alone carry the test; the agreeing
    * pairs are ignored by construction.
    *
    * χ² = (b−c)²/(b+c), plus the Edwards continuity-corrected
    * (max(|b−c|−1, 0))²/(b+c) — the clamp keeps the corrected
    * statistic at 0 for |b−c| ≤ 1 (the correction must never turn
    * perfect symmetry into evidence). Both exact integer numerators
    * with ONE truncating e6 division each ((b−c)² ≤ n² needs
    * decimal(38) past ~3·10⁹ rows). Null when b+c = 0 (no
    * disagreements — the test is undefined, not zero). ONE corpus
    * aggregate.
    * @return one row: (n, b_ct, c_ct, chi2_e6, chi2_cc_e6) */
  def mcnemar(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    df.select(col(aCol).cast("long").as("a"),
              col(bCol).cast("long").as("b"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("a") === 1L && col("b") === 0L, 1L)
                 .otherwise(0L)).as("b_ct"),
           sum(when(col("a") === 0L && col("b") === 1L, 1L)
                 .otherwise(0L)).as("c_ct"))
      .select(col("n"), col("b_ct"), col("c_ct"),
        when(col("b_ct") + col("c_ct") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            s"CAST(CAST(b_ct - c_ct AS $d38) * (b_ct - c_ct) * 1000000" +
              " div (b_ct + c_ct) AS BIGINT)")).as("chi2_e6"),
        when(col("b_ct") + col("c_ct") === 0L, lit(null).cast("long"))
          .otherwise(expr(
            s"CAST(CAST(greatest(abs(b_ct - c_ct) - 1, 0) AS $d38)" +
              " * greatest(abs(b_ct - c_ct) - 1, 0) * 1000000" +
              " div (b_ct + c_ct) AS BIGINT)")).as("chi2_cc_e6"))
  }

  /** Cochran's Q — the k-GATE generalization completing the family:
    * [[mcnemar]] compares TWO binary gates' marginals; Q asks whether
    * k gates (k quality rules, k dedup passes, k classifier
    * thresholds) keep the same fraction of documents, paired on the
    * SAME documents. Reduces to McNemar's (uncorrected) χ² at k = 2.
    *
    * Q = (k−1)·[k·ΣG_j² − T²] / [k·T − ΣL_i²], with G_j the per-gate
    * keep totals, L_i the per-document keep count, T = ΣG_j = ΣL_i.
    * Every term is an exact count aggregate (ΣG_j² ~ k·n² needs
    * decimal(38) past ~3·10⁹ rows), one truncating e6 division at
    * the end; null when the denominator vanishes (every document is
    * kept by all gates or none — no discriminating blocks). ONE
    * corpus aggregate; k is the column list, config-bounded.
    * @param cols 2..20 binary (0/1 or boolean) verdict columns
    * @return one row: (n, k, t_total, q_e6) */
  def cochranQ(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 20, "gate count config-bounded")
    val k = cols.size
    val d38 = "decimal(38,0)"
    val bits = cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("long").as(s"g$i") }
    val rows = df.select(bits: _*)
      .withColumn("l", cols.indices.map(i => col(s"g$i")).reduce(_ + _))
    val aggs = cols.indices.map(i => sum(col(s"g$i")).as(s"t$i")) ++ Seq(
      count(lit(1)).as("n"), sum(col("l")).as("t_total"),
      sum(col("l") * col("l")).as("sl2"))
    val a = rows.agg(aggs.head, aggs.tail: _*)
    val sg2 = cols.indices.map(i =>
      col(s"t$i").cast(d38) * col(s"t$i")).reduce(_ + _)
    a.withColumn("num",
        lit(k).cast(d38) * sg2 - col("t_total").cast(d38) * col("t_total"))
      .withColumn("den",
        lit(k.toLong) * col("t_total") - col("sl2"))
      .select(col("n"), lit(k.toLong).as("k"), col("t_total"),
        when(col("den") <= 0L, lit(null).cast("long"))
          .otherwise(expr(
            s"CAST(CAST(${k - 1} AS $d38) * num * 1000000" +
              " div den AS BIGINT)")).as("q_e6"))
  }

  /** Cronbach's alpha — the internal-consistency coefficient closing
    * the reliability corner: [[Hypothesis.kendallW]] asks whether
    * blocks agree on a RANKING; alpha asks whether k items (k
    * quality gates' scores, k event types' daily volumes) measure
    * ONE underlying quantity — α = k/(k−1)·(1 − Σvar_item/var_total)
    * (Cronbach 1951), the first number read off any composite score.
    *
    * Exactness: the variance ratio collapses to the exact integer
    * rational Σᵢ(n·qᵢ − sᵢ²) / (n·Q − S²) — the (n−1) denominators
    * cancel — with qᵢ/sᵢ the per-item moments and Q/S the moments of
    * the per-subject totals, all decimal(38) aggregates; α is one
    * double tree over the two exact sums, e6-rounded. Null when the
    * total variance vanishes. Subjects with missing items are the
    * caller's contract (complete rows, the [[cochranQ]] shape).
    *
    * @param df one row per subject, `cols` the k item columns
    *           (exact integer scores, e.g. cents)
    * @return one row: (n, k, alpha_e6) — the raw variance ledgers
    *         stay decimal-internal (n·Σt² passes int64 for cents
    *         metrics, so they are not emitted) */
  def cronbachAlpha(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 20, "item count config-bounded")
    val k = cols.size
    val d38 = "decimal(38,0)"
    val items = cols.zipWithIndex.map { case (c, i) =>
      col(c).cast("long").as(s"x$i") }
    val rows = df.select(items: _*)
      .withColumn("t", cols.indices.map(i => col(s"x$i")).reduce(_ + _))
    val aggs = cols.indices.flatMap(i => Seq(
      sum(col(s"x$i")).as(s"s$i"),
      sum(expr(s"CAST(x$i AS $d38) * x$i")).as(s"q$i"))) ++ Seq(
      count(lit(1)).as("n"), sum(col("t")).as("st"),
      sum(expr(s"CAST(t AS $d38) * t")).as("qt"))
    val a = rows.agg(aggs.head, aggs.tail: _*)
    val num = cols.indices.map(i =>
        col("n").cast(d38) * col(s"q$i") -
          col(s"s$i").cast(d38) * col(s"s$i"))
      .reduce(_ + _)
    val den = col("n").cast(d38) * col("qt") -
      col("st").cast(d38) * col("st")
    val alpha = lit(k.toDouble / (k - 1).toDouble) *
      (lit(1.0) - num.cast("double") / den.cast("double"))
    a.select(col("n"), lit(k.toLong).as("k"),
      when(den <= lit(0L).cast(d38), lit(null).cast("long"))
        .otherwise(round(alpha * 1e6).cast("long")).as("alpha_e6"))
  }
}
