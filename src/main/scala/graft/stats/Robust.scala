package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust location/scale summaries — the outlier-immune counterparts
  * of mean/stddev for the heavy-tailed metrics (revenue, latency,
  * document length) where a single fat-fingered row moves the
  * classical moments arbitrarily far: the median absolute deviation
  * (50% breakdown scale) and the trimmed mean (bounded-influence
  * location).
  *
  * Both ride the repo's distinct-value-grid discipline: medians are
  * exact LOWER order statistics located by a
  * [[graft.scale.GridPrefix]] distributed prefix (never a one-task
  * sort), partial tie-blocks at the trim boundaries are split
  * exactly, and the only division is one final truncating e6
  * quantization — a SQL oracle replays every step. */
object Robust {

  /** Median absolute deviation per group: MAD = lowermedian(|x −
    * lowermedian(x)|) — two grid-prefix passes (the second grid is
    * the FOLDED |v − med| image of the first, at most the same
    * cardinality).
    *
    * @param obs (group, value) rows; value an exact integer grid
    * @return per group: (group, n, med_c, mad_c) */
  def madScale(obs: DataFrame, groupCol: String,
               valueCol: String): DataFrame = {
    val base = obs.select(col(groupCol).as("grp"),
                          col(valueCol).cast("long").as("v"))
    val g = base.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
    val tot = g.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val med = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("c"))
      .join(tot, Seq("grp"))
      .where(expr("cum_c >= (n + 1) div 2"))
      .groupBy(col("grp"))
      .agg(min(col("v")).as("med"), first(col("n")).as("n"))
    val folded = g.join(med, Seq("grp"))
      .groupBy(col("grp"), abs(col("v") - col("med")).as("d"))
      .agg(sum(col("c")).as("c"))
    graft.scale.GridPrefix.groupedPrefixSums(folded, "grp", "d", Seq("c"))
      .join(med, Seq("grp"))
      .where(expr("cum_c >= (n + 1) div 2"))
      .groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("med")).as("med_c"),
           min(col("d")).as("mad_c"))
      .select(col("grp").as(groupCol), col("n"), col("med_c"),
              col("mad_c"))
  }

  /** Trimmed mean per group: drop the k = (n·tNum) div tDen smallest
    * and k largest observations, average the rest. Partial
    * tie-blocks split exactly: a grid row straddling the lower trim
    * boundary contributes (cum − k) of its c copies (mirrored at the
    * top), so the kept mass is exactly n − 2k regardless of ties.
    *
    * mean_e6 = (kept-sum·10⁶) div (n − 2k) — decimal(38) ledger, one
    * truncating division (Σv·c is past int64 for cents metrics at
    * scale).
    *
    * @param obs (group, value) rows; value an exact integer grid
    * @param tNum/tDen trim fraction per side (default 1/10)
    * @return per group: (group, n, k_trim, lo_c, hi_c,
    *         trimmed_mean_e6) — lo/hi the smallest/largest KEPT
    *         values; null mean when n − 2k ≤ 0 */
  def trimmedMean(obs: DataFrame, groupCol: String, valueCol: String,
                  tNum: Int = 1, tDen: Int = 10): DataFrame = {
    require(tNum >= 0 && 2 * tNum < tDen, "trim fraction in [0, 1/2)")
    val base = obs.select(col(groupCol).as("grp"),
                          col(valueCol).cast("long").as("v"))
    val g = base.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
    val tot = g.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("c"))
      .join(tot, Seq("grp"))
      .withColumn("k", expr(s"n * $tNum div $tDen"))
    // kept copies of this grid row: clamp the rank interval
    // (cum_before, cum] into (k, n − k] — exact tie-block splitting
    val kept = cum.withColumn("kc",
      greatest(lit(0L),
        least(col("cum_c"), col("n") - col("k")) -
          greatest(col("cum_before_c"), col("k"))))
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    kept.groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("k")).as("k_trim"),
           min(when(col("kc") > 0L, col("v"))).as("lo_c"),
           max(when(col("kc") > 0L, col("v"))).as("hi_c"),
           sum(col("v").cast(d38) * col("kc")).as("s"))
      .select(col("grp").as(groupCol), col("n"), col("k_trim"),
        col("lo_c"), col("hi_c"),
        when(col("n") - lit(2L) * col("k_trim") <= 0L,
          lit(null).cast("long"))
          .otherwise(expr("CAST(s * 1000000 div (n - 2 * k_trim)" +
            " AS BIGINT)")).as("trimmed_mean_e6"))
  }

  /** Winsorized mean and variance per group — the third member of
    * the robust-summary triple ([[madScale]] = scale,
    * [[trimmedMean]] = location by DELETION; winsorizing CLAMPS the
    * tails onto the trim boundaries instead, keeping n constant —
    * the moments [[yuenT]] studentizes with, exposed as a summary).
    *
    * Same exact tie-block clamp as [[trimmedMean]]: boundary values
    * lo/hi are the smallest/largest KEPT values, every grid value is
    * clamped into [lo, hi] at full count, moments are decimal(38)
    * sums, mean one truncating e6 division and variance one double
    * tree.
    *
    * @param obs (group, value) rows; value an exact integer grid
    * @param tNum/tDen winsorizing fraction per side (default 1/10)
    * @return per group: (group, n, k_wins, lo_c, hi_c,
    *         wins_mean_e6, wins_var_e6) — null variance when n &lt; 2 */
  def winsorizedStats(obs: DataFrame, groupCol: String, valueCol: String,
                      tNum: Int = 1, tDen: Int = 10): DataFrame = {
    require(tNum >= 0 && 2 * tNum < tDen, "fraction in [0, 1/2)")
    val base = obs.select(col(groupCol).as("grp"),
                          col(valueCol).cast("long").as("v"))
    val g = base.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
    val tot = g.groupBy(col("grp")).agg(sum(col("c")).as("n"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "v",
        Seq("c"))
      .join(tot, Seq("grp"))
      .withColumn("k", expr(s"n * $tNum div $tDen"))
      .withColumn("kc",
        greatest(lit(0L),
          least(col("cum_c"), col("n") - col("k")) -
            greatest(col("cum_before_c"), col("k"))))
    val bounds = cum.groupBy(col("grp"))
      .agg(min(when(col("kc") > 0L, col("v"))).as("lo"),
           max(when(col("kc") > 0L, col("v"))).as("hi"))
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val agg = cum.join(bounds, Seq("grp"))
      .withColumn("wv", greatest(col("lo"), least(col("hi"), col("v"))))
      .groupBy(col("grp"))
      .agg(first(col("n")).as("n"), first(col("k")).as("k_wins"),
           first(col("lo")).as("lo_c"), first(col("hi")).as("hi_c"),
           sum(col("wv").cast(d38) * col("c")).as("ws"),
           sum(col("wv").cast(d38) * col("wv") * col("c")).as("wq"))
    val nD = col("n").cast("double")
    val va = (col("wq").cast("double") -
      col("ws").cast("double") * col("ws").cast("double") / nD) /
      (nD - 1.0)
    agg.select(col("grp").as(groupCol), col("n"), col("k_wins"),
      col("lo_c"), col("hi_c"),
      expr("CAST(ws * 1000000 div n AS BIGINT)").as("wins_mean_e6"),
      when(col("n") < 2L, lit(null).cast("long"))
        .otherwise(round(va * 1e6).cast("long")).as("wins_var_e6"))
  }

  /** Yuen's trimmed t-test per group — the robust two-sample MEANS
    * test: Welch's t (q305) collapses under heavy tails because both
    * its means and its variances are unbounded-influence; Yuen
    * (1974) compares TRIMMED means studentized by WINSORIZED
    * variances with a Welch-type df, keeping the test honest when a
    * few extreme rows would otherwise decide it.
    *
    * Exactness (the [[trimmedMean]] machinery per arm): trim
    * boundaries split tie blocks exactly, the trimmed mean is the
    * exact rational Σv·kc·10⁶ div h, winsorized moments clamp every
    * grid value into [lo, hi] and sum exact decimal(38) S/Q; t and
    * df are two double trees over (tm_a_e6, tm_b_e6, S, Q, n, h),
    * replayed term-for-term by the oracle.
    *
    * @param obs (group, arm, value) rows; arm 0/1; value an exact
    *            integer grid
    * @param tNum/tDen trim fraction per side (default 1/10)
    * @return per group: (group, n_a, n_b, h_a, h_b, tm_a_e6,
    *         tm_b_e6, t_e6, df_e6) — null t/df when either kept
    *         count h ≤ 1 or both winsorized variances vanish */
  def yuenT(obs: DataFrame, groupCol: String, armCol: String,
            valueCol: String, tNum: Int = 1, tDen: Int = 10)
      : DataFrame = {
    require(tNum >= 0 && 2 * tNum < tDen, "trim fraction in [0, 1/2)")
    val base = obs.select(col(groupCol).as("grp"),
                          col(armCol).cast("long").as("arm"),
                          col(valueCol).cast("long").as("v"))
    val g = base.groupBy(col("grp"), col("arm"), col("v"))
      .agg(count(lit(1)).as("c"))
    val tot = g.groupBy(col("grp"), col("arm")).agg(sum(col("c")).as("n"))
    val cum = graft.scale.GridPrefix.groupedPrefixSums(g,
        Seq("grp", "arm"), "v", Seq("c"))
      .join(tot, Seq("grp", "arm"))
      .withColumn("k", expr(s"n * $tNum div $tDen"))
      .withColumn("kc",
        greatest(lit(0L),
          least(col("cum_c"), col("n") - col("k")) -
            greatest(col("cum_before_c"), col("k"))))
    val bounds = cum.groupBy(col("grp"), col("arm"))
      .agg(min(when(col("kc") > 0L, col("v"))).as("lo"),
           max(when(col("kc") > 0L, col("v"))).as("hi"))
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val perArm = cum.join(bounds, Seq("grp", "arm"))
      .withColumn("wv", greatest(col("lo"), least(col("hi"), col("v"))))
      .groupBy(col("grp"), col("arm"))
      .agg(first(col("n")).as("n"), first(col("k")).as("k"),
           sum(col("v").cast(d38) * col("kc")).as("ts"),
           sum(col("wv").cast(d38) * col("c")).as("ws"),
           sum(col("wv").cast(d38) * col("wv") * col("c")).as("wq"))
      .withColumn("h", col("n") - lit(2L) * col("k"))
      .withColumn("tm_e6", expr("CAST(ts * 1000000 div h AS BIGINT)"))
    def arm(i: Int, suffix: String) = perArm.where(col("arm") === i.toLong)
      .select(col("grp"), col("n").as(s"n_$suffix"),
        col("h").as(s"h_$suffix"), col("tm_e6").as(s"tm_${suffix}_e6"),
        col("ws").as(s"ws_$suffix"), col("wq").as(s"wq_$suffix"))
    val wide = arm(0, "a").join(arm(1, "b"), Seq("grp"))
    def dTerm(n: String, h: String, ws: String, wq: String) = {
      val nD = col(n).cast("double")
      val hD = col(h).cast("double")
      val sw = (col(wq).cast("double") -
        col(ws).cast("double") * col(ws).cast("double") / nD) /
        (nD - 1.0)
      sw * (nD - 1.0) / (hD * (hD - 1.0))
    }
    val da = dTerm("n_a", "h_a", "ws_a", "wq_a")
    val db = dTerm("n_b", "h_b", "ws_b", "wq_b")
    val t = (col("tm_a_e6") - col("tm_b_e6")).cast("double") / 1e6 /
      sqrt(da + db)
    val df = ((da + db) * (da + db)) /
      (da * da / (col("h_a").cast("double") - 1.0) +
       db * db / (col("h_b").cast("double") - 1.0))
    val ok = col("h_a") > 1L && col("h_b") > 1L && (da + db) > lit(0.0)
    wide.select(col("grp").as(groupCol), col("n_a"), col("n_b"),
      col("h_a"), col("h_b"), col("tm_a_e6"), col("tm_b_e6"),
      when(ok, round(t * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("t_e6"),
      when(ok, round(df * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("df_e6"))
  }
}
