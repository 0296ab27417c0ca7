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
}
