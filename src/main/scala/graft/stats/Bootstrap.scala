package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Poisson-bootstrap confidence intervals — the scale recipe for
  * "how sure are we about this mean": instead of resampling n rows
  * with replacement (which needs global coordination), each row
  * draws an INDEPENDENT Poisson(1) replication weight per replicate
  * (the Poisson bootstrap — Σw ≈ n, the standard large-n
  * approximation), so every replicate is one weighted aggregate and
  * all B replicates run in a single pass over rows × B.
  *
  * Determinism: weights come from the repo's md5 hash point (salt ‖
  * replicate ‖ row id) mapped through the exact e6-truncated
  * Poisson(1) CDF thresholds — reproducible across engines, runs,
  * and partitionings; replicate means are exact truncating longs;
  * the CI bounds are ORDER STATISTICS over the B replicate means
  * picked by rank (no interpolation), keyed windows over B-row
  * groups (B is a config).
  *
  * Scale shape: one explode (×B), one keyed aggregate, one B-row
  * keyed rank per group. */
object Bootstrap {

  /** Exact e6-truncated Poisson(1) CDF thresholds: u ∈ [0, 1e6) maps
    * to weight w = #{thresholds ≤ u}. P(0)=.367879, cumulative. */
  private[graft] val poisCdfE6 = Seq(367879L, 735758L, 919698L,
    980998L, 996323L, 999405L, 999916L)

  /** @return per group: (group, n, b_reps, mean_c, lo_c, hi_c) —
    *         full-sample mean plus the [alpha/2, 1−alpha/2] bootstrap
    *         percentile interval, all exact truncating longs */
  def bootstrapMeanCi(df: DataFrame, groupCol: String, valueCol: String,
                      idCol: String, bReps: Int = 40,
                      alphaE6: Long = 50000L,
                      salt: String = "boot"): DataFrame = {
    require(bReps >= 4, "bReps must be >= 4")
    require(alphaE6 > 0 && alphaE6 < 500000, "alpha in (0, 0.5)")
    val rows = df.select(col(groupCol).as("g"),
                         col(valueCol).cast("long").as("x"),
                         col(idCol).cast("string").as("id"))
    val full = rows.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), expr("sum(x) div count(1)").as("mean_c"))
    val u = pmod(conv(substring(md5(
        concat(lit(salt), col("b").cast("string"), lit("|"), col("id"))),
        1, 8), 16, 10).cast("long"), lit(1000000L))
    val w = poisCdfE6.map(t => when(u >= t, 1L).otherwise(0L))
      .reduce(_ + _)
    val reps = rows
      .withColumn("b", explode(expr(s"sequence(1, $bReps)")))
      .withColumn("w", w)
      .groupBy(col("g"), col("b"))
      .agg(sum(col("w") * col("x")).as("sx"), sum(col("w")).as("sw"))
      .filter(col("sw") > 0L)
      .withColumn("m", expr("sx div sw"))
    // rank the B replicate means; bounds at ranks
    // floor(alpha/2·B)+1 and B − floor(alpha/2·B) (symmetric, exact)
    val loRank = (alphaE6 * bReps / 1000000L) + 1L
    val wRank = Window.partitionBy(col("g")).orderBy(col("m"))
    val ranked = reps.withColumn("rk", row_number().over(wRank).cast("long"))
    val nReps = reps.groupBy(col("g")).agg(count(lit(1)).as("b_reps"))
    val bounds = ranked.join(nReps, Seq("g"))
      .groupBy(col("g"), col("b_reps"))
      .agg(max(when(col("rk") === loRank, col("m"))).as("lo_c"),
           max(when(col("rk") === col("b_reps") - loRank + 1L, col("m")))
             .as("hi_c"))
    full.join(bounds, Seq("g"))
      .select(col("g").as(groupCol), col("n"), col("b_reps"),
              col("mean_c"), col("lo_c"), col("hi_c"))
  }
}
