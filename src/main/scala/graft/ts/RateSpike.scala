package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-rate spike detection against a trailing baseline — the
  * ops-monitoring primitive ("errors just jumped") as a relational
  * pass: each (series, day) compares its count to the mean of the
  * trailing `baselineDays` ACTIVE days (rows on the day grid —
  * zero-event days don't materialize, so the baseline is a
  * rate-per-active-day) under a Poisson normal approximation,
  * z = (x − μ)/√μ (variance = mean is the Poisson assumption; for
  * counts ≳ 10 the tail approximation is standard monitoring
  * practice).
  *
  * Exactness: baseline sums/counts are exact longs from a keyed
  * trailing window over the DAY grid (rows bounded by the calendar,
  * keyed by series — never a global sort); z is one deterministic
  * double expression e6-rounded; days with an empty or all-zero
  * baseline emit null z (cold start is not a spike).
  *
  * Scale shape: one keyed daily aggregate + one keyed bounded-frame
  * window. */
object RateSpike {

  /** @return per (series, day): (series, day, x, base_sum, base_n,
    *         z_e6, is_spike) with is_spike = z ≥ threshold */
  def rateSpikes(events: DataFrame, seriesCol: String, tsCol: String,
                 baselineDays: Int = 28,
                 thresholdE6: Long = 4000000L): DataFrame = {
    require(baselineDays >= 1, "baselineDays must be >= 1")
    val daily = events
      .select(col(seriesCol).as("s"),
              to_date(date_trunc("day", col(tsCol))).as("d"))
      .groupBy(col("s"), col("d"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("s")).orderBy(col("d"))
      .rowsBetween(-baselineDays, -1)
    daily
      .withColumn("base_sum", coalesce(sum(col("x")).over(w), lit(0L)))
      .withColumn("base_n", count(col("x")).over(w))
      .withColumn("z_e6",
        when(col("base_n") === 0L || col("base_sum") === 0L, lit(null))
          .otherwise(round(
            (col("x") - col("base_sum").cast("double") / col("base_n")) /
            sqrt(col("base_sum").cast("double") / col("base_n")) * 1e6))
          .cast("long"))
      .withColumn("is_spike",
        (col("z_e6").isNotNull && col("z_e6") >= thresholdE6).cast("long"))
      .select(col("s").as(seriesCol), col("d"), col("x"),
              col("base_sum"), col("base_n"), col("z_e6"), col("is_spike"))
  }
}
