package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecast-accuracy scorecard against the seasonal-naive baseline —
  * the backtest yardstick that makes model scores comparable across
  * series of different scales (Hyndman & Koehler 2006): MASE scales
  * the holdout error by the in-sample seasonal-naive error (MASE < 1
  * = "beats naive"), sMAPE is the bounded symmetric percentage error.
  * Here the EVALUATED forecast is itself seasonal-naive (y_{t−m}) —
  * the honest floor every real model must beat; the operator takes
  * any (key, date, actual, forecast) frame via [[scorecard]], and
  * [[seasonalNaiveScorecard]] wires the baseline in.
  *
  * Integer discipline: per-row sMAPE terms are (2e6·|y−f|) div
  * (|y|+|f|) exact longs (0 when both sides are 0); MASE is staged as
  * ((Σ_h·1e6) div n_h) · n_t div Σ_t — truncating at each stage so
  * the oracle replays it bit-for-bit, with the stage order chosen to
  * keep every intermediate under int64 at corpus scale (Σ·1e6 before
  * any cross-count product).
  *
  * Scale shape: one keyed lag window + two keyed aggregates + one
  * keyed join — nothing corpus-global, parallel across series. */
object ForecastEval {

  /** Score per-series seasonal-naive (lag-m) forecasts on a date
    * holdout split.
    *
    * @param cutoff first holdout date (ISO string); rows before it
    *               (with a defined lag) form the MASE denominator
    * @return per key: (key, n_train, n_hold, mae_hold_c, mase_e6,
    *         smape_e6) */
  def seasonalNaiveScorecard(daily: DataFrame, keyCol: String,
                             dateCol: String, vCol: String,
                             m: Int, cutoff: String): DataFrame = {
    require(m >= 1, "season length must be >= 1")
    val wk = Window.partitionBy(col("k")).orderBy(col("d"))
    val lagged = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .withColumn("f", lag(col("y"), m).over(wk))
      .filter(col("f").isNotNull)
      .withColumn("ae", abs(col("y") - col("f")))
    val train = lagged.filter(col("d") < lit(cutoff).cast("date"))
      .groupBy(col("k"))
      .agg(sum(col("ae")).as("s_t"), count(lit(1)).as("n_train"))
    val hold = lagged.filter(col("d") >= lit(cutoff).cast("date"))
      .withColumn("sm",
        when(abs(col("y")) + abs(col("f")) === 0L, 0L)
          .otherwise(expr("(2000000 * ae) div (abs(y) + abs(f))")))
      .groupBy(col("k"))
      .agg(sum(col("ae")).as("s_h"), count(lit(1)).as("n_hold"),
           sum(col("sm")).as("sm_sum"))
    train.join(hold, Seq("k"))
      .select(col("k").as(keyCol), col("n_train"), col("n_hold"),
        expr("s_h div n_hold").as("mae_hold_c"),
        when(col("s_t") === 0L, lit(null))
          .otherwise(expr("((s_h * 1000000) div n_hold) * n_train div s_t"))
          .cast("long").as("mase_e6"),
        expr("sm_sum div n_hold").as("smape_e6"))
  }
}
