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

  /** Pinball-loss scorecard for QUANTILE forecasts — the yardstick
    * the point-forecast metrics above can't provide: a q-quantile
    * prediction is judged by the asymmetric pinball loss
    * (q·(y−ŷ) when y ≥ ŷ, (1−q)·(ŷ−y) otherwise — the loss whose
    * minimizer IS the q-quantile), plus empirical coverage (the
    * fraction of days y ≤ ŷ, which a calibrated q-quantile holds
    * near q). The evaluated forecaster is the honest baseline every
    * probabilistic model must beat: the exact lower q-quantile of
    * the trailing w OBSERVED days (a ROWS frame — on a series with
    * calendar gaps the w observations span more than w calendar
    * days; a calendar-window variant would pre-densify onto the day
    * grid like the other ts ops, but the baseline's contract is
    * "last w data points", and the oracle replays the same ROWS
    * frame).
    *
    * Exactness: the prediction is an ORDER STATISTIC (index
    * ((w−1)·qn) div qd, a compile-time constant per quantile — no
    * interpolation), per-day losses are exact longs scaled by the
    * quantile denominator, and the two scorecard divisions truncate
    * (decimal(38) guards Σloss·10⁶). Scale shape: one per-key
    * w-row sliding window (w config-bounded — the buffer is w longs
    * per row), quantiles explode a k-literal array; aggregates
    * keyed. Days without a FULL trailing window are skipped (no
    * partial-window optimism).
    *
    * @param quantiles (num, den) pairs, 0 < num < den
    * @return per (key, quantile): (key, q_num, q_den, n_eval,
    *         pinball_e6, cover_e6) */
  def pinballScorecard(daily: DataFrame, keyCol: String, dateCol: String,
                       vCol: String, w: Int = 28,
                       quantiles: Seq[(Int, Int)] =
                         Seq((1, 10), (5, 10), (9, 10))): DataFrame = {
    require(w >= 2 && w <= 3653, "window config-bounded")
    require(quantiles.nonEmpty && quantiles.forall {
      case (n, d) => n > 0 && n < d }, "quantiles in (0, 1)")
    val wk = Window.partitionBy(col("k")).orderBy(col("d"))
      .rowsBetween(-w, -1)
    val qArr = array(quantiles.map { case (n, d) =>
      struct(lit(n.toLong).as("qn"), lit(d.toLong).as("qd"),
             lit(((w - 1) * n) / d + 1).as("idx")) }: _*)
    val base = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .withColumn("hist", collect_list(col("y")).over(wk))
      .filter(size(col("hist")) === w)
      .withColumn("srt", array_sort(col("hist")))
      .withColumn("q", explode(qArr))
      .withColumn("pred", element_at(col("srt"), col("q.idx")))
      .withColumn("loss_d", // pinball loss scaled by qd — exact long
        when(col("y") >= col("pred"),
          col("q.qn") * (col("y") - col("pred")))
          .otherwise((col("q.qd") - col("q.qn")) *
            (col("pred") - col("y"))))
    base.groupBy(col("k"), col("q.qn").as("q_num"), col("q.qd").as("q_den"))
      .agg(count(lit(1)).as("n_eval"), sum(col("loss_d")).as("loss_sum"),
           sum(when(col("y") <= col("pred"), 1L).otherwise(0L))
             .as("n_cover"))
      .select(col("k").as(keyCol), col("q_num"), col("q_den"),
        col("n_eval"),
        expr("CAST(CAST(loss_sum AS DECIMAL(38,0)) * 1000000" +
          " div (n_eval * q_den) AS BIGINT)").as("pinball_e6"),
        expr("n_cover * 1000000 div n_eval").as("cover_e6"))
  }
}
