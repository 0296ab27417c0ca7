package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Autoregressive diagnostics over per-key observation sequences —
  * the model-FIT side of [[graft.stats.AutoCorr]]'s correlograms:
  * a Yule–Walker AR(2) fit with its one-step forecast (the
  * minimal "does yesterday predict today" model the smoothing tier
  * deliberately avoids parameterizing), and the Dickey–Fuller
  * unit-root t-statistic (is the series mean-reverting at all, or a
  * random walk the AR/trend machinery shouldn't be pointed at).
  *
  * Exactness contract (the q240/CUPED discipline): every sum the
  * statistics need is an EXACT integer/decimal aggregate — products
  * promoted to decimal(38) before summing (z² exceeds int64 as soon
  * as n·|deviation| passes ~3·10⁹) — and the final coefficients are
  * single fixed double expressions over those sums, written with the
  * same association in the oracle so both engines evaluate the
  * identical IEEE tree.
  *
  * Scale shape: one ordered window per key for the row index and
  * lags (keyed by series — the documented calendar-bounded-grid
  * contract), then ONE keyed aggregate; nothing is collected, no
  * global sort, no cross-key state. */
object ArModel {

  private def indexed(daily: DataFrame, keyCol: String, dateCol: String,
                      vCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col("k")).orderBy(col("d"))
    val wAll = Window.partitionBy(col("k"))
    daily.select(col(keyCol).as("k"), col(dateCol).as("d"),
                 col(vCol).cast("long").as("y"))
      .withColumn("idx", row_number().over(wOrd).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("y")).over(wAll))
  }

  /** Yule–Walker AR(2) on the time-ordered observation sequence:
    * r_l = S_l/S_0 from the n-scaled deviations z_t = n·y_t − Σy
    * (exact longs; products in decimal(38)), φ₁ = r₁(1−r₂)/(1−r₁²),
    * φ₂ = (r₂−r₁²)/(1−r₁²), and the one-step forecast
    * ŷ = ȳ + φ₁(y_n−ȳ) + φ₂(y_{n−1}−ȳ).
    * @param daily per-key observations, one row per (key, date)
    * @return per key: (key, n_obs, phi1_e6, phi2_e6, pred_v) —
    *         null coefficients when n < 4 or the series is constant */
  def yuleWalkerAr2(daily: DataFrame, keyCol: String, dateCol: String,
                    vCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col("k")).orderBy(col("d"))
    val z = indexed(daily, keyCol, dateCol, vCol)
      .withColumn("z", (col("n") * col("y") - col("total")))
      .withColumn("z1", lag(col("z"), 1).over(wOrd))
      .withColumn("z2", lag(col("z"), 2).over(wOrd))
    val agg = z.groupBy(col("k"), col("n"), col("total"))
      .agg(
        sum(col("z").cast("decimal(38,0)") * col("z")).as("s0"),
        sum(col("z").cast("decimal(38,0)") * col("z1")).as("s1"),
        sum(col("z").cast("decimal(38,0)") * col("z2")).as("s2"),
        max(when(col("idx") === col("n"), col("y"))).as("yn"),
        max(when(col("idx") === col("n") - 1L, col("y"))).as("yn1"))
    val r1 = col("s1").cast("double") / col("s0").cast("double")
    val r2 = col("s2").cast("double") / col("s0").cast("double")
    val den = lit(1.0) - r1 * r1
    val phi1 = r1 * (lit(1.0) - r2) / den
    val phi2 = (r2 - r1 * r1) / den
    val mean = col("total").cast("double") / col("n").cast("double")
    val pred = mean + phi1 * (col("yn").cast("double") - mean) +
      phi2 * (col("yn1").cast("double") - mean)
    // den = 1 − r₁² vanishes iff |S₁| = S₀ (exact decimal compare —
    // S₀² itself would overflow decimal(38))
    val ok = col("n") >= 4L && col("s0") > lit(0) &&
      abs(col("s1")) =!= col("s0")
    agg.select(col("k").as(keyCol), col("n").as("n_obs"),
      when(ok, round(phi1 * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("phi1_e6"),
      when(ok, round(phi2 * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("phi2_e6"),
      when(ok, round(pred).cast("long"))
        .otherwise(lit(null).cast("long")).as("pred_v"))
  }

  /** Dickey–Fuller unit-root test (no augmentation, intercept only):
    * OLS of Δy_t on y_{t−1}, t = β̂/se(β̂). A random walk stays near
    * t ≈ 0; a mean-reverting series drives t strongly negative (the
    * DF tables put the 5% critical value near −2.9 — reported raw,
    * not thresholded). Sums exact (decimal(38) products), β/se/t
    * single fixed double expressions.
    * @return per key: (key, n_pairs, beta_e6, t_e6) — nulls when
    *         n_pairs < 3 or x is constant */
  def dickeyFuller(daily: DataFrame, keyCol: String, dateCol: String,
                   vCol: String): DataFrame = {
    val wOrd = Window.partitionBy(col("k")).orderBy(col("d"))
    val p = indexed(daily, keyCol, dateCol, vCol)
      .withColumn("x", lag(col("y"), 1).over(wOrd))
      .filter(col("x").isNotNull)
      .withColumn("dy", col("y") - col("x"))
    val agg = p.groupBy(col("k"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"),
        sum(col("dy")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("dy")).as("sxy"),
        sum(col("dy").cast("decimal(38,0)") * col("dy")).as("syy"))
    val mD = col("m").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val sxxC = col("sxx").cast("double") - sxD * sxD / mD
    val sxyC = col("sxy").cast("double") - sxD * syD / mD
    val syyC = col("syy").cast("double") - syD * syD / mD
    val beta = sxyC / sxxC
    val se = sqrt((syyC - beta * sxyC) / (mD - lit(2.0)) / sxxC)
    val ok = col("m") >= 3L &&
      col("m").cast("decimal(38,0)") * col("sxx") =!=
        col("sx").cast("decimal(38,0)") * col("sx")
    // a perfect fit (SSE = 0) makes se = 0 and t = 0/0 — null the
    // t-stat rather than ship a NaN neither engine can cast
    val okT = ok && (syyC - beta * sxyC) > lit(0.0)
    agg.select(col("k").as(keyCol), col("m").as("n_pairs"),
      when(ok, round(beta * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("beta_e6"),
      when(okT, round(beta / se * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("t_e6"))
  }
}
