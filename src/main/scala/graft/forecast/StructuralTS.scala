package graft.forecast

/** Prophet-equivalent structural time-series fitter (SURVEY §2.7 C3-C8).
  *
  * The reference calls `prophet.Prophet` (`app.py:124-137`,
  * `app.py:442-474`), whose MAP estimate (uncertainty via trend
  * simulation, no MCMC) is — per the published "Forecasting at Scale"
  * model — a penalized regression on:
  *   - a piecewise-linear trend basis: intercept, slope, and one hinge
  *     `(t − s_j)₊` per changepoint, changepoints evenly spaced over the
  *     first `changepointRange` of history;
  *   - Fourier seasonal bases (weekly order 3, yearly order 10, daily
  *     order 4 for sub-daily data — Prophet defaults) on absolute
  *     day-of-epoch time;
  *   - optional standardized extra regressors (`add_regressor`,
  *     `app.py:171-178`).
  *
  * Divergences from Prophet (documented, tolerance-band parity):
  *   - Gaussian priors (ridge) instead of Laplace on changepoint deltas;
  *   - logistic growth fit in logit space of capacity utilization rather
  *     than Stan's nonlinear trend (predictions still respect floor/cap
  *     exactly);
  *   - uncertainty via the CLOSED FORM of Prophet's trend-continuation
  *     generative story instead of Monte-Carlo sampling: future
  *     changepoints arrive as a Poisson stream at the historical rate λ
  *     with Laplace(0, b) slope changes (b = mean |historical delta|,
  *     Prophet's own plug-in), so by Campbell's theorem the extra-trend
  *     variance at scaled future time τ is exactly
  *     `V(τ) = λ · 2b² · (τ−1)³ / 3` — the analytic limit of the
  *     sampler as samples → ∞. Intervals are Gaussian quantiles of
  *     N(0, V(τ) + σ_obs²). Deterministic and engine-portable: the
  *     numpy mirror in `tools/golden_gen.py` reproduces every interval
  *     column to float tolerance, so the goldens pin them
  *     (GoldenParitySpec). O(1) per row instead of
  *     O(uncertainty_samples).
  *
  * Pure JVM math, no Spark imports: executed inside `flatMapGroups`
  * tasks by [[Forecaster]], one series per call.
  */
object StructuralTS {

  val DaySeconds: Double = 86400.0

  case class FitSpec(
      growth: String = "linear",              // "linear" | "logistic" | "flat"
      nChangepoints: Int = 25,
      changepointRange: Double = 0.8,
      changepointPriorScale: Double = 0.8,    // reference /analyze default (app.py:38)
      seasonalityPriorScale: Double = 10.0,
      weeklyOrder: Int = 3,
      yearlyOrder: Int = 10,
      dailyOrder: Int = 4,
      intervalWidth: Double = 0.8,            // Prophet default
      /** Accepted for request-contract fidelity (`app.py:125/264`); the
        * closed-form intervals are exact, so sample count no longer
        * affects output (Prophet uses it only for MC precision). */
      uncertaintySamples: Int = 1000,
      floor: Double = 0.0,
      cap: Double = 1.0,
      hasRegressor: Boolean = false,
      regressorPriorScale: Double = 10.0,
      /** C10 prediction quantiles (`app.py:54-58` declares them; the
        * notebook prototype computes `np.quantile` over predictive
        * samples — same generative story here, seeded). */
      quantiles: Seq[Double] = Nil)

  /** Fitted model + everything needed for prediction. */
  case class Model(spec: FitSpec,
                   t0: Double, tScaleSec: Double,      // history time window (epoch sec)
                   yOffset: Double, yScale: Double,    // target scaling
                   changepointsTs: Array[Double],      // scaled-time changepoints
                   beta: Array[Double],                // coefficients on scaled target
                   xMean: Double, xStd: Double,        // regressor standardization
                   sigmaObs: Double,                   // residual std (scaled space)
                   weeklyOn: Boolean, yearlyOn: Boolean, dailyOn: Boolean,
                   deltaMeanAbs: Double)               // mean |changepoint delta| for simulation

  case class Prediction(yhat: Double, yhatLower: Double, yhatUpper: Double,
                        trend: Double, trendLower: Double, trendUpper: Double,
                        additive: Double, additiveLower: Double, additiveUpper: Double,
                        quantileValues: Array[Double] = Array.empty)

  private def logit(p: Double): Double = math.log(p / (1 - p))
  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Transform raw y into fitting space (identity for linear growth,
    * logit of capacity utilization for logistic). */
  private def transformY(y: Double, spec: FitSpec): Double = spec.growth match {
    case "logistic" =>
      val span = spec.cap - spec.floor
      val u = math.min(math.max((y - spec.floor) / span, 1e-6), 1 - 1e-6)
      logit(u)
    case _ => y
  }

  private def invTransformY(z: Double, spec: FitSpec): Double = spec.growth match {
    case "logistic" => spec.floor + (spec.cap - spec.floor) * sigmoid(z)
    case _ => z
  }

  /** Feature vector layout:
    * [0] intercept, [1] slope(tScaled), [2..2+J) hinges,
    * then weekly sin/cos pairs, yearly pairs, daily pairs, then
    * regressor. */
  private def features(tSec: Double, m: Model): Array[Double] = {
    val spec = m.spec
    val j = m.changepointsTs.length
    val nSeas = (if (m.weeklyOn) 2 * spec.weeklyOrder else 0) +
                (if (m.yearlyOn) 2 * spec.yearlyOrder else 0) +
                (if (m.dailyOn) 2 * spec.dailyOrder else 0)
    val p = 2 + j + nSeas + (if (spec.hasRegressor) 1 else 0)
    val out = new Array[Double](p)
    val ts = (tSec - m.t0) / m.tScaleSec
    out(0) = 1.0
    out(1) = if (spec.growth == "flat") 0.0 else ts
    var i = 0
    while (i < j) {
      val d = ts - m.changepointsTs(i)
      out(2 + i) = if (d > 0 && spec.growth != "flat") d else 0.0
      i += 1
    }
    var o = 2 + j
    val day = tSec / DaySeconds
    if (m.weeklyOn) {
      var k = 1
      while (k <= spec.weeklyOrder) {
        val ang = 2 * math.Pi * k * day / 7.0
        out(o) = math.sin(ang); out(o + 1) = math.cos(ang)
        o += 2; k += 1
      }
    }
    if (m.yearlyOn) {
      var k = 1
      while (k <= spec.yearlyOrder) {
        val ang = 2 * math.Pi * k * day / 365.25
        out(o) = math.sin(ang); out(o + 1) = math.cos(ang)
        o += 2; k += 1
      }
    }
    if (m.dailyOn) {
      var k = 1
      while (k <= spec.dailyOrder) {
        val ang = 2 * math.Pi * k * day // period 1 day
        out(o) = math.sin(ang); out(o + 1) = math.cos(ang)
        o += 2; k += 1
      }
    }
    out
    // regressor slot (last) is filled by the caller when present
  }

  /** Fit on history (epoch-second timestamps, raw y, optional regressor). */
  def fit(tSec: Array[Double], yRaw: Array[Double], xReg: Option[Array[Double]],
          spec0: FitSpec): Model = {
    require(tSec.length == yRaw.length && tSec.length >= 2, "need >= 2 observations")
    val n = tSec.length
    val spec = spec0.copy(hasRegressor = xReg.isDefined)

    val t0 = tSec.head
    val tScale = math.max(tSec.last - t0, 1.0)
    val spanDays = (tSec.last - t0) / DaySeconds
    val minGapSec = tSec.sliding(2).map(p => p(1) - p(0)).min
    // Prophet auto-seasonality rules: weekly if span >= 2 weeks and
    // spacing < 1 week; yearly if span >= 2 years; daily if span >= 2
    // days and the data is sub-daily
    val weeklyOn = spanDays >= 14 && minGapSec < 7 * DaySeconds && spec.weeklyOrder > 0
    val yearlyOn = spanDays >= 730 && spec.yearlyOrder > 0
    val dailyOn = spanDays >= 2 && minGapSec < DaySeconds && spec.dailyOrder > 0

    val z = yRaw.map(transformY(_, spec))
    // Prophet scales y by max |y| (after transform we just standardize)
    val yOffset = if (spec.growth == "logistic") 0.0 else 0.0
    val yScaleRaw = z.map(math.abs).max
    val yScale = if (yScaleRaw > 0) yScaleRaw else 1.0
    val zs = z.map(v => (v - yOffset) / yScale)

    // changepoints: evenly spaced indices over first changepointRange of history
    val j = math.min(spec.nChangepoints, math.max(n - 2, 0))
    val cutoff = (spec.changepointRange * n).toInt
    val cps: Array[Double] =
      if (j == 0 || cutoff < 2 || spec.growth == "flat") Array.empty
      else Array.tabulate(j) { i =>
        val idx = math.min(((i + 1).toDouble * cutoff / (j + 1)).toInt, n - 1)
        (tSec(idx) - t0) / tScale
      }.distinct

    val (xMean, xStd) = xReg match {
      case Some(xs) =>
        val mu = xs.sum / xs.length
        val sd = math.sqrt(xs.map(v => (v - mu) * (v - mu)).sum / math.max(xs.length - 1, 1))
        (mu, if (sd > 0) sd else 1.0)
      case None => (0.0, 1.0)
    }

    val preModel = Model(spec, t0, tScale, yOffset, yScale, cps, Array.empty,
                         xMean, xStd, 0.0, weeklyOn, yearlyOn, dailyOn, 0.0)
    val rows = Array.tabulate(n) { i =>
      val f = features(tSec(i), preModel)
      xReg.foreach(xs => f(f.length - 1) = (xs(i) - xMean) / xStd)
      f
    }
    val p = rows(0).length
    val nSeas = (if (weeklyOn) 2 * spec.weeklyOrder else 0) +
                (if (yearlyOn) 2 * spec.yearlyOrder else 0) +
                (if (dailyOn) 2 * spec.dailyOrder else 0)
    val lambda = new Array[Double](p)
    lambda(0) = 1e-8; lambda(1) = 1e-8
    var i = 0
    while (i < cps.length) { lambda(2 + i) = 1.0 / (spec.changepointPriorScale * spec.changepointPriorScale); i += 1 }
    i = 2 + cps.length
    while (i < 2 + cps.length + nSeas) { lambda(i) = 1.0 / (spec.seasonalityPriorScale * spec.seasonalityPriorScale); i += 1 }
    if (spec.hasRegressor)
      lambda(p - 1) = 1.0 / (spec.regressorPriorScale * spec.regressorPriorScale)

    val beta = LinAlg.ridge(rows, zs, lambda)

    var sse = 0.0
    i = 0
    while (i < n) {
      var pred = 0.0
      var k = 0
      while (k < p) { pred += rows(i)(k) * beta(k); k += 1 }
      val r = zs(i) - pred
      sse += r * r
      i += 1
    }
    val sigma = math.sqrt(sse / math.max(n - 1, 1))
    val deltas = beta.slice(2, 2 + cps.length)
    val deltaMeanAbs = if (deltas.nonEmpty) deltas.map(math.abs).sum / deltas.length else 0.0

    preModel.copy(beta = beta, sigmaObs = sigma, deltaMeanAbs = deltaMeanAbs)
  }

  /** Scaled-space trend at scaled time ts (hinge basis dot trend coefs). */
  private def trendScaled(m: Model, ts: Double): Double = {
    var v = m.beta(0) + (if (m.spec.growth == "flat") 0.0 else m.beta(1) * ts)
    var i = 0
    while (i < m.changepointsTs.length) {
      val d = ts - m.changepointsTs(i)
      if (d > 0 && m.spec.growth != "flat") v += m.beta(2 + i) * d
      i += 1
    }
    v
  }

  /** Predict at the given epoch-second timestamps (history and/or
    * future); xReg must align with tSec when the model has a regressor.
    * Returns Prophet's 9 numeric columns (the 13-column public frame adds
    * the constant-zero multiplicative terms). */
  def predict(m: Model, tSec: Array[Double], xReg: Option[Array[Double]]): Array[Prediction] = {
    val spec = m.spec
    val n = tSec.length
    val zLo = (1 - spec.intervalWidth) / 2
    val zHi = 1 - zLo
    val qLo = LinAlg.normInv(zLo)
    val qHi = LinAlg.normInv(zHi)

    // Closed-form trend-continuation uncertainty (see object doc):
    // changepoints after history end arrive as a Poisson stream at the
    // historical rate λ (per unit scaled time) with Laplace(0, b) slope
    // deltas, so extra(τ) = Σ δ_i (τ − loc_i)₊ has mean 0 and, by
    // Campbell's theorem, Var = λ · E[δ²] · ∫₁^τ (τ−u)² du
    //                         = λ · 2b² · (τ−1)³ / 3.
    // Exactly the sampler's limit as samples → ∞; no RNG, bit-portable.
    val histRate = if (m.changepointsTs.nonEmpty)
      m.changepointsTs.length / math.max(m.spec.changepointRange, 1e-9) else 0.0
    val deltaVar = 2.0 * m.deltaMeanAbs * m.deltaMeanAbs // Laplace(0,b): Var = 2b²
    def trendVar(ts: Double): Double =
      if (ts <= 1.0 || histRate <= 0.0) 0.0
      else {
        val h = ts - 1.0
        histRate * deltaVar * h * h * h / 3.0
      }

    Array.tabulate(n) { i =>
      val f = features(tSec(i), m)
      xReg.foreach(xs => f(f.length - 1) = (xs(i) - m.xMean) / m.xStd)
      var zhat = 0.0
      var k = 0
      while (k < f.length) { zhat += f(k) * m.beta(k); k += 1 }
      val ts = (tSec(i) - m.t0) / m.tScaleSec
      val trZ = trendScaled(m, ts)
      val addZ = zhat - trZ

      val vTrend = trendVar(ts)            // 0 on historical rows
      val sTrend = math.sqrt(vTrend)
      // yhat bounds: trend continuation and observation noise are
      // independent, so the predictive spread is the quantile of their
      // SUM'S distribution N(0, V+σ²) — not the sum of two quantiles
      // (which the old sampler approximated and overstates)
      val sTot = math.sqrt(vTrend + m.sigmaObs * m.sigmaObs)

      def out(v: Double) = invTransformY(m.yOffset + v * m.yScale, m.spec)
      val yhat = out(zhat)
      val trend = out(trZ)
      // C10: quantiles commute with the monotone de-transform, so compute
      // them in fitting space and map through out()
      val qvals: Array[Double] =
        if (spec.quantiles.isEmpty) Array.empty
        else spec.quantiles.map(p => out(zhat + LinAlg.normInv(p) * sTot)).toArray
      Prediction(
        yhat = yhat,
        yhatLower = out(zhat + qLo * sTot),
        yhatUpper = out(zhat + qHi * sTot),
        trend = trend,
        trendLower = out(trZ + qLo * sTrend),
        trendUpper = out(trZ + qHi * sTrend),
        additive = out(zhat) - out(trZ),
        additiveLower = out(trZ + addZ + qLo * m.sigmaObs) - out(trZ),
        additiveUpper = out(trZ + addZ + qHi * m.sigmaObs) - out(trZ),
        quantileValues = qvals)
    }
  }

  /** De-standardized regressor coefficient with Wald bounds (C7,
    * `regressor_coefficients`, app.py:241-243). */
  def regressorCoefficient(m: Model): Option[(Double, Double, Double, Double)] =
    if (!m.spec.hasRegressor) None
    else {
      val raw = m.beta.last * m.yScale / m.xStd
      val se = m.sigmaObs * m.yScale / m.xStd // conservative scale for bounds
      val zLo = LinAlg.normInv((1 - m.spec.intervalWidth) / 2)
      Some((raw, raw + zLo * se, raw - zLo * se, m.xMean))
    }
}
