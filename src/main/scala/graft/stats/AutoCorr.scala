package graft.stats

/** ACF / PACF estimators with exact statsmodels semantics (SURVEY §2.7).
  *
  * Reference: `core.py:6-27` calls `statsmodels.acf(series, adjusted=False,
  * fft=True, missing="none")` and `statsmodels.pacf(series)` (default
  * method `"ywadjusted"`). Parity notes:
  *   - ACF is the BIASED estimator: autocovariance at every lag is
  *     normalized by n (not n−k) and divided by the lag-0 variance — NOT
  *     Pearson corr(y, lag(y)).
  *   - PACF "ywadjusted" solves the per-lag Yule-Walker system on
  *     ADJUSTED (unbiased, /(n−k)) autocovariances and takes the last
  *     AR coefficient.
  *
  * Pure array math — invoked per series inside `flatMapGroups` (see
  * [[Diagnostics]]); one series per task, all series in parallel.
  */
object AutoCorr {

  /** statsmodels default nlags: min(10·log10(n), n−1). */
  def defaultNlags(n: Int): Int =
    math.min((10 * math.log10(n.toDouble)).toInt, n - 1)

  private def demean(xs: Array[Double]): Array[Double] = {
    val mean = xs.sum / xs.length
    xs.map(_ - mean)
  }

  /** Biased autocorrelation for lags 0..nlags (acf(0) == 1.0). */
  def acf(xs: Array[Double], nlags: Int): Array[Double] = {
    val n = xs.length
    require(n > 0, "acf of empty series")
    val d = demean(xs)
    val c0 = d.map(v => v * v).sum / n
    Array.tabulate(nlags + 1) { k =>
      var s = 0.0
      var t = 0
      while (t + k < n) { s += d(t) * d(t + k); t += 1 }
      (s / n) / c0
    }
  }

  /** Adjusted (unbiased) autocovariances r_0..r_nlags: Σ d_t d_{t+k} / (n−k). */
  private def adjustedAcov(xs: Array[Double], nlags: Int): Array[Double] = {
    val n = xs.length
    val d = demean(xs)
    Array.tabulate(nlags + 1) { k =>
      var s = 0.0
      var t = 0
      while (t + k < n) { s += d(t) * d(t + k); t += 1 }
      s / (n - k)
    }
  }

  /** PACF via per-lag Yule-Walker on adjusted autocovariances
    * (statsmodels method="ywadjusted"); pacf(0) == 1.0. */
  def pacfYWAdjusted(xs: Array[Double], nlags: Int): Array[Double] = {
    require(xs.length > nlags, s"pacf needs n > nlags (${xs.length} <= $nlags)")
    val r = adjustedAcov(xs, nlags)
    val out = new Array[Double](nlags + 1)
    out(0) = 1.0
    for (k <- 1 to nlags) out(k) = yuleWalkerLastCoef(r, k)
    out
  }

  /** Solve the k×k Toeplitz system R φ = r and return φ_k (the AR(k)
    * coefficient at its own order). Direct Gaussian elimination with
    * partial pivoting — k ≤ ~40, O(k³) is negligible per series. */
  private def yuleWalkerLastCoef(r: Array[Double], k: Int): Double = {
    val a = Array.tabulate(k, k)((i, j) => r(math.abs(i - j)))
    val b = Array.tabulate(k)(i => r(i + 1))
    var col = 0
    while (col < k) {
      var p = col
      var i = col + 1
      while (i < k) { if (math.abs(a(i)(col)) > math.abs(a(p)(col))) p = i; i += 1 }
      if (p != col) { val tr = a(p); a(p) = a(col); a(col) = tr
                      val tb = b(p); b(p) = b(col); b(col) = tb }
      val piv = a(col)(col)
      i = col + 1
      while (i < k) {
        val f = a(i)(col) / piv
        if (f != 0.0) {
          var j = col
          while (j < k) { a(i)(j) -= f * a(col)(j); j += 1 }
          b(i) -= f * b(col)
        }
        i += 1
      }
      col += 1
    }
    var i = k - 1
    val x = new Array[Double](k)
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < k) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x(k - 1)
  }
}
