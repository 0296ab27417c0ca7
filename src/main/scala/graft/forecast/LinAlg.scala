package graft.forecast

/** Minimal dense linear algebra for the forecaster's normal equations.
  * Basis dimensionality is ≤ ~60 (trend + changepoints + Fourier +
  * regressors), so an O(p³) dense solve per series is microseconds —
  * no BLAS dependency needed, and everything stays executor-local. */
object LinAlg {

  /** Solve A x = b in place (Gaussian elimination, partial pivoting).
    * A is destroyed. */
  def solveInPlace(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var col = 0
    while (col < n) {
      var p = col
      var i = col + 1
      while (i < n) { if (math.abs(a(i)(col)) > math.abs(a(p)(col))) p = i; i += 1 }
      if (p != col) { val tr = a(p); a(p) = a(col); a(col) = tr
                      val tb = b(p); b(p) = b(col); b(col) = tb }
      val piv = a(col)(col)
      require(math.abs(piv) > 1e-300, s"singular system at column $col")
      i = col + 1
      while (i < n) {
        val f = a(i)(col) / piv
        if (f != 0.0) {
          var j = col
          while (j < n) { a(i)(j) -= f * a(col)(j); j += 1 }
          b(i) -= f * b(col)
        }
        i += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** Ridge-regularized least squares: solve (XᵀX + diag(λ)) β = Xᵀy.
    * Single pass over rows to accumulate the normal equations — O(n·p²)
    * time, O(p²) memory regardless of series length. */
  def ridge(x: Array[Array[Double]], y: Array[Double], lambda: Array[Double]): Array[Double] = {
    val n = x.length
    val p = x(0).length
    val ata = Array.ofDim[Double](p, p)
    val aty = new Array[Double](p)
    var r = 0
    while (r < n) {
      val row = x(r)
      val yr = y(r)
      var i = 0
      while (i < p) {
        val v = row(i)
        if (v != 0.0) {
          aty(i) += v * yr
          var j = i
          while (j < p) { ata(i)(j) += v * row(j); j += 1 }
        }
        i += 1
      }
      r += 1
    }
    var i = 0
    while (i < p) {
      ata(i)(i) += lambda(i)
      var j = 0
      while (j < i) { ata(i)(j) = ata(j)(i); j += 1 }
      i += 1
    }
    solveInPlace(ata, aty)
  }

  /** Standard normal inverse CDF (Acklam's rational approximation,
    * |rel err| < 1.15e-9) — deterministic quantiles for interval bounds. */
  def normInv(p: Double): Double = {
    require(p > 0 && p < 1, s"normInv domain: $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
                  1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
                  6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
                  -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
                  3.754408661907416e+00)
    val pLow = 0.02425
    if (p < pLow) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pLow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      -normInv(1 - p)
    }
  }
}
