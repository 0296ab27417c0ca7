package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class GrangerSpec extends AnyFunSuite {

  // effect is driven by cause at lag 2 plus noise
  private val rnd = new scala.util.Random(11)
  private val n = 200
  private val cause = Array.fill(n)(rnd.nextGaussian())
  private val effect = Array.tabulate(n) { t =>
    0.3 * (if (t > 0) cause(t - 1) else 0.0) +
      1.5 * (if (t > 1) cause(t - 2) else 0.0) + 0.1 * rnd.nextGaussian()
  }
  private val noise = Array.fill(n)(rnd.nextGaussian())

  test("detects true lagged causality with tiny p-value") {
    val res = Granger.test(effect, cause, 4)
    val atLag2 = res.find(_.lag == 2).get
    assert(atLag2.fStat > 50, s"F=${atLag2.fStat}")
    assert(atLag2.pValue < 1e-6)
  }

  test("independent noise is not flagged") {
    val res = Granger.test(effect, noise, 4)
    assert(res.forall(_.pValue > 0.001), res.map(r => r.lag -> r.pValue).toString)
  }

  test("F survival function matches known values") {
    // P(F_{2,10} > 4.10) ≈ 0.05 (standard table)
    assert(math.abs(Granger.fSurvival(4.10, 2, 10) - 0.05) < 0.002)
    // P(F_{1,1} > 161.4) ≈ 0.05
    assert(math.abs(Granger.fSurvival(161.45, 1, 1) - 0.05) < 0.002)
    assert(Granger.fSurvival(0.0, 3, 7) == 1.0)
  }

  test("chi-square survival matches closed forms") {
    // df = 2: Q(x) = exp(-x/2); df = 4: Q(x) = exp(-x/2) (1 + x/2)
    for (x <- Seq(0.5, 1.0, 3.84, 10.0, 25.0)) {
      assert(math.abs(Granger.chiSqSurvival(x, 2) - math.exp(-x / 2)) < 1e-12)
      assert(math.abs(Granger.chiSqSurvival(x, 4) -
                      math.exp(-x / 2) * (1 + x / 2)) < 1e-12)
    }
    // standard table: P(chi2_1 > 3.841) ~= 0.05
    assert(math.abs(Granger.chiSqSurvival(3.841, 1) - 0.05) < 5e-4)
    assert(Granger.chiSqSurvival(0.0, 3) == 1.0)
  }

  test("ssr_chi2/lr/params statistics satisfy their defining identities") {
    val res = Granger.test(effect, cause, 4)
    for (r <- res) {
      val n = effect.length - r.lag
      // chi2 = F * k * n / dfDenom (both scale the same SSR drop)
      assert(math.abs(r.chi2 - r.fStat * r.lag * n.toDouble / r.dfDenom) < 1e-6 * r.chi2,
             s"lag ${r.lag}: chi2 ${r.chi2} vs F-derived")
      // the Wald route re-derives the ssr F (statsmodels-documented
      // equality for OLS, up to numerical precision)
      assert(math.abs(r.paramsF - r.fStat) < 1e-4 * math.max(1.0, r.fStat),
             s"lag ${r.lag}: paramsF ${r.paramsF} vs F ${r.fStat}")
      assert(math.abs(r.paramsP - r.pValue) < 1e-6)
      // LR and chi2 agree asymptotically and bracket each other's scale
      assert(r.lr > 0 == r.chi2 > 0)
      assert(r.pLr >= 0 && r.pLr <= 1 && r.pChi2 >= 0 && r.pChi2 <= 1)
    }
    // the true lag-2 signal is significant under all four tests
    val atLag2 = res.find(_.lag == 2).get
    assert(atLag2.pChi2 < 1e-6 && atLag2.pLr < 1e-6 && atLag2.paramsP < 1e-6)
    // LR = n * ln(ssrR/ssrU) exactly: recompute from chi2's ratio —
    // chi2/n = ssrR/ssrU - 1, so LR must equal n*ln(1 + chi2/n)
    for (r <- res) {
      val n = effect.length - r.lag
      assert(math.abs(r.lr - n * math.log1p(r.chi2 / n)) < 1e-8 * math.max(1.0, r.lr),
             s"lag ${r.lag}: lr ${r.lr}")
    }
  }

  test("independent noise is not flagged by any of the four statistics") {
    val res = Granger.test(effect, noise, 4)
    assert(res.forall(r => r.pChi2 > 0.001 && r.pLr > 0.001 && r.paramsP > 0.001),
           res.map(r => (r.lag, r.pChi2, r.pLr, r.paramsP)).toString)
  }

  test("DataFrame form: one row per (series, lag), causal series flagged") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows =
      effect.indices.map(i => ("causal", new Timestamp(base + i * 3600000L), effect(i), cause(i))) ++
      effect.indices.map(i => ("indep", new Timestamp(base + i * 3600000L), effect(i), noise(i)))
    val df = rows.toDF("series", "ds", "y", "x")
    val out = Granger.causality(df, 3).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(out.size == 6)
    assert(out(("causal", 2)) < 1e-6)
    assert(out(("indep", 2)) > 0.001)
  }
}
