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
