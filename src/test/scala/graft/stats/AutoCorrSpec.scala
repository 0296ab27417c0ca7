package graft.stats

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Golden-vector parity with the statsmodels estimators the reference
  * calls (core.py:6-27): biased ACF (adjusted=False) and ywadjusted PACF.
  * Golden values generated offline with numpy implementing the exact
  * published estimator formulas on a fixed seeded AR(2) series. */
class AutoCorrSpec extends AnyFunSuite {

  val vals: Array[Double] = Array(0.496714, 0.159764, 0.594533, 1.83182, 0.686579, -0.371736, 1.150198, 1.569074, 0.126911, 0.147984, -0.4127, -0.757745, -0.088875, -1.739282, -2.741824, -1.685598, -1.201642, 0.098941, -0.488167, -1.734886, 0.571167, 0.63739, 0.278612, -1.448798, -1.497245, -0.352785, -0.913491, -0.066561, -0.366528, -0.491642, -0.786734, 1.527731, 1.139161, -0.832533, -0.018723, -0.982318, -0.37491, -1.889921, -2.349666, -0.645962, 1.055789, 0.99863, 0.166793, -0.500617, -1.82893, -1.667017, -0.91217, 1.009925, 1.223225, -1.332083, -0.842133, -0.490737, -0.718724, 0.327663, 1.443215, 1.69891, -0.252836, -0.970587, -0.175238, 1.161578, 0.270344, -0.371926, -1.410594, -1.930985, 0.077113, 1.981803, 1.093938, 1.065355, 0.672667, -0.561126, -0.17708, 1.600126, 0.977374, 1.67103, -1.910339, -0.82561, 0.164783, 0.047545, 0.070853, -1.959321, -1.41652, 0.094997, 1.959848, 0.62914, -1.018964, -1.301877, 0.439965, 0.983293, -0.071774, 0.175215, 0.223739, 1.050324, -0.138981, -0.726148, -0.786103, -1.717332, -0.498448, 0.477186, 0.44096, -0.113167, -1.615559, -1.356031, -0.671665, -0.798467, -0.438866, 0.380271, 2.246009, 1.408102, 0.428609, -0.239711, -2.191181, -1.269309, -0.044001, 2.817634, 1.51142, 0.363109, -0.270272, -1.439774, 0.36004, 1.399889)

  val goldenAcf: Array[Double] = Array(1.000000000000, 0.443113129072, -0.107813279906, -0.279708094197, -0.145737648601, 0.125846129146, 0.140183729214, 0.058761968057, -0.065353384566, -0.067729087839, -0.027272116364)

  val goldenPacf: Array[Double] = Array(1.000000000000, 0.446836768812, -0.386466900137, -0.067960267628, 0.017770465321, 0.158475818126, -0.099311625254, 0.075562127989, -0.077649884960, 0.066569906530, -0.078154478405)

  test("acf matches statsmodels biased estimator to 1e-9") {
    val got = AutoCorr.acf(vals, 10)
    for (k <- 0 to 10)
      assert(math.abs(got(k) - goldenAcf(k)) < 1e-9, s"acf lag $k: ${got(k)} vs ${goldenAcf(k)}")
  }

  test("pacf matches statsmodels ywadjusted to 1e-9") {
    val got = AutoCorr.pacfYWAdjusted(vals, 10)
    for (k <- 0 to 10)
      assert(math.abs(got(k) - goldenPacf(k)) < 1e-9, s"pacf lag $k: ${got(k)} vs ${goldenPacf(k)}")
  }

  test("defaultNlags = min(10*log10(n), n-1)") {
    assert(AutoCorr.defaultNlags(120) == 20)
    assert(AutoCorr.defaultNlags(5) == 4)
  }

  test("Diagnostics.acfPacf distributes per-series and preserves order semantics") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // two series: the golden series and its reverse — shuffled row order
    val rows = scala.util.Random.shuffle(
      vals.zipWithIndex.toSeq.flatMap { case (v, i) =>
        Seq(("fwd", new Timestamp(base + i * 86400000L), v),
            ("rev", new Timestamp(base + (vals.length - 1 - i) * 86400000L), v))
      })
    val df = rows.toDF("series", "ds", "y")
    val out = Diagnostics.acfPacf(df, "series", Some(10)).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    for (k <- 0 to 10) {
      assert(math.abs(out(("fwd", k))._1 - goldenAcf(k)) < 1e-9)
      assert(math.abs(out(("fwd", k))._2 - goldenPacf(k)) < 1e-9)
      // ACF of the reversed series equals ACF of the original
      assert(math.abs(out(("rev", k))._1 - goldenAcf(k)) < 1e-6)
    }
  }

  test("Diagnostics.ljungBox replays the exact integer recipe; degenerate series null") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def series(name: String, ys: Seq[Double]) =
      ys.zipWithIndex.map { case (v, i) =>
        (name, new Timestamp(base + i * 86400000L), v) }
    // periodic series: strong autocorrelation -> large Q; noise-ish
    // alternation: small; constant and too-short: null
    val periodic = Seq.tabulate(24)(i => 10.0 + (i % 4) * 5.0)
    val rows = series("per", periodic) ++
      series("flat", Seq.fill(12)(7.0)) ++
      series("tiny", Seq(1.0, 2.0, 3.0))
    val out = Diagnostics.ljungBox(rows.toDF("series", "ds", "y"),
        "series", Some(5))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    // plain-Scala replay of the documented recipe for the periodic
    // series
    val a = AutoCorr.acf(periodic.toArray, 5)
    var s = 0L
    for (k <- 1 to 5) {
      val rE6 = BigDecimal(a(k) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      s += rE6 * rE6 / (24 - k)
    }
    val want = (BigInt(24) * 26 * s / 1000000L).toLong
    assert(out("per") == ((24L, 5L, Some(want))), s"${out("per")} vs $want")
    assert(want > 20000000L, s"periodic Q must be large: $want")
    assert(out("flat")._3.isEmpty, s"${out("flat")}")
    assert(out("tiny")._3.isEmpty, s"${out("tiny")}")
  }

  test("Diagnostics.acfPeriod finds a planted weekly season; degenerate series null") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def series(name: String, ys: Seq[Double]) =
      ys.zipWithIndex.map { case (v, i) =>
        (name, new Timestamp(base + i * 86400000L), v) }
    // strong period-7 signal over 10 weeks + a constant series
    val weekly = Seq.tabulate(70)(i =>
      100.0 + 40.0 * math.cos(2 * math.Pi * i / 7.0))
    val rows = series("wk", weekly) ++ series("flat", Seq.fill(30)(3.0))
    val out = Diagnostics.acfPeriod(rows.toDF("series", "ds", "y"),
        "series", minLag = 2, nlags = Some(10))
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    assert(out("wk") == ((Some(7L), Some(1L))), s"${out("wk")}")
    assert(out("flat")._1.isEmpty, s"${out("flat")}")
    // threshold replays the fixed double tree
    val thr = Diagnostics.acfPeriod(rows.toDF("series", "ds", "y"),
        "series", minLag = 2, nlags = Some(10))
      .collect().find(_.getString(0) == "wk").get.getLong(4)
    assert(thr == BigDecimal(1.96 / math.sqrt(70.0) * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  test("Diagnostics.durbinWatson: perfect line null, hand-traced alternation") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def series(name: String, ys: Seq[Long]) =
      ys.zipWithIndex.map { case (v, i) =>
        (name, new Timestamp(base + i * 86400000L), v) }
    // line: residuals identically 0 → null; alternation around a
    // recovered slope-20 line: residuals −2e7, 6e7, −6e7, 2e7 →
    // DW = 2.72e16·1e6/8e15 = 3.4 exactly
    val rows = series("line", Seq(10L, 20L, 30L, 40L)) ++
      series("alt", Seq(0L, 100L, 0L, 100L)) ++
      series("tiny", Seq(5L, 6L))
    val out = Diagnostics.durbinWatson(rows.toDF("series", "ds", "y"),
        "series")
      .collect().map(r => r.getString(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Long])).toMap
    assert(out("line").isEmpty, s"$out")
    assert(out("alt") == Some(3400000L), s"$out")
    assert(out("tiny").isEmpty, s"$out") // n < 3
  }

  test("Diagnostics.runsTest: hand-traced clustered and alternating series") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def series(name: String, ys: Seq[Long]) =
      ys.zipWithIndex.map { case (v, i) =>
        (name, new Timestamp(base + i * 86400000L), v) }
    // clustered: 1,2,3,10,11,12 — med 3 dropped, signs −−+++ →
    //   runs 2, z = (2 − 3.4)/√0.84 = −1.527525
    // alternating: 1,10,2,11,3,12 — med 3 dropped, signs −+−++ →
    //   runs 4, z = 0.6/√0.84 = 0.654654
    val rows = series("cl", Seq(1L, 2L, 3L, 10L, 11L, 12L)) ++
      series("al", Seq(1L, 10L, 2L, 11L, 3L, 12L)) ++
      series("flat", Seq(7L, 7L, 7L))
    val out = Diagnostics.runsTest(rows.toDF("series", "ds", "y"),
        "series")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          Option(r.get(6)).map(_.asInstanceOf[Long])))).toMap
    assert(out("cl") == ((3L, 3L, 2L, 2L, Some(-1527525L))), s"$out")
    assert(out("al") == ((3L, 3L, 2L, 4L, Some(654654L))), s"$out")
    assert(out("flat") == ((7L, 0L, 0L, 0L, None)), s"$out")
  }
}
