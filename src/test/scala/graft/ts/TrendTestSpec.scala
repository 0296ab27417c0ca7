package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TrendTest.mannKendall]] / [[TrendTest.theilSen]] — hand-traced
  * pair statistics small enough to enumerate. */
class TrendTestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("mannKendall: monotone series hit the closed-form z; direction is antisymmetric") {
    // n=5 strictly increasing: S=10, var18 = 5*4*15 = 300,
    // z = 9/sqrt(300/18) -> 2204541 e6 (continuity-corrected)
    val df = (1 to 5).flatMap(i => Seq(
        ("up", d(f"2024-01-0$i"), i * 10L),
        ("down", d(f"2024-01-0$i"), 100L - i * 10L)))
      .toDF("k", "dt", "y")
    val got = TrendTest.mannKendall(df, "k", "dt", "y").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got("up") == ((5L, 10L, 300L, Some(2204541L))), s"$got")
    assert(got("down") == ((5L, -10L, 300L, Some(-2204541L))), s"$got")
  }

  test("mannKendall: tie correction and the all-tied null") {
    // 1,2,2,3: S=5; tie18 = 2*1*9 = 18; var18 = 4*3*13 - 18 = 138;
    // z = 4/sqrt(138/18) -> 1444630 e6
    val df = Seq(("t", d("2024-01-01"), 1L), ("t", d("2024-01-02"), 2L),
                 ("t", d("2024-01-03"), 2L), ("t", d("2024-01-04"), 3L),
                 ("flat", d("2024-01-01"), 7L), ("flat", d("2024-01-02"), 7L),
                 ("flat", d("2024-01-03"), 7L))
      .toDF("k", "dt", "y")
    val got = TrendTest.mannKendall(df, "k", "dt", "y").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got("t") == ((4L, 5L, 138L, Some(1444630L))), s"$got")
    // all tied: var18 = 3*2*11 - 3*2*11 = 0 -> z null
    assert(got("flat") == ((3L, 0L, 0L, None)), s"$got")
  }

  test("theilSen: exact slope on a clean line; one outlier cannot drag the median") {
    val clean = (0 until 5).map(i => ("line", d(f"2024-01-0${i + 1}"), 10L + 2L * i))
    val dirty = (0 until 4).map(i => ("out", d(f"2024-01-0${i + 1}"), 10L + 2L * i)) :+
      (("out", d("2024-01-05"), 1000L))
    val got = TrendTest.theilSen((clean ++ dirty).toDF("k", "dt", "y"),
        "k", "dt", "y").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("line") == ((10L, 2000000L)), s"$got")
    // 6 of 10 pair slopes are exactly 2 -> lower median (rank 5) = 2e6
    assert(got("out") == ((10L, 2000000L)), s"$got")
  }

  test("theilSen: gaps divide by the real day span; negative slopes truncate toward zero") {
    // days 1 and 8 (dx=7), y 0 -> -10: slope_e6 = -10000000 div 7 = -1428571
    // (truncation toward zero in BOTH engines — the q260 probe)
    val df = Seq(("g", d("2024-01-01"), 0L), ("g", d("2024-01-08"), -10L))
      .toDF("k", "dt", "y")
    val got = TrendTest.theilSen(df, "k", "dt", "y").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, -1428571L)), s"$got")
  }

  test("seasonalMannKendall: year-over-year trend inside seasons hits the closed form") {
    // 3 seasons × 2 years, each season rising year-over-year:
    // per season S_g = 1, v_g = 2·1·9 = 18 → S = 3, var18 = 54,
    // z = (3−1)/√(54/18) = 2/√3 = 1.1547005
    val rows = for (y <- 0 to 1; g <- 1 to 3) yield
      ("k", d(f"202${4 + y}-0$g-01"), 100L * g + y, g.toLong)
    val got = TrendTest.seasonalMannKendall(rows.toDF("k", "dt", "y", "g"),
        "k", "dt", "y", "g").collect().head
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
            got.getLong(4)) == ((3L, 6L, 3L, 54L)), s"$got")
    assert(got.getLong(5) ==
      math.round(2.0 / math.sqrt(54.0 / 18.0) * 1e6), s"$got")
  }

  test("seasonalMannKendall: a pure cycle is NULL where plain MK sees signal") {
    // strict 4-season cycle repeated 3 years: within each season the
    // values are constant → every per-season variance term is 0 →
    // var18 = 0, z null; the PLAIN test on the same rows has a
    // nonzero variance (the cycle masquerades as pair signal)
    val rows = for (y <- 0 to 2; g <- 1 to 4) yield
      ("k", d(f"202${4 + y}-0$g-01"), 10L * g, g.toLong)
    val seasonal = TrendTest.seasonalMannKendall(
      rows.toDF("k", "dt", "y", "g"), "k", "dt", "y", "g")
      .collect().head
    assert(seasonal.getLong(4) == 0L && seasonal.isNullAt(5), s"$seasonal")
    val plain = TrendTest.mannKendall(
      rows.toDF("k", "dt", "y", "g"), "k", "dt", "y").collect().head
    assert(plain.getLong(3) > 0L, s"$plain")
  }
}
