package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DecomposeInventorySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("stlWeekly: constant series decomposes to flat trend, zero seasonal") {
    val days = (1 to 21).map(i => ("s", d(f"2024-01-$i%02d"), 700L))
    val got = Decompose.stlWeekly(days.toDF("k", "dt", "y"), "k", "dt", "y")
      .collect()
    assert(got.length == 21)
    for (r <- got) {
      if (!r.isNullAt(r.fieldIndex("trend_e6"))) {
        assert(r.getAs[Long]("trend_e6") == 700000000L)
        assert(r.getAs[Long]("resid_e6") == 0L)
      }
      assert(r.getAs[Long]("seasonal_e6") == 0L)
    }
    // exactly the 3 edge days on each side lack a trend
    assert(got.count(_.isNullAt(3)) == 6)
  }

  test("stlWeekly: pure weekly signal lands in seasonal, residual ~0") {
    // y = 100*dow (per java DAYOFWEEK 1..7) over 4 full weeks: the
    // 7-day MA is constant mid-series, the weekday means capture the
    // signal exactly, residual 0 on interior days
    val days = (1 to 28).map { i =>
      val dt = d(f"2024-01-$i%02d")
      val cal = java.util.Calendar.getInstance()
      cal.setTime(dt)
      val dow = cal.get(java.util.Calendar.DAY_OF_WEEK)
      ("s", dt, 100L * dow)
    }
    val got = Decompose.stlWeekly(days.toDF("k", "dt", "y"), "k", "dt", "y")
      .collect().filter(!_.isNullAt(3))
    assert(got.nonEmpty)
    for (r <- got)
      assert(math.abs(r.getAs[Long]("resid_e6")) <= 4L,
             s"interior residual ~0 up to rounding: $r")
  }

  test("clampedBalance: stockouts clamp at zero and rebuild from zero") {
    val rows = Seq(
      ("w", d("2024-01-01"), 10L),   // bal 10
      ("w", d("2024-01-02"), -4L),   // bal 6
      ("w", d("2024-01-03"), -9L),   // bal 0, short 3
      ("w", d("2024-01-04"), 5L),    // bal 5 (rebuilds from 0, not -3)
      ("w", d("2024-01-05"), -6L))   // bal 0, short 1
      .toDF("k", "dt", "x")
    val got = Inventory.clampedBalance(rows, "k", "dt", "x")
      .orderBy("dt").collect()
      .map(r => (r.getAs[Long]("balance_c"), r.getAs[Long]("stockout_c")))
      .toSeq
    assert(got == Seq((10L, 0L), (6L, 0L), (0L, 3L), (5L, 0L), (0L, 1L)),
           s"$got")
    // contrast: an unclamped window sum would show 5-6=-1 -> bal 4 on
    // day 4 — the clamp is semantic, not cosmetic
  }

  test("clampedBalance: independent keys fold independently") {
    val rows = Seq(("a", d("2024-01-01"), -5L), ("b", d("2024-01-01"), 7L))
      .toDF("k", "dt", "x")
    val got = Inventory.clampedBalance(rows, "k", "dt", "x")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("balance_c"), r.getAs[Long]("stockout_c")))).toMap
    assert(got("a") == ((0L, 5L)) && got("b") == ((7L, 0L)))
  }

  test("strengths: pure weekly signal is all seasonality, a ramp is all trend") {
    // weekly square wave, zero trend
    val weekly = (1 to 28).map(i =>
      ("w", d(f"2024-01-$i%02d"), if (i % 7 == 0) 700L else 70L))
    // clean linear ramp, no seasonality
    val ramp = (1 to 28).map(i => ("r", d(f"2024-01-$i%02d"), i * 100L))
    val got = Decompose.strengths(
      Decompose.stlWeekly((weekly ++ ramp).toDF("k", "dt", "y"),
        "k", "dt", "y"), "k")
      .collect().map(r => r.getString(0) ->
        ((Option(r.getAs[Any]("trend_strength")).map(_.asInstanceOf[Double]),
          Option(r.getAs[Any]("seasonal_strength")).map(_.asInstanceOf[Double]))))
      .toMap
    val (wT, wS) = got("w")
    assert(wS.exists(_ > 0.95), s"weekly seasonal strength: $wS")
    val (rT, rS) = got("r")
    assert(rT.exists(_ > 0.95), s"ramp trend strength: $rT")
  }
}
