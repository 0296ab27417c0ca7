package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ForecastEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("seasonalNaiveScorecard: hand-traced m=1 split") {
    // values 10,20,10,30,10,50 on Jan1..6, cutoff Jan4
    // lag-1 rows: (20,10)(10,20) train; (30,10)(10,30)(50,10) hold
    // s_t=20 n_t=2; s_h=80 n_h=3; sm terms 1e6,1e6,1333333
    // mae=80 div 3=26; mase=((8e7 div 3)*2) div 20=2666666
    // smape=3333333 div 3=1111111
    val df = Seq(10L, 20L, 10L, 30L, 10L, 50L).zipWithIndex.map {
      case (y, i) => ("s", java.sql.Date.valueOf(f"2024-01-0${i + 1}"), y)
    }.toDF("k", "d", "y")
    val got = ForecastEval.seasonalNaiveScorecard(
      df, "k", "d", "y", m = 1, cutoff = "2024-01-04").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_train") == 2L)
    assert(r.getAs[Long]("n_hold") == 3L)
    assert(r.getAs[Long]("mae_hold_c") == 26L)
    assert(r.getAs[Long]("mase_e6") == 2666666L)
    assert(r.getAs[Long]("smape_e6") == 1111111L)
  }

  test("seasonalNaiveScorecard: perfectly seasonal series scores 0") {
    // period-2 repeating series: lag-2 forecast is exact
    val df = (1 to 12).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-01-$i%02d"),
       if (i % 2 == 0) 100L else 40L)).toDF("k", "d", "y")
    val got = ForecastEval.seasonalNaiveScorecard(
      df, "k", "d", "y", m = 2, cutoff = "2024-01-08").collect()
    val r = got.head
    assert(r.getAs[Long]("mae_hold_c") == 0L)
    // s_t = 0 -> MASE undefined -> null
    assert(r.isNullAt(r.fieldIndex("mase_e6")))
    assert(r.getAs[Long]("smape_e6") == 0L)
  }

  test("pinballScorecard: hand-traced asymmetric losses, both branches") {
    // rising series, q = 1/2, w = 2: pred = min of trailing two;
    // partial-window days 1-2 are skipped
    val up = (1 to 4).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-01-0$i"), i * 10L))
      .toDF("k", "d", "y")
    val ru = ForecastEval.pinballScorecard(up, "k", "d", "y", w = 2,
        quantiles = Seq((1, 2))).collect().head
    // day3: pred 10, y 30, loss 1·20; day4: pred 20, y 40, loss 1·20
    assert(ru.getAs[Long]("n_eval") == 2L)
    assert(ru.getAs[Long]("pinball_e6") == 10000000L, s"$ru")
    assert(ru.getAs[Long]("cover_e6") == 0L)
    // falling series: the (1−q) branch and full coverage
    val down = (1 to 4).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-01-0$i"), (5 - i) * 10L))
      .toDF("k", "d", "y")
    val rd = ForecastEval.pinballScorecard(down, "k", "d", "y", w = 2,
        quantiles = Seq((1, 2))).collect().head
    // day3: pred 30, y 20, loss 1·10; day4: pred 20, y 10, loss 1·10
    assert(rd.getAs[Long]("pinball_e6") == 5000000L, s"$rd")
    assert(rd.getAs[Long]("cover_e6") == 1000000L)
  }

  test("pinballScorecard: order-statistic indices and a calibrated constant") {
    // constant series: every quantile predicts y exactly — loss 0,
    // coverage 1 (ties count as covered at every q)
    val flat = (1 to 6).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-01-0$i"), 70L)).toDF("k", "d", "y")
    val got = ForecastEval.pinballScorecard(flat, "k", "d", "y", w = 3)
      .collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Long]("pinball_e6") == 0L), s"${got.toSeq}")
    assert(got.forall(_.getAs[Long]("cover_e6") == 1000000L))
  }
}
