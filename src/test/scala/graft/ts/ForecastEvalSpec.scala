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
}
