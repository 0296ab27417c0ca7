package graft.ts

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[ControlChart.ewmaChart]] against a hand-traced calibration +
  * recursion (calDays = 2, λ = 2/10, L = 3): cal [10, 14] → μ̂ = 12,
  * s² = 8, band = 12 ± 3·√8·√(0.2/1.8) → [9.171573, 14.828427];
  * charted [20, 6, 40] → z = 13, 11, 16 with alarms 0, 0, 1. */
class ControlChartSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def series(key: String, ys: Seq[Long]) = {
    import spark.implicits._
    ys.zipWithIndex.map { case (y, i) =>
      (key, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), y)
    }.toDF("series", "ds", "y")
  }

  test("hand-traced calibration, recursion, and alarm") {
    val r = ControlChart.ewmaChart(series("s", Seq(10L, 14L, 20L, 6L, 40L)),
        "series", calDays = 2)
      .orderBy(col("ds_sec")).collect()
    assert(r.length == 3)
    assert(r.map(_.getLong(3)).toSeq == Seq(13L, 11L, 16L)) // z_c
    assert(r(0).getLong(4) == 12L)                          // mu_c
    assert(r(0).getLong(5) == 9171573L)                     // lim_lo_e6
    assert(r(0).getLong(6) == 14828427L)                    // lim_hi_e6
    assert(r.map(_.getLong(7)).toSeq == Seq(0L, 0L, 1L))    // alarm
  }

  test("series no longer than the calibration emits nothing") {
    assert(ControlChart.ewmaChart(series("s", Seq(10L, 14L)),
      "series", calDays = 2).count() == 0L)
  }

  test("zero calibration variance emits nothing") {
    assert(ControlChart.ewmaChart(series("s", Seq(5L, 5L, 9L, 9L)),
      "series", calDays = 2).count() == 0L)
  }
}
