package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class IntermittentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("croston: hand-traced two-state EWMA over demand events") {
    // alpha = 0.2; events (Jan1,10) (Jan4,20) (Jan5,5); zero ignored
    // gaps: 1, 3, 1
    // e1: z=10 p=1 rate=10e6
    // e2: z=(2*20+8*10) div 10=12; p=(2*3+8*1) div 10=1; rate=12e6
    // e3: z=(2*5+8*12) div 10=10; p=(2*1+8*1) div 10=1; rate=10e6
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 10L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 0L),
                 ("s", java.sql.Date.valueOf("2024-01-04"), 20L),
                 ("s", java.sql.Date.valueOf("2024-01-05"), 5L))
      .toDF("k", "d", "y")
    val got = Intermittent.croston(df, "k", "d", "y")
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("y_q"), r.getAs[Long]("gap_d"),
                 r.getAs[Long]("size_s"), r.getAs[Long]("interval_s"),
                 r.getAs[Long]("rate_e6"))).toSeq
    assert(got == Seq((10L, 1L, 10L, 1L, 10000000L),
                      (20L, 3L, 12L, 1L, 12000000L),
                      (5L, 1L, 10L, 1L, 10000000L)), s"$got")
  }

  test("croston: interval state stays >= 1 (no division by zero)") {
    val df = (1 to 40).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-${(i - 1) / 28 + 1}%02d-${(i - 1) % 28 + 1}%02d"), 7L))
      .toDF("k", "d", "y")
    val got = Intermittent.croston(df, "k", "d", "y").collect()
    assert(got.forall(_.getAs[Long]("interval_s") >= 1L))
    // steady daily demand of 7 -> rate converges to 7 per period
    assert(got.last.getAs[Long]("rate_e6") == 7000000L)
  }

  test("croston: series with a single event emits its init state") {
    val df = Seq(("a", java.sql.Date.valueOf("2024-03-01"), 42L))
      .toDF("k", "d", "y")
    val got = Intermittent.croston(df, "k", "d", "y").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("rate_e6") == 42000000L)
  }
}
