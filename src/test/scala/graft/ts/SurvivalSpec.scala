package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kaplanMeier: the classic textbook curve with censoring") {
    // subjects: events at t=1 (1), t=3 (1); censored at t=2 (1), t=3 (1)
    // plus one censored at t=5
    // t=1: n=5, d=1 -> S = 1e6*4 div 5 = 800000
    // t=2: n=4, d=0, c=1 -> S stays 800000
    // t=3: n=3, d=1, c=1 -> S = 800000*2 div 3 = 533333
    // t=5: n=1, d=0, c=1 -> S stays 533333
    val df = Seq((1L, 1L), (2L, 0L), (3L, 1L), (3L, 0L), (5L, 0L))
      .toDF("dur", "ev")
    val got = Survival.kaplanMeier(df, "dur", "ev")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 5L, 1L, 0L, 800000L),
      (2L, 4L, 0L, 1L, 800000L),
      (3L, 3L, 1L, 1L, 533333L),
      (5L, 1L, 0L, 1L, 533333L)), s"$got")
  }

  test("kaplanMeier: no censoring decays to the empirical survivor") {
    // events at 1,2,3,4: S after t=k is (4-k)/4 on the e6 grid with
    // truncating products: 750000, 500000, 250000, 0
    val df = (1L to 4L).map((_, 1L)).toDF("dur", "ev")
    val got = Survival.kaplanMeier(df, "dur", "ev")
      .orderBy("t").collect().map(_.getLong(4)).toSeq
    assert(got == Seq(750000L, 500000L, 250000L, 0L), s"$got")
  }

  test("nelsonAalen: hand-traced hazard steps and cumulative") {
    // durations: 1(ev) 1(ev) 2(cens) 3(ev): steps
    // t=1: n_risk=4 d=2 h=500000; t=2: n_risk=2 d=0 h=0
    // t=3: n_risk=1 d=1 h=1000000; H: 500000, 500000, 1500000
    val df = Seq((1L, 1L), (1L, 1L), (2L, 0L), (3L, 1L))
      .toDF("dur", "ev")
    val got = Survival.nelsonAalen(df, "dur", "ev")
      .orderBy("t").collect()
      .map(r => (r.getAs[Long]("t"), r.getAs[Long]("n_risk"),
                 r.getAs[Long]("h_e6"), r.getAs[Long]("cum_h_e6"))).toSeq
    assert(got == Seq((1L, 4L, 500000L, 500000L),
                      (2L, 2L, 0L, 500000L),
                      (3L, 1L, 1000000L, 1500000L)), s"$got")
  }

  test("logRank: symmetric arms score zero, separated arms score big") {
    val sym = Seq((1L, 1L, 1L), (1L, 1L, 0L), (3L, 1L, 1L), (3L, 1L, 0L))
      .toDF("dur", "ev", "arm")
    val r0 = Survival.logRank(sym, "dur", "ev", "arm").collect().head
    assert(r0.getAs[Long]("sum_oe_e6") == 0L)
    assert(r0.getAs[Long]("chi2_e6") == 0L)

    val sep = (1 to 10).map(_ => (1L, 1L, 1L)) ++
              (1 to 10).map(_ => (10L, 1L, 0L))
    val r1 = Survival.logRank(sep.toDF("dur", "ev", "arm"),
      "dur", "ev", "arm").collect().head
    assert(r1.getAs[Long]("n_1") == 10L)
    assert(r1.getAs[Long]("events_1") == 10L)
    assert(r1.getAs[Long]("chi2_e6") > 10000000L, r1.toString)
  }
}
