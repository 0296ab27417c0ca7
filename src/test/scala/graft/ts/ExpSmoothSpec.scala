package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ExpSmoothSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("doubleExpSmooth: hand-traced integer recurrence incl. negative trend") {
    // alpha = 0.2, beta = 0.3 (2/10, 3/10); series 100, 200, 50
    // t0: l=100 b=0 pred=100
    // t1: pred=100; l=(2*200+8*100) div 10 = 120; b=(3*20+7*0) div 10 = 6
    // t2: pred=126; l=(2*50+8*126) div 10 = 110; b=(3*(110-120)+7*6) div 10
    //     = (-30+42) div 10 = 1
    val df = Seq(("s", "2024-01-01", 100L), ("s", "2024-01-02", 200L),
                 ("s", "2024-01-03", 50L))
      .toDF("k", "ds", "y")
      .select(org.apache.spark.sql.functions.col("k"),
              org.apache.spark.sql.functions.to_date(
                org.apache.spark.sql.functions.col("ds")).as("d"),
              org.apache.spark.sql.functions.col("y"))
    val got = ExpSmooth.doubleExpSmooth(df, "k", "d", "y")
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("y_c"), r.getAs[Long]("level_c"),
                 r.getAs[Long]("trend_c"), r.getAs[Long]("pred_c"))).toSeq
    assert(got == Seq((100L, 100L, 0L, 100L),
                      (200L, 120L, 6L, 100L),
                      (50L, 110L, 1L, 126L)), s"$got")
  }

  test("doubleExpSmooth: negative trend divisions truncate toward zero") {
    // falling series exercises negative dividends: 1000, 100
    // t1: l=(200+8000) div 10=820; b=(3*(820-1000)+0) div 10
    //     = -540 div 10 = -54
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 1000L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 100L),
                 ("s", java.sql.Date.valueOf("2024-01-03"), 100L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.doubleExpSmooth(df, "k", "d", "y")
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("level_c"), r.getAs[Long]("trend_c"),
                 r.getAs[Long]("pred_c"))).toSeq
    // t2: pred = 820-54 = 766; l=(200+8*766) div 10=632;
    //     b=(3*(632-820)+7*(-54)) div 10 = (-564-378) div 10
    //     = -942 div 10 = -94 (truncation toward zero)
    assert(got == Seq((1000L, 0L, 1000L), (820L, -54L, 1000L),
                      (632L, -94L, 766L)), s"$got")
  }

  test("tripleExpSmooth: hand-traced m=2 incl. negative seasonal") {
    // alpha=0.2 beta=0.1 gamma=0.3, m=2; series 100, 200, 50, 300
    // t0: l=100 b=0 sv=[0,0] seas=0 pred=100
    // t1 (p=1): pred=100; l=(2*200+8*100) div 10=120;
    //   b=(1*20+9*0) div 10=2; s[1]=(3*(200-120)+0) div 10=24
    // t2 (p=0): pred=120+2+0=122; l=(2*50+8*122) div 10=107;
    //   b=(1*(107-120)+9*2) div 10=0; s[0]=(3*(50-107)+0) div 10=-17
    // t3 (p=1): pred=107+0+24=131; l=(2*(300-24)+8*107) div 10=140;
    //   b=(1*33+0) div 10=3; s[1]=(3*160+7*24) div 10=64
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 100L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 200L),
                 ("s", java.sql.Date.valueOf("2024-01-03"), 50L),
                 ("s", java.sql.Date.valueOf("2024-01-04"), 300L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.tripleExpSmooth(df, "k", "d", "y", m = 2)
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("y_c"), r.getAs[Long]("level_c"),
                 r.getAs[Long]("trend_c"), r.getAs[Long]("seas_c"),
                 r.getAs[Long]("pred_c"))).toSeq
    assert(got == Seq((100L, 100L, 0L, 0L, 100L),
                      (200L, 120L, 2L, 24L, 100L),
                      (50L, 107L, 0L, -17L, 122L),
                      (300L, 140L, 3L, 64L, 131L)), s"$got")
  }

  test("tripleExpSmooth: constant series keeps pred exact, zero seasonals") {
    val df = (1 to 10).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-01-$i%02d"), 500L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.tripleExpSmooth(df, "k", "d", "y")
      .collect()
    assert(got.forall(r => r.getAs[Long]("pred_c") == 500L))
    assert(got.forall(r => r.getAs[Long]("seas_c") == 0L))
    assert(got.forall(r => r.getAs[Long]("trend_c") == 0L))
  }

  test("tripleExpSmoothSeeded: hand-traced m=2 textbook first-cycle init") {
    // alpha=0.2 beta=0.1 gamma=0.3, m=2; series 100, 200, 50, 300
    // seed: lseed=(100+200) div 2=150; sv=[-50, 50]; rows 1-2 emit
    // (l=150, b=0, seas=y-150, pred=NULL)
    // t2 (p=0): pred=150+0-50=100; l=(2*(50+50)+8*150) div 10=140;
    //   b=(1*(140-150)+0) div 10=-1; s[0]=(3*(50-140)+7*(-50)) div 10=-62
    // t3 (p=1): pred=140-1+50=189; l=(2*(300-50)+8*139) div 10=161;
    //   b=(1*(161-140)+9*(-1)) div 10=1; s[1]=(3*139+7*50) div 10=76
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 100L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 200L),
                 ("s", java.sql.Date.valueOf("2024-01-03"), 50L),
                 ("s", java.sql.Date.valueOf("2024-01-04"), 300L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.tripleExpSmoothSeeded(df, "k", "d", "y", m = 2)
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("y_c"), r.getAs[Long]("level_c"),
                 r.getAs[Long]("trend_c"), r.getAs[Long]("seas_c"),
                 Option(r.getAs[Any]("pred_c")).map(_.asInstanceOf[Long]))).toSeq
    assert(got == Seq((100L, 150L, 0L, -50L, None),
                      (200L, 150L, 0L, 50L, None),
                      (50L, 140L, -1L, -62L, Some(100L)),
                      (300L, 161L, 1L, 76L, Some(189L))), s"$got")
  }

  test("tripleExpSmoothSeeded: pure seasonal signal predicts exactly from step m") {
    // y alternates 100/200 (m=2): the seed absorbs the full rhythm,
    // so every post-seed pred is exact and the state never moves —
    // exactly what the all-zero init cannot do in cycle 1
    val df = (1 to 8).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-01-$i%02d"),
       if (i % 2 == 1) 100L else 200L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.tripleExpSmoothSeeded(df, "k", "d", "y", m = 2)
      .orderBy("d").collect()
    val post = got.drop(2)
    assert(post.forall(r => r.getAs[Long]("pred_c") == r.getAs[Long]("y_c")),
      s"${post.map(r => (r.getAs[Long]("y_c"), r.getAs[Long]("pred_c"))).toSeq}")
    assert(got.forall(r => r.getAs[Long]("level_c") == 150L))
    assert(got.forall(r => r.getAs[Long]("trend_c") == 0L))
  }

  test("tripleExpSmoothSeeded: series shorter than m fall back to zero-init rows") {
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 100L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 200L),
                 ("s", java.sql.Date.valueOf("2024-01-03"), 50L))
      .toDF("k", "d", "y")
    val want = ExpSmooth.tripleExpSmooth(df, "k", "d", "y", m = 7)
      .orderBy("d").collect().map(_.toString).toSeq
    val got = ExpSmooth.tripleExpSmoothSeeded(df, "k", "d", "y", m = 7)
      .orderBy("d").collect().map(_.toString).toSeq
    assert(got == want, s"$got vs $want")
  }

  test("tripleExpForecast: projects the final state along the horizon") {
    // m=2 trace from the smoother test: after 4 points the state is
    // l=140 b=3 sv=[-17, 64] t=4
    // h=1: phase (4+0)%2=0 -> 140+3-17=126
    // h=2: phase 1 -> 140+6+64=210; h=3: 140+9-17=132
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 100L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 200L),
                 ("s", java.sql.Date.valueOf("2024-01-03"), 50L),
                 ("s", java.sql.Date.valueOf("2024-01-04"), 300L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.tripleExpForecast(df, "k", "d", "y",
      horizon = 3, m = 2)
      .orderBy("h").collect()
      .map(r => (r.getAs[Long]("h"), r.getDate(1).toString,
                 r.getAs[Long]("pred_c"))).toSeq
    assert(got == Seq((1L, "2024-01-05", 126L),
                      (2L, "2024-01-06", 210L),
                      (3L, "2024-01-07", 132L)), s"$got")
  }

  test("doubleExpSmooth: independent series fold independently") {
    val df = Seq(("a", java.sql.Date.valueOf("2024-01-01"), 10L),
                 ("a", java.sql.Date.valueOf("2024-01-02"), 10L),
                 ("b", java.sql.Date.valueOf("2024-01-01"), 99L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.doubleExpSmooth(df, "k", "d", "y")
      .collect().map(r => (r.getString(0), r.getAs[Long]("pred_c"))).toSet
    assert(got == Set(("a", 10L), ("a", 10L), ("b", 99L)) ||
           got.size == 2, s"$got")
    assert(ExpSmooth.doubleExpSmooth(df, "k", "d", "y").count() == 3)
  }

  test("dampedExpSmooth: hand-traced recurrence with truncated phi*b") {
    // alpha=0.2 beta=0.3 phi=0.9; series 100, 200, 300
    // t0: l=100 b=0 pred=100
    // t1: fb=0; l=120; b=(3*20)/10=6; pred=100
    // t2: fb=(9*6) div 10=5; l=(600+8*125) div 10=160;
    //     b=(3*40+7*5) div 10=15; pred=125
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 100L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 200L),
                 ("s", java.sql.Date.valueOf("2024-01-03"), 300L))
      .toDF("k", "d", "y")
    val got = ExpSmooth.dampedExpSmooth(df, "k", "d", "y")
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("level_c"), r.getAs[Long]("trend_c"),
                 r.getAs[Long]("pred_c"))).toSeq
    assert(got == Seq((100L, 0L, 100L), (120L, 6L, 100L),
                      (160L, 15L, 125L)), s"$got")
  }

  test("dampedExpSmooth: phi = 1 is exactly plain Holt") {
    val df = Seq(("s", java.sql.Date.valueOf("2024-01-01"), 137L),
                 ("s", java.sql.Date.valueOf("2024-01-02"), 991L),
                 ("s", java.sql.Date.valueOf("2024-01-03"), 55L),
                 ("s", java.sql.Date.valueOf("2024-01-04"), 700L))
      .toDF("k", "d", "y")
    val damped = ExpSmooth.dampedExpSmooth(df, "k", "d", "y",
        pNum = 10, pDen = 10).orderBy("d").collect().toSeq
    val holt = ExpSmooth.doubleExpSmooth(df, "k", "d", "y")
      .orderBy("d").collect().toSeq
    assert(damped.map(_.toSeq) == holt.map(_.toSeq))
  }

  test("dampedExpSmooth: the carried trend decays on a flat tail") {
    // jump then flat: plain Holt's trend persists longer; the damped
    // trend must shrink toward 0 strictly faster
    val days = (1 to 20).map(i =>
      ("s", java.sql.Date.valueOf(f"2024-01-$i%02d"),
       if (i <= 2) i * 1000L else 2000L))
    val df = days.toDF("k", "d", "y")
    val tDamped = ExpSmooth.dampedExpSmooth(df, "k", "d", "y")
      .orderBy("d").collect().map(_.getAs[Long]("trend_c")).last
    val tHolt = ExpSmooth.doubleExpSmooth(df, "k", "d", "y")
      .orderBy("d").collect().map(_.getAs[Long]("trend_c")).last
    assert(math.abs(tDamped) <= math.abs(tHolt),
           s"damped=$tDamped holt=$tHolt")
  }

  private def theta(rows: Seq[(String, String, Long)]) =
    ExpSmooth.thetaSmooth(rows
      .toDF("k", "ds", "y")
      .select(org.apache.spark.sql.functions.col("k"),
              org.apache.spark.sql.functions.to_date(
                org.apache.spark.sql.functions.col("ds")).as("d"),
              org.apache.spark.sql.functions.col("y")),
      "k", "d", "y")
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("y_c"), r.getAs[Long]("line_e6"),
                 r.getAs[Long]("ses_e6"), r.getAs[Long]("pred_e6"))).toSeq

  test("thetaSmooth: hand-traced perfect-line case (a=0, b=100)") {
    // y = 100,200,300: OLS line 100·t exactly; z_t = 2y·1e6 − line
    // = t·1e8; SES(α=0.2): 1e8, 1.2e8, 1.56e8; pred: y₁·1e6, then
    // (l_{t−1} + line_t)/2
    val got = theta(Seq(("s", "2024-01-01", 100L),
                        ("s", "2024-01-02", 200L),
                        ("s", "2024-01-03", 300L)))
    assert(got == Seq(
      (100L, 100000000L, 100000000L, 100000000L),
      (200L, 200000000L, 120000000L, 150000000L),
      (300L, 300000000L, 156000000L, 210000000L)), s"$got")
  }

  test("tripleExpSmoothMul: hand-traced m=2 ratio recurrence") {
    // y = 100, 200, 100; α=.2 β=.1 γ=.3, sv init [1e6, 1e6]
    // t2 (p=1): ds=200, l=120, b=2, s[1]=(3·(2e8 div 120)+7e6)div10
    //   = 1199999, pred = 100
    // t3 (p=0): ds=100, l=(200+8·122)div10=117, b=(−3+18)div10=1,
    //   s[0]=(3·(1e8 div 117)+7e6)div10 = 956410, pred = 122
    val df = Seq(("s", "2024-01-01", 100L), ("s", "2024-01-02", 200L),
                 ("s", "2024-01-03", 100L))
      .toDF("k", "ds", "y")
      .select(org.apache.spark.sql.functions.col("k"),
              org.apache.spark.sql.functions.to_date(
                org.apache.spark.sql.functions.col("ds")).as("d"),
              org.apache.spark.sql.functions.col("y"))
    val got = ExpSmooth.tripleExpSmoothMul(df, "k", "d", "y", m = 2)
      .orderBy("d").collect()
      .map(r => (r.getAs[Long]("y_c"), r.getAs[Long]("level_c"),
                 r.getAs[Long]("trend_c"), r.getAs[Long]("seas_e6"),
                 r.getAs[Long]("pred_c"))).toSeq
    assert(got == Seq((100L, 100L, 0L, 1000000L, 100L),
                      (200L, 120L, 2L, 1199999L, 100L),
                      (100L, 117L, 1L, 956410L, 122L)), s"$got")
  }

  test("tripleExpSmoothMul: constant positive series stays flat with unit factors") {
    val df = (1 to 6).map(i => ("s", f"2024-01-0$i", 50L))
      .toDF("k", "ds", "y")
      .select(org.apache.spark.sql.functions.col("k"),
              org.apache.spark.sql.functions.to_date(
                org.apache.spark.sql.functions.col("ds")).as("d"),
              org.apache.spark.sql.functions.col("y"))
    val got = ExpSmooth.tripleExpSmoothMul(df, "k", "d", "y", m = 2)
      .orderBy("d").collect()
    assert(got.forall(_.getAs[Long]("pred_c") == 50L), s"${got.toSeq}")
    assert(got.forall(_.getAs[Long]("seas_e6") == 1000000L))
    assert(got.forall(_.getAs[Long]("trend_c") == 0L))
  }

  test("thetaSmooth: a constant series is predicted exactly; single point safe") {
    val got = theta(Seq(("s", "2024-01-01", 50L),
                        ("s", "2024-01-02", 50L),
                        ("s", "2024-01-03", 50L)))
    assert(got.forall(r => r._4 == 50000000L), s"$got")
    assert(got.forall(r => r._2 == 50000000L && r._3 == 50000000L), s"$got")
    val one = theta(Seq(("s", "2024-01-01", 70L)))
    assert(one == Seq((70L, 70000000L, 70000000L, 70000000L)), s"$one")
  }
}
