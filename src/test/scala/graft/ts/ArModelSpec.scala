package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[ArModel.yuleWalkerAr2]] / [[ArModel.dickeyFuller]] — hand-traced
  * moment sums and closed-form coefficients. */
class ArModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def series(k: String, ys: Seq[Long]) =
    ys.zipWithIndex.map { case (y, i) =>
      (k, d(f"2024-01-${i + 1}%02d"), y)
    }

  test("yuleWalkerAr2: hand-computed phi and forecast on a 4-point line") {
    // y=[1,2,3,4]: z=4y-10=[-6,-2,2,6]; s0=80, s1=20, s2=-24
    // r1=0.25 r2=-0.3 den=0.9375 phi1=0.346667 phi2=-0.386667
    // pred = 2.5 + phi1*1.5 + phi2*0.5 = 2.8266 -> 3
    val df = (series("lin", Seq(1L, 2L, 3L, 4L)) ++
      series("flat", Seq(5L, 5L, 5L, 5L))).toDF("k", "dt", "y")
    val got = ArModel.yuleWalkerAr2(df, "k", "dt", "y").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got("lin") ==
      ((4L, Some(346667L), Some(-386667L), Some(3L))), s"$got")
    // constant series: s0 = 0 -> all null
    assert(got("flat") == ((4L, None, None, None)), s"$got")
  }

  test("yuleWalkerAr2: matches a plain-Scala replica of the same definition") {
    // arbitrary deterministic series — the operator must agree with a
    // local double replay of the identical z-sum + YW formulas
    val ys = Seq(64L, 32L, 16L, 8L, 4L, 2L, 64L, 32L, 16L, 8L, 4L, 2L,
                 64L, 32L, 16L, 8L, 4L, 2L)
    val n = ys.size.toLong
    val total = ys.sum
    val z = ys.map(y => n * y - total)
    def sl(l: Int): Double =
      (l until z.size).map(t => z(t).toDouble * z(t - l)).sum
    val (r1, r2) = (sl(1) / sl(0), sl(2) / sl(0))
    val phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val mean = total.toDouble / n
    val pred = mean + phi1 * (ys.last - mean) +
      phi2 * (ys(ys.size - 2) - mean)
    val got = ArModel.yuleWalkerAr2(series("ar1", ys).toDF("k", "dt", "y"),
        "k", "dt", "y").collect().head
    assert(got.getLong(2) == math.round(phi1 * 1e6), s"$got phi1=$phi1")
    assert(got.getLong(3) == math.round(phi2 * 1e6), s"$got phi2=$phi2")
    assert(got.getLong(4) == math.round(pred), s"$got pred=$pred")
  }

  test("dickeyFuller: hand-computed beta and t on a mean-reverting toy") {
    // y=[10,12,11,13,12]: x=[10,12,11,13], dy=[2,-1,2,-1]
    // m=4 sx=46 sy=2 sxx=534 sxy=17 syy=10
    // sxxc=5 sxyc=-6 syyc=9 beta=-1.2 t=-2.8284271
    val df = series("mr", Seq(10L, 12L, 11L, 13L, 12L)).toDF("k", "dt", "y")
    val got = ArModel.dickeyFuller(df, "k", "dt", "y").collect().head
    assert(got.getLong(1) == 4L)
    assert(got.getLong(2) == -1200000L, s"$got")
    assert(got.getLong(3) == -2828427L, s"$got")
  }

  test("dickeyFuller: random-walk-like drift keeps |t| small; constant x nulls") {
    // y=[1,4,6,10]: x=[1,4,6] dy=[3,2,4]; sxxc=38/3 sxyc=2 syyc=2
    // beta = 6/38 = 0.157895 -> 157895; t = 0.433013 -> 433013
    val walk = series("walk", Seq(1L, 4L, 6L, 10L)).toDF("k", "dt", "y")
    val gotW = ArModel.dickeyFuller(walk, "k", "dt", "y").collect().head
    assert(gotW.getLong(2) == 157895L && gotW.getLong(3) == 433013L,
           s"$gotW")
    // x constant (y flat then one jump at the end gives constant x on
    // only 2 pairs -> m<3 null path; use flat series: x constant -> null)
    val flat = series("flat", Seq(5L, 5L, 5L, 5L, 5L)).toDF("k", "dt", "y")
    val gotF = ArModel.dickeyFuller(flat, "k", "dt", "y").collect().head
    assert(gotF.get(2) == null && gotF.get(3) == null, s"$gotF")
    // deterministic constant-increment walk: perfect fit, SSE = 0 ->
    // beta = 0 reported but t nulled (se = 0 would be 0/0)
    val cw = series("cwalk", Seq(1L, 4L, 7L, 10L)).toDF("k", "dt", "y")
    val gotC = ArModel.dickeyFuller(cw, "k", "dt", "y").collect().head
    assert(gotC.getLong(2) == 0L && gotC.get(3) == null, s"$gotC")
  }
}
