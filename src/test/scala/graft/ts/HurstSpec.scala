package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Hurst.hurstRS]] — the H anchor regimes (trend ≈ 1, alternation
  * ≈ 0) and the degenerate-chunk gate. */
class HurstSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(i: Int) = java.sql.Date.valueOf(
    java.time.LocalDate.of(2023, 1, 1).plusDays(i.toLong))

  private def run(ys: Seq[Long], windows: Seq[Int]) =
    Hurst.hurstRS(
      ys.zipWithIndex.map { case (y, i) => ("s", d(i), y) }
        .toDF("k", "dt", "y"),
      "k", "dt", "y", windows)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .toMap

  test("a pure trend is strongly persistent (H near 1)") {
    val got = run((1 to 128).map(_ * 10L), Seq(8, 16, 32))
    val h = got(8L)._3.get
    assert(h > 850000L, s"h=$h $got")
    // R/S grows with w
    assert(got(32L)._2 > got(8L)._2, s"$got")
  }

  test("a strict alternation is anti-persistent (H near 0)") {
    val got = run((1 to 128).map(i => if (i % 2 == 0) 100L else 0L),
                  Seq(8, 16, 32))
    val h = got(8L)._3.get
    assert(h < 300000L, s"h=$h $got")
  }

  test("constant series: every chunk is zero-variance and excluded") {
    assert(run(Seq.fill(64)(42L), Seq(8, 16)).isEmpty)
  }

  test("partial trailing chunks are dropped; chunk counts match") {
    // 40 points: w=16 -> 2 full chunks, w=8 -> 5
    val got = run((1 to 40).map(i => (i % 7).toLong * 3 + i), Seq(8, 16))
    assert(got(8L)._1 == 5L && got(16L)._1 == 2L, s"$got")
  }
}
