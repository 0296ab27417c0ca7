package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Periodogram.periodogram]] — planted cycles and the centering
  * invariance. */
class PeriodogramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(i: Int) = java.sql.Date.valueOf(
    java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong))

  private def run(ys: Seq[Long], periods: Seq[Int]) =
    Periodogram.periodogram(
      ys.zipWithIndex.map { case (y, i) => ("s", d(i), y) }
        .toDF("k", "dt", "y"),
      "k", "dt", "y", periods)
      .collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
                                  r.getLong(4)))).toMap

  test("a planted 7-day cosine dominates; its amplitude is recovered") {
    // y = 1000 + 500*cos(2π t/7) over 70 days (10 full cycles)
    val ys = (0 until 70).map(t =>
      math.round(1000.0 + 500.0 * math.cos(2 * math.Pi * t / 7)))
    val got = run(ys, Seq(7, 30))
    val (_, amp7, dom7) = got(7L)
    val (_, amp30, dom30) = got(30L)
    assert(dom7 == 1L && dom30 == 0L, s"$got")
    // amplitude within rounding of the planted 500
    assert(math.abs(amp7 - 500L) <= 2L, s"amp7=$amp7")
    assert(amp30 < 100L, s"amp30=$amp30")
  }

  test("mean shift leaves every amplitude unchanged (exact centering)") {
    val ys = (0 until 70).map(t =>
      math.round(1000.0 + 500.0 * math.cos(2 * math.Pi * t / 7)))
    val shifted = ys.map(_ + 100000L)
    assert(run(ys, Seq(7, 30)) == run(shifted, Seq(7, 30)))
  }

  test("a flat series has zero amplitude everywhere") {
    val got = run(Seq.fill(30)(42L), Seq(7, 30))
    assert(got.values.forall(_._2 == 0L), s"$got")
  }

  test("a 30-day cycle beats 7 when that is what was planted") {
    val ys = (0 until 120).map(t =>
      math.round(1000.0 + 300.0 * math.sin(2 * math.Pi * t / 30)))
    val got = run(ys, Seq(7, 30, 91))
    assert(got(30L)._3 == 1L, s"$got")
    assert(math.abs(got(30L)._2 - 300L) <= 2L, s"$got")
  }
}
