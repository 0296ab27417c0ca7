package graft.ts

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Isotonic.pava]] against hand-pooled cases and the monotonicity
  * invariant. */
class IsotonicSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def series(key: String, ys: Seq[Long]) = {
    import spark.implicits._
    ys.zipWithIndex.map { case (y, i) =>
      (key, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), y)
    }.toDF("series", "ds", "y")
  }

  private def fits(ys: Seq[Long]): Seq[Long] =
    Isotonic.pava(series("s", ys), "series")
      .orderBy(col("ds_sec")).collect().map(_.getLong(3)).toSeq

  test("violator pair pools to its mean") {
    // [1,3,2]: 3 > 2 pools → [1, 2.5, 2.5]
    assert(fits(Seq(1L, 3L, 2L)) ==
      Seq(1000000L, 2500000L, 2500000L))
  }

  test("cascading merge pools across earlier blocks") {
    // [4,3,2]: full pool → mean 3 everywhere
    assert(fits(Seq(4L, 3L, 2L)) ==
      Seq(3000000L, 3000000L, 3000000L))
  }

  test("already-monotone input is returned unchanged") {
    assert(fits(Seq(1L, 2L, 2L, 5L)) ==
      Seq(1000000L, 2000000L, 2000000L, 5000000L))
  }

  test("equal means do not pool (ties are not violations)") {
    // [2,2]: no strict violation — two singleton blocks, same fit
    assert(fits(Seq(2L, 2L)) == Seq(2000000L, 2000000L))
  }

  test("fit is always monotone nondecreasing") {
    val ys = Seq(7L, 1L, 9L, 3L, 3L, 8L, 2L, 10L, 0L, 4L)
    val f = fits(ys)
    assert(f.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)), f)
  }
}
