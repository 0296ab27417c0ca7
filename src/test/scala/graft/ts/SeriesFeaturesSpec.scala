package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SeriesFeaturesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def series(vals: Seq[Long]) = vals.zipWithIndex.map {
    case (y, i) => ("s", java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), y)
  }.toDF("k", "d", "y")

  test("moments and extremes match the closed forms") {
    // 2, 4, 6, 8: mean 5, biased var 5, std sqrt(5)
    val r = SeriesFeatures.extract(series(Seq(2L, 4L, 6L, 8L)),
      "k", "d", "y").collect().head
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("min_v") == 2L)
    assert(r.getAs[Long]("max_v") == 8L)
    assert(r.getAs[Double]("mean_v") == 5.0)
    assert(math.abs(r.getAs[Double]("std_v") - math.sqrt(5.0)) < 1e-6)
    // strictly increasing: slope = 2, acf1 of a line on 4 pts = 0.25
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Long]("crossings") == 1L)
  }

  test("acf1 matches the biased sample autocorrelation (numpy check)") {
    // y = 1,2,1,2,1,2: mean 1.5, dev ±0.5; num = 5*(-0.25) = -1.25
    // den = 6*0.25 = 1.5 -> acf1 = -0.833333
    val r = SeriesFeatures.extract(series(Seq(1L, 2L, 1L, 2L, 1L, 2L)),
      "k", "d", "y").collect().head
    assert(r.getAs[Double]("acf1") == -0.833333)
    assert(r.getAs[Long]("crossings") == 5L)
  }

  test("constant series: zero std, null acf1, zero slope, no crossings") {
    val r = SeriesFeatures.extract(series(Seq(7L, 7L, 7L)),
      "k", "d", "y").collect().head
    assert(r.getAs[Double]("std_v") == 0.0)
    assert(r.isNullAt(r.fieldIndex("acf1")))
    assert(r.getAs[Double]("slope") == 0.0)
    assert(r.getAs[Long]("crossings") == 0L)
  }

  test("single-point series: null slope, n = 1") {
    val r = SeriesFeatures.extract(series(Seq(9L)), "k", "d", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 1L)
    assert(r.isNullAt(r.fieldIndex("slope")))
  }
}
