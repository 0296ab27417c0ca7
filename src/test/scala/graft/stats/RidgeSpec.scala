package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RidgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("recovers exact coefficients of a noiseless plane") {
    // y = 7 + 3*x1 - 2*x2 on a non-degenerate grid
    val rows = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (7L + 3L * x1 - 2L * x2, x1, x2)
    val got = Ridge.ridge2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head
    assert(got.getAs[Long]("n") == 100L)
    assert(got.getAs[Double]("b0") == 7.0)
    assert(got.getAs[Double]("b1") == 3.0)
    assert(got.getAs[Double]("b2") == -2.0)
  }

  test("singular design (collinear features) yields nulls, not noise") {
    val rows = (1L to 50L).map(i => (2L * i, i, 2L * i)) // x2 = 2*x1
    val got = Ridge.ridge2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head
    assert(got.isNullAt(got.fieldIndex("b1")))
  }

  test("ridge penalty shrinks coefficients toward zero") {
    val rows = for (x1 <- 0L to 9L; x2 <- 0L to 9L)
      yield (10L * x1, x1, x2)
    val ols = Ridge.ridge2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2")
      .collect().head.getAs[Double]("b1")
    val rdg = Ridge.ridge2(rows.toDF("y", "x1", "x2"), "y", "x1", "x2",
      lambda = 500L).collect().head.getAs[Double]("b1")
    assert(ols == 10.0)
    assert(rdg > 0.0 && rdg < 10.0, s"ridge b1=$rdg")
  }
}
