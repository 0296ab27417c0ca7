package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class DtwSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def series(pairs: (String, Seq[Long])*) = pairs.flatMap {
    case (k, vs) => vs.zipWithIndex.map { case (v, i) => (k, i, v) }
  }.toDF("k", "t", "y")

  test("hand-traced DP: dtw([1,2,3],[2,3]) = 1") {
    val got = Dtw.dtwPairs(series("a" -> Seq(1L, 2L, 3L),
                                  "b" -> Seq(2L, 3L)), "k", "t", "y")
      .collect().head
    assert(got.getAs[Long]("n_a") == 3L)
    assert(got.getAs[Long]("n_b") == 2L)
    assert(got.getAs[Long]("dtw") == 1L)
  }

  test("identical series are at distance 0; shifted spike aligns") {
    val df = series(
      "a" -> Seq(0L, 9L, 0L, 0L), "b" -> Seq(0L, 9L, 0L, 0L),
      "c" -> Seq(0L, 0L, 9L, 0L))
    val got = Dtw.dtwPairs(df, "k", "t", "y").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("dtw"))
      .toMap
    assert(got(("a", "b")) == 0L)
    // DTW absorbs the one-step shift entirely (repeat-alignment)
    assert(got(("a", "c")) == 0L)
    assert(got(("b", "c")) == 0L)
  }

  test("pointwise-far but shape-identical beats shape-different") {
    val df = series(
      "x" -> Seq(0L, 10L, 0L),      // spike
      "y" -> Seq(0L, 0L, 10L, 0L),  // shifted spike
      "z" -> Seq(5L, 5L, 5L))       // flat
    val got = Dtw.dtwPairs(df, "k", "t", "y").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("dtw"))
      .toMap
    assert(got(("x", "y")) < got(("x", "z")))
  }
}
