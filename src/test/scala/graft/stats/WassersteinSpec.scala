package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class WassersteinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("point masses: W1 equals the distance between them") {
    // A all at 0, B all at 10 -> W1 = 10
    val df = (Seq.fill(4)(("A", 0L)) ++ Seq.fill(4)(("B", 10L)))
      .toDF("g", "v")
    val r = Wasserstein.emd1dPairs(df, "g", "v").collect().head
    assert(r.getAs[Double]("emd") == 10.0)
  }

  test("hand-traced mixed case matches scipy.wasserstein_distance") {
    // A = {0, 1}, B = {1, 2}: W1 = 1 (shift every point by 1... the
    // optimal coupling moves 0->1 and 1->2, mean move = 1)
    val df = Seq(("A", 0L), ("A", 1L), ("B", 1L), ("B", 2L))
      .toDF("g", "v")
    val r = Wasserstein.emd1dPairs(df, "g", "v").collect().head
    assert(r.getAs[Double]("emd") == 1.0)
  }

  test("identical distributions are at distance 0; scale by weights") {
    // A = {0,0,10}, B = {0,0,10}; C = {0,10,10}
    val df = Seq(("A", 0L), ("A", 0L), ("A", 10L),
                 ("B", 0L), ("B", 0L), ("B", 10L),
                 ("C", 0L), ("C", 10L), ("C", 10L)).toDF("g", "v")
    val got = Wasserstein.emd1dPairs(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("emd"))
      .toMap
    assert(got(("A", "B")) == 0.0)
    // A vs C: CDF gap 1/3 over [0, 10) -> W1 = 10/3
    assert(math.abs(got(("A", "C")) - 10.0 / 3.0) < 1e-5)
  }

  test("bucketing coarsens the grid but keeps point-mass distances") {
    val df = (Seq.fill(3)(("A", 0L)) ++ Seq.fill(3)(("B", 200L)))
      .toDF("g", "v")
    val r = Wasserstein.emd1dPairs(df, "g", "v", bucketWidth = 100L)
      .collect().head
    assert(r.getAs[Double]("emd") == 200.0)
    assert(r.getAs[Long]("n_cells") == 2L)
  }
}
