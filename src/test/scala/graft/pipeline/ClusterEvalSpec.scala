package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ClusterEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("well-separated clusters score near +1, mixed near 0 or below") {
    // cluster 0 around (0,0), cluster 1 around (1,1) (milli-grid 0/1000)
    val good = Seq(
      (1L, 0, Seq(0.0, 0.0)), (2L, 0, Seq(0.01, -0.01)),
      (3L, 1, Seq(1.0, 1.0)), (4L, 1, Seq(0.99, 1.01)))
      .toDF("vec_id", "label", "embedding")
    val g = ClusterEval.simplifiedSilhouette(good, "vec_id", "label",
      "embedding").collect()
    assert(g.forall(_.getAs[Long]("mean_sil_e6") > 900000L), g.mkString)
  }

  test("a point sitting on the other centroid scores -1ish") {
    val df = Seq(
      (1L, 0, Seq(0.0, 0.0)), (2L, 0, Seq(0.0, 0.02)),
      (3L, 1, Seq(1.0, 1.0)), (4L, 1, Seq(1.0, 0.98)),
      (5L, 0, Seq(1.0, 0.99))) // labeled 0, lives at cluster 1
      .toDF("vec_id", "label", "embedding")
    val rows = ClusterEval.simplifiedSilhouette(df, "vec_id", "label",
      "embedding").collect().map(r => r.getAs[Int]("label") ->
        r.getAs[Long]("min_sil_e6")).toMap
    assert(rows(0) < -500000L, rows.toString)
  }

  test("hand-checked two-point clusters: exact e6 values") {
    // c0 = {(0)}, c1 = {(1000 milli)}: both points have a=0,
    // b=1000 -> s = (1000-0)/1000 = 1
    val df = Seq((1L, 0, Seq(0.0)), (2L, 1, Seq(1.0)))
      .toDF("vec_id", "label", "embedding")
    val rows = ClusterEval.simplifiedSilhouette(df, "vec_id", "label",
      "embedding").collect()
    assert(rows.forall(_.getAs[Long]("mean_sil_e6") == 1000000L))
  }
}
