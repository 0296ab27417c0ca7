package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Pca.topComponent]] — hand-solvable 2D geometries on the exact
  * integer grid. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(vecs: Seq[Array[Float]], dims: Int = 2) =
    Pca.topComponent(vecs.map(Tuple1(_)).toDF("embedding"),
        "embedding", dims, iters = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

  test("perfectly correlated pair: equal loadings, share exactly 1e6") {
    // (t, t): centered Gram = 6e6 in every cell; the top direction is
    // (1,1) carrying ALL the variance
    val got = run(Seq(Array(1f, 1f), Array(2f, 2f), Array(3f, 3f)))
    assert(got.toSeq == Seq((0L, 1000000L, 1000000L),
                            (1L, 1000000L, 1000000L)), s"${got.toSeq}")
  }

  test("anti-correlated pair: opposite loadings, sign fixed by the lead dim") {
    // (t, -t): top direction (1,-1); the asymmetric start must escape
    // the exact orthogonality of an all-ones start, and the sign rule
    // points the largest-|loading| (lowest index on ties) positive
    val got = run(Seq(Array(1f, -1f), Array(2f, -2f), Array(3f, -3f)))
    assert(got.toSeq == Seq((0L, 1000000L, 1000000L),
                            (1L, -1000000L, 1000000L)), s"${got.toSeq}")
  }

  test("mean shift leaves the centered Gram — and the output — unchanged") {
    val base = Seq(Array(1f, 1f), Array(2f, 2f), Array(3f, 3f))
    val shifted = base.map(_.map(_ + 7f))
    assert(run(base).toSeq == run(shifted).toSeq)
  }

  test("dominant axis wins; share below 1 when a second direction exists") {
    // strong spread on dim 0, independent small spread on dim 1
    val vecs = Seq(Array(10f, 0.1f), Array(-10f, -0.2f), Array(20f, 0.3f),
                   Array(-20f, -0.1f), Array(30f, 0.2f), Array(-30f, -0.3f))
    val got = run(vecs)
    assert(got(0)._2 == 1000000L, s"${got.toSeq}")
    assert(math.abs(got(1)._2) < 100000L, s"${got.toSeq}")
    assert(got(0)._3 > 900000L && got(0)._3 < 1000000L, s"${got.toSeq}")
  }

  test("constant vectors: zero Gram, zero loadings, zero share") {
    val got = run(Seq(Array(5f, 5f), Array(5f, 5f)))
    assert(got.forall(r => r._2 == 0L && r._3 == 0L), s"${got.toSeq}")
  }

  test("empty input and sub-dims vectors fail fast with explicit errors") {
    val empty = intercept[IllegalArgumentException](run(Seq.empty))
    assert(empty.getMessage.contains("empty input"), empty.getMessage)
    val short = intercept[IllegalArgumentException](
      run(Seq(Array(1f, 2f), Array(3f))))
    assert(short.getMessage.contains("narrower than dims"), short.getMessage)
  }
}
