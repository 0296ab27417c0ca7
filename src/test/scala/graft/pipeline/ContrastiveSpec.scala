package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.contrastivePairs]] on planted geometry: two tight
  * clusters near each other plus a far singleton. Every clustered
  * anchor must pair with its cluster-mate as positive and a member of
  * the OTHER nearby cluster as hard negative; the singleton (no
  * positive) emits nothing. */
class ContrastiveSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("triplets: positives are cluster-mates, negatives the nearest non-mates") {
    import spark.implicits._
    // 4-dim: cluster A around (1,0,0,0), cluster B around (0.9,0.45,0,0)
    // (cos(A,B) ≈ 0.89 < tau=0.95 — candidates but not duplicates),
    // singleton C at (0,0,1,0)
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(0.999, 0.01, 0.0, 0.0)),
      (2L, Seq(0.9, 0.45, 0.0, 0.0)),
      (3L, Seq(0.9, 0.44, 0.01, 0.0)),
      (4L, Seq(0.0, 0.0, 1.0, 0.0))).toDF("vec_id", "v")
    // two centroids: one near A/B (they share a cell), one near C
    val cents = Seq(0 -> Seq(1.0, 0.2, 0.0, 0.0), 1 -> Seq(0.0, 0.0, 1.0, 0.0))
    val got = Similarity.contrastivePairs(
        vecs, Similarity.framesFlat(spark, cents), tau = 0.95, nprobe = 1)
      .collect().map(r => r.getAs[Long]("anchor_id") ->
        ((r.getAs[Long]("pos_id"),
          if (r.isNullAt(r.fieldIndex("neg_id"))) -1L else r.getAs[Long]("neg_id"))))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L), s"anchors: $got")
    assert(got(0L)._1 == 1L && got(1L)._1 == 0L)
    assert(got(2L)._1 == 3L && got(3L)._1 == 2L)
    // hard negatives cross the cluster boundary
    assert(Set(2L, 3L).contains(got(0L)._2) && Set(2L, 3L).contains(got(1L)._2))
    assert(Set(0L, 1L).contains(got(2L)._2) && Set(0L, 1L).contains(got(3L)._2))
  }

  test("isolated duplicate pair keeps a null hard negative") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)),
      (1L, Seq(0.999, 0.001)),
      (2L, Seq(0.0, 1.0))).toDF("vec_id", "v")
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val rows = Similarity.contrastivePairs(
        vecs, Similarity.framesFlat(spark, cents), tau = 0.9, nprobe = 1)
      .collect()
    val byAnchor = rows.map(r => r.getAs[Long]("anchor_id") -> r).toMap
    assert(byAnchor.keySet == Set(0L, 1L))
    assert(byAnchor(0L).isNullAt(byAnchor(0L).fieldIndex("neg_id")))
  }
}
