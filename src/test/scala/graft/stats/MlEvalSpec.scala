package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[MlEval.aucExact]] / [[MlEval.liftTable]] — the AUC anchor
  * points and a hand-enumerable lift table. */
class MlEvalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = MlEval.aucExact(rows.toDF("s", "y"), "s", "y").collect().head
    (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))
  }

  test("aucExact: perfect separation 1, reversed 0, all-tied exactly 1/2") {
    val perfect = Seq(10L -> 1L, 9L -> 1L, 2L -> 0L, 1L -> 0L)
    assert(auc(perfect) == ((2L, 2L, Some(1000000L))))
    val reversed = perfect.map { case (s, y) => (s, 1L - y) }
    assert(auc(reversed) == ((2L, 2L, Some(0L))))
    assert(auc(Seq(5L -> 1L, 5L -> 0L, 5L -> 1L))._3 == Some(500000L))
  }

  test("aucExact: hand case with a tie across classes") {
    // pos scores {3, 2}, neg {2, 1}: pairs (3,2)+1 (3,1)+1 (2,2)+.5
    // (2,1)+1 -> AUC = 3.5/4 = 0.875
    assert(auc(Seq(3L -> 1L, 2L -> 1L, 2L -> 0L, 1L -> 0L))._3 ==
      Some(875000L))
  }

  test("aucExact: single-class input nulls") {
    assert(auc(Seq(3L -> 1L, 2L -> 1L))._3.isEmpty)
  }

  test("liftTable: two buckets, positives concentrated on top") {
    import spark.implicits._
    // scores 10..1, positives at scores 10,9,8 (top) and 2 (bottom)
    val rows = (1L to 10L).map(i =>
      (i, i, if (i >= 8 || i == 2) 1L else 0L))
    val got = MlEval.liftTable(rows.toDF("id", "s", "y"),
        "s", "y", "id", nBuckets = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    // bucket 1 = scores 10..6: n=5, pos=3, rate=600000,
    //   lift = 3*10e6/(5*4) = 1500000, capture = 750000
    assert(got(1L) == ((5L, 3L, 600000L, 1500000L, 750000L)), s"$got")
    // bucket 2 = scores 5..1: n=5, pos=1, rate=200000, lift=500000,
    //   capture = 1000000
    assert(got(2L) == ((5L, 1L, 200000L, 500000L, 1000000L)), s"$got")
  }

  test("liftTable: tied scores split deterministically by id across the boundary") {
    import spark.implicits._
    // four rows all score 7; ids 1..4; 2 buckets -> ids 1,2 top
    val rows = Seq((1L, 7L, 1L), (2L, 7L, 0L), (3L, 7L, 1L), (4L, 7L, 0L))
    val got = MlEval.liftTable(rows.toDF("id", "s", "y"),
        "s", "y", "id", nBuckets = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == ((2L, 1L)) && got(2L) == ((2L, 1L)), s"$got")
  }

  private def ap(rows: Seq[(Long, Long)]): (Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = MlEval.averagePrecision(rows.toDF("s", "y"), "s", "y")
      .collect().head
    (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))
  }

  test("averagePrecision: perfect ranking 1, worst ranking P/N-at-bottom, ties at block precision") {
    // perfect: both positives above the negative -> AP = 1
    assert(ap(Seq(3L -> 1L, 2L -> 1L, 1L -> 0L)) ==
           ((2L, 1L, Some(1000000L))))
    // reversed: single positive ranked last of 3 -> AP = 1/3
    assert(ap(Seq(3L -> 0L, 2L -> 0L, 1L -> 1L)) ==
           ((1L, 2L, Some(333333L))))
    // one tie block: AP = block precision = 1/2
    assert(ap(Seq(5L -> 1L, 5L -> 0L)) == ((1L, 1L, Some(500000L))))
  }

  test("averagePrecision: sklearn mixed-order example; no positives is null") {
    // scores desc: y = 1,0,1,0 -> terms: 1*1/(2*1) + 1*2/(2*3)
    //   = 0.5 + 0.333333 -> 833333 (sklearn average_precision = 5/6)
    assert(ap(Seq(4L -> 1L, 3L -> 0L, 2L -> 1L, 1L -> 0L)) ==
           ((2L, 2L, Some(833333L))))
    assert(ap(Seq(3L -> 0L, 1L -> 0L)) == ((0L, 2L, None)))
  }
}
