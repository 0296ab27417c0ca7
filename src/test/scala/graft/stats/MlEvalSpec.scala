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

  test("brierCalibration: extreme wrong/right probabilities — Brier 1/2, ECE 1/2") {
    import spark.implicits._
    val df = Seq((1000000L, 1L), (0L, 1L)).toDF("p", "y")
    val got = MlEval.brierCalibration(df, "p", "y", nBins = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(7), r.getLong(8)))).toMap
    // p=1e6 lands in the LAST bin (9) by the clamp; p=0 in bin 0
    // bin 9: conf 1e6, acc 1e6, gap 0; bin 0: conf 0, acc 1e6, gap 1e6
    assert(got(9L) == ((1L, 1L, 1000000L, 1000000L, 0L, 500000L, 500000L)),
      s"$got")
    assert(got(0L)._5 == 1000000L, s"$got")
  }

  test("brierCalibration: a perfectly calibrated bin has gap 0, Brier = p(1−p)") {
    import spark.implicits._
    // two rows at p = 0.5, one positive: conf = acc = 0.5, ECE = 0,
    // Brier = 2·(5·10⁵)²/(2·10⁶·10⁶)... = 0.25
    val df = Seq((500000L, 1L), (500000L, 0L)).toDF("p", "y")
    val r = MlEval.brierCalibration(df, "p", "y", nBins = 10)
      .collect().head
    assert(r.getLong(0) == 5L && r.getLong(5) == 0L) // bin, gap
    assert(r.getLong(7) == 0L && r.getLong(8) == 250000L, s"$r") // ece, brier
  }

  private def f1(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = MlEval.bestF1Threshold(rows.toDF("s", "y"), "s", "y")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
     Option(r.get(7)).map(_.asInstanceOf[Long]),
     Option(r.get(8)).map(_.asInstanceOf[Long]))
  }

  test("bestF1Threshold: picks the clean separating threshold, MCC = 1") {
    // {3:+, 2:+, 1:−}: thr=2 → tp=2 fp=0 fn=0 tn=1, F1 = MCC = 1
    val r = f1(Seq(3L -> 1L, 2L -> 1L, 1L -> 0L))
    assert(r == ((2L, 2L, 0L, 0L, 1L, Some(1000000L), Some(1000000L))),
      s"$r")
  }

  test("bestF1Threshold: sweep prefers recall-heavy low threshold when it wins") {
    // {3:+, 2:−, 1:+}: thr=3 → F1 2/3; thr=2 → 1/2; thr=1 → 4/5 (best)
    val r = f1(Seq(3L -> 1L, 2L -> 0L, 1L -> 1L))
    assert(r._1 == 1L && r._6 == Some(800000L), s"$r")
  }

  test("bestF1Threshold: all-negative ties break toward the higher threshold; nulls") {
    // every threshold scores F1 = 0 → keep the smallest keep set
    val r = f1(Seq(2L -> 0L, 1L -> 0L))
    assert(r._1 == 2L && r._6.isEmpty && r._7.isEmpty, s"$r")
  }
}
