package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Agreement.cohenKappa]] — the textbook anchor points of κ. */
class AgreementSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def kappa(rows: Seq[(Long, Long)]): (Long, Long, Option[Long]) = {
    import spark.implicits._
    val r = Agreement.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .collect().head
    (r.getLong(0), r.getLong(1),
     Option(r.get(2)).map(_.asInstanceOf[Long]))
  }

  test("perfect agreement is exactly 1; total disagreement exactly -1") {
    assert(kappa(Seq(1L -> 1L, 0L -> 0L, 1L -> 1L)) ==
      ((3L, 3L, Some(1000000L))))
    assert(kappa(Seq(1L -> 0L, 0L -> 1L)) == ((2L, 0L, Some(-1000000L))))
  }

  test("independent raters with matched marginals land exactly at 0") {
    // all four cells once: po = 1/2 = pe
    assert(kappa(Seq(1L -> 1L, 1L -> 0L, 0L -> 1L, 0L -> 0L))._3 ==
      Some(0L))
  }

  test("chance-corrected: high raw agreement with skewed marginals scores low") {
    // 90 both-keep, 5 each disagreement cell, 0 both-drop:
    // po = 0.9; pe = (95*95 + 5*5)/10000 = 0.905 -> kappa < 0
    val rows = Seq.fill(90)(1L -> 1L) ++ Seq.fill(5)(1L -> 0L) ++
      Seq.fill(5)(0L -> 1L)
    val (_, agree, k) = kappa(rows)
    assert(agree == 90L)
    // (100*90 - 9050)*1e6 div (10000 - 9050) = -50e6 div 950
    // = -52631 (truncation toward zero)
    assert(k == Some(-52631L), s"$k")
  }

  test("a constant rater with a constant partner degenerates to null") {
    assert(kappa(Seq(1L -> 1L, 1L -> 1L))._3.isEmpty)
  }

  private def mcn(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = Agreement.mcnemar(rows.toDF("a", "b"), "a", "b")
      .collect().head
    (r.getLong(1), r.getLong(2),
     Option(r.get(3)).map(_.asInstanceOf[Long]),
     Option(r.get(4)).map(_.asInstanceOf[Long]))
  }

  test("mcnemar: hand-computed off-diagonal chi-square, plain and corrected") {
    // b = 6 (a only), c = 2 (b only), agreements ignored:
    // chi2 = (6-2)^2/8 = 2.0; corrected = (|4|-1)^2/8 = 1.125
    val rows = Seq.fill(6)(1L -> 0L) ++ Seq.fill(2)(0L -> 1L) ++
      Seq.fill(5)(1L -> 1L) ++ Seq.fill(3)(0L -> 0L)
    assert(mcn(rows) == ((6L, 2L, Some(2000000L), Some(1125000L))))
  }

  test("mcnemar: symmetric disagreement is exactly 0; no disagreement is null") {
    // b = c: both statistics exactly 0 — the continuity clamp keeps
    // the corrected form from turning symmetry into evidence
    val sym = Seq.fill(4)(1L -> 0L) ++ Seq.fill(4)(0L -> 1L)
    val s = mcn(sym)
    assert(s._3 == Some(0L) && s._4 == Some(0L), s"$s")
    val none = mcn(Seq.fill(3)(1L -> 1L) ++ Seq.fill(2)(0L -> 0L))
    assert(none._3.isEmpty && none._4.isEmpty, s"$none")
  }

  private def cq(rows: Seq[Seq[Long]]): (Long, Long, Long, Option[Long]) = {
    import spark.implicits._
    val df = rows.map { r => (r(0), r(1), r.lift(2).getOrElse(-1L)) }
      .toDF("g0", "g1", "g2")
    val cols = if (rows.head.size == 2) Seq("g0", "g1")
               else Seq("g0", "g1", "g2")
    val r = Agreement.cochranQ(df.select(cols.map(org.apache.spark.sql
      .functions.col): _*), cols).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2),
     Option(r.get(3)).map(_.asInstanceOf[Long]))
  }

  test("cochranQ: k = 2 reduces exactly to McNemar's uncorrected χ²") {
    // b=6, c=2 → McNemar χ² = 16/8 = 2.0; Q must match
    val rows = Seq.fill(6)(Seq(1L, 0L)) ++ Seq.fill(2)(Seq(0L, 1L)) ++
      Seq.fill(5)(Seq(1L, 1L)) ++ Seq.fill(3)(Seq(0L, 0L))
    val r = cq(rows)
    assert(r._2 == 2L && r._4 == Some(2000000L), s"$r")
  }

  test("cochranQ: k = 3 hand case; all-agreeing rows degenerate to null") {
    // G=(3,3,1), T=7, ΣL²=15: Q = 2·8/6 = 2.666666 (truncating)
    val rows = Seq(Seq(1L, 1L, 1L), Seq(1L, 0L, 0L),
                   Seq(0L, 1L, 0L), Seq(1L, 1L, 0L))
    val r = cq(rows)
    assert(r == ((4L, 3L, 7L, Some(2666666L))), s"$r")
    // every doc kept by all gates or none: den = 0 → null
    val flat = cq(Seq(Seq(1L, 1L, 1L), Seq(0L, 0L, 0L)))
    assert(flat._4.isEmpty, s"$flat")
  }
}
