package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TextDedup.lshBandPlan]] — the integer S-curve tuner. The whole
  * optimization is exact millionths arithmetic, so a 15-line Scala
  * reimplementation of the recurrence must agree TO THE BIT with the
  * distributed plan (the same property the q159 oracle checks from
  * SQL). Plus the decision-level facts: exactly one argmin, and on the
  * 64-hash / J=0.5 config it is the textbook (16, 4) plan whose curve
  * midpoint (1/b)^(1/r) equals the threshold exactly. */
class BandPlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Reference recurrence: x^e in millionths via (x·v) div 1e6. */
  private def powMicro(v: Long, e: Int): Long = {
    var acc = 1000000L
    var i = 0
    while (i < e) { acc = acc * v / 1000000L; i += 1 }
    acc
  }

  private def referencePlan(nPerms: Int, tMicro: Long, fnW: Long,
                            steps: Int): Seq[(Int, Int, Long, Long, Long)] =
    (1 to nPerms).filter(nPerms % _ == 0).map { b =>
      val r = nPerms / b
      val grid = (1 until steps).map(_ * (1000000L / steps))
      val masses = grid.map { jm =>
        val p = 1000000L - powMicro(1000000L - powMicro(jm, r), b)
        if (jm < tMicro) (p, 0L) else (0L, 1000000L - p)
      }
      val fp = masses.map(_._1).sum
      val fn = masses.map(_._2).sum
      (b, r, fp, fn, fp + fnW * fn)
    }

  test("distributed plan table is bit-identical to the reference recurrence") {
    val got = TextDedup.lshBandPlan(spark, 64, 500000L, 3L, 100)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
                           r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    val want = referencePlan(64, 500000L, 3L, 100)
    assert(got.length == want.length)
    got.zip(want).foreach { case ((b, r, fp, fn, obj, _), (wb, wr, wfp, wfn, wobj)) =>
      assert((b, r, fp, fn, obj) == (wb, wr, wfp, wfn, wobj))
    }
  }

  test("exactly one chosen plan, and at t=0.5/n=64 it is (16, 4)") {
    val rows = TextDedup.lshBandPlan(spark, 64, 500000L, 3L, 100).collect()
    val chosen = rows.filter(_.getLong(5) == 1L)
    assert(chosen.length == 1)
    assert(chosen.head.getInt(0) == 16 && chosen.head.getInt(1) == 4)
  }

  test("recall-first weighting shifts the argmin toward more bands") {
    // fnWeight >> 1 punishes missed dups: the chosen plan's band count
    // must be >= the fp-only (fnWeight semantics reversed) choice.
    def chosenBands(fnW: Long): Int =
      TextDedup.lshBandPlan(spark, 64, 500000L, fnW, 100)
        .filter("is_chosen = 1").collect().head.getInt(0)
    assert(chosenBands(100L) >= chosenBands(1L))
  }

  test("curve masses are sane: fp rises with bands, fn falls with bands") {
    val rows = TextDedup.lshBandPlan(spark, 64, 500000L, 1L, 100)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val fps = rows.map(_._2)
    val fns = rows.map(_._3)
    assert(fps.zip(fps.tail).forall { case (a, b) => a <= b })
    assert(fns.zip(fns.tail).forall { case (a, b) => a >= b })
  }
}
