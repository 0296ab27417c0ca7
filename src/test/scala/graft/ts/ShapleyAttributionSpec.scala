package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[ShapleyAttribution.shapley]] — hand-enumerable coalitions,
  * the efficiency axiom, and the null-player axiom. */
class ShapleyAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(touches: Seq[(Long, String)], convs: Seq[Long],
                  channels: Seq[String]) =
    ShapleyAttribution.shapley(
      touches.toDF("jid", "ch"), Seq("jid"), "ch",
      convs.map(Tuple1(_)).toDF("jid"), channels)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("two channels, hand-computed credits; efficiency holds exactly") {
    // journeys 1,2 touch {a} (1 converts); 3 touches {b} (no conv);
    // 4,5 touch {a,b} (both convert)
    // v(a)=500000, v(b)=0, v(ab)=1000000, v(empty)=0 (unobserved)
    // phi_a = (1*(v(a)-0) + 1*(v(ab)-v(b)))/2 = 750000
    // phi_b = (1*(v(b)-0) + 1*(v(ab)-v(a)))/2 = 250000
    val touches = Seq(1L -> "a", 2L -> "a", 3L -> "b",
                      4L -> "a", 4L -> "b", 5L -> "a", 5L -> "b")
    val got = run(touches, Seq(1L, 4L, 5L), Seq("a", "b"))
    assert(got("a") == ((4L, 3L, 750000L)), s"$got")
    assert(got("b") == ((3L, 2L, 250000L)), s"$got")
    // efficiency: sum of credits = v(full observed set)
    assert(got("a")._3 + got("b")._3 == 1000000L)
  }

  test("null player: a channel that never changes conversion gets zero") {
    // {a}: 2 journeys 1 conv (v=500000); {a,n}: 2 journeys 1 conv
    // (v=500000) -> n's marginal contribution is 0 everywhere it
    // appears, a's is 500000 against both the empty and {n} sets
    // (v({n}) unobserved = 0 hands a the full credit in that order)
    val touches = Seq(1L -> "a", 2L -> "a",
                      3L -> "a", 3L -> "n", 4L -> "a", 4L -> "n")
    val got = run(touches, Seq(1L, 3L), Seq("a", "n"))
    assert(got("n")._3 == 0L, s"$got")
    assert(got("a")._3 == 500000L, s"$got")
  }

  test("duplicate touches collapse; channels outside the universe are ignored") {
    val touches = Seq(1L -> "a", 1L -> "a", 1L -> "zzz", 2L -> "a")
    val got = run(touches, Seq(1L), Seq("a", "b"))
    // one observed coalition {a}: 2 journeys, 1 conv, v=500000.
    // Under the documented v=0-off-observed convention the untouched
    // channel b picks up a NEGATIVE credit (its marginal on {a} is
    // v(ab)=0 minus v(a)): phi_a = (v(a) + 0)/2 = 250000,
    // phi_b = (0 + (0 - v(a)))/2 = -250000 — and efficiency still
    // holds exactly: 250000 - 250000 = v(ab) = 0
    assert(got("a") == ((2L, 1L, 250000L)), s"$got")
    assert(got("b") == ((0L, 0L, -250000L)), s"$got")
    assert(got("a")._3 + got("b")._3 == 0L)
    assert(!got.contains("zzz"))
  }

  test("three channels: efficiency against the observed full-set rate") {
    // random-ish small design over {x,y,z}
    val touches = Seq(
      1L -> "x", 2L -> "x", 2L -> "y", 3L -> "y", 3L -> "z",
      4L -> "x", 4L -> "y", 4L -> "z", 5L -> "x", 5L -> "y", 5L -> "z",
      6L -> "z")
    val convs = Seq(2L, 4L, 5L)
    val got = run(touches, convs, Seq("x", "y", "z"))
    // v(xyz) = 2 convs / 2 journeys = 1000000; sum phi must equal it
    // (up to the one truncating div by k! per channel: each phi_num
    // is divisible by k! here iff exact; allow |sum - 1e6| <= 3)
    val s = got.values.map(_._3).sum
    assert(math.abs(s - 1000000L) <= 3L, s"$got")
  }
}
