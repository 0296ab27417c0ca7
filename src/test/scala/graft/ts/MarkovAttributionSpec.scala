package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[MarkovAttribution.removalEffects]] — a hand-solvable absorbing
  * chain and the removal semantics. */
class MarkovAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def run(events: Seq[(Long, String, Long, Long)],
                  channels: Seq[String]) = {
    import spark.implicits._
    MarkovAttribution.removalEffects(
      events.map { case (j, et, sec, id) => (j, et, ts(sec), id) }
        .toDF("jid", "et", "t", "eid"),
      Seq("jid"), "et", "t", "eid", channels, "conv", iters = 12)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("hand-solved two-channel chain: removal effects and shares exact") {
    // j1: a -> conv; j2: a -> (null); j3: b -> a -> conv
    // START->a x2, START->b x1; a->CONV x2, a->NULL x1; b->a x1
    // full: V(a)=2e6/3=666666, V(b)=V(a), V(START)=666666
    // remove b: V(S)=(2*666666)/3=444444 -> effect 333333
    // remove a: V(S)=0 -> effect 1000000; shares 750000 / 249999
    val events = Seq(
      (1L, "a", 10L, 1L), (1L, "conv", 20L, 2L),
      (2L, "a", 10L, 3L),
      (3L, "b", 10L, 4L), (3L, "a", 20L, 5L), (3L, "conv", 30L, 6L))
    val got = run(events, Seq("a", "b"))
    assert(got("a") == ((666666L, 0L, 1000000L, 750000L)), s"$got")
    assert(got("b") == ((666666L, 444444L, 333333L, 249999L)), s"$got")
  }

  test("an untouched channel has zero removal effect") {
    val events = Seq(
      (1L, "a", 10L, 1L), (1L, "conv", 20L, 2L),
      (2L, "a", 10L, 3L))
    val got = run(events, Seq("a", "ghost"))
    val (pf, pr, eff, share) = got("ghost")
    assert(pr == pf && eff == 0L && share == 0L, s"$got")
    assert(got("a")._3 == 1000000L, s"$got")
  }

  test("order within a journey drives the chain (position-aware, unlike Shapley)") {
    // aa -> conv vs a alone -> null: self-loop a->a then conv
    val events = Seq(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "conv", 30L, 3L),
      (2L, "b", 10L, 4L))
    val got = run(events, Seq("a", "b"))
    // chain: START->a, a->a, a->CONV; START->b, b->NULL
    // V(a) converges to 1e6 via the self-loop (truncating iterates),
    // b contributes nothing
    assert(got("a")._3 == 1000000L, s"$got")
    assert(got("b")._3 == 0L, s"$got")
    assert(got("a")._1 > 400000L, s"$got")
  }
}
