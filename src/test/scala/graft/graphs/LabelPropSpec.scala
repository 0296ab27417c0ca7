package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[LabelProp.labelPropagation]] — hand-traced synchronous rounds
  * with the (count DESC, label ASC) tie rule. */
class LabelPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    LabelProp.labelPropagation(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two triangles joined by a bridge settle into two communities") {
    // triangle A: 1-2-3, triangle B: 10-11-12, bridge 3-10
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
                (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val got = run(e, rounds = 4)
    // round-by-round the min label 1 floods triangle A; B's min is 10
    // but 10 also hears 3's label — after enough rounds A is all 1;
    // B converges to the label that wins 10's vote each round
    assert(Set(got(1L), got(2L), got(3L)) == Set(1L),
           s"triangle A must agree: $got")
    assert(got(11L) == got(12L), s"B's interior must agree: $got")
  }

  test("one synchronous round is exactly the per-neighbor argmax") {
    // star: center 5, leaves 1,2,3 — after one round the center takes
    // label 1 (all neighbor labels distinct, min wins the tie), each
    // leaf takes 5 (its only neighbor)
    val got = run(Seq((5L, 1L), (5L, 2L), (5L, 3L)), rounds = 1)
    assert(got == Map(5L -> 1L, 1L -> 5L, 2L -> 5L, 3L -> 5L), s"$got")
  }

  test("majority beats minimum: tie rule only breaks equal counts") {
    // hand-trace: after round 1, 21 and 22 carry label 20 (their min
    // neighbor), node 1 carries 2; in round 2 node 30 hears
    // {20: 2 votes, 2: 1 vote} — the majority label 20 must win even
    // though 2 < 20 (a min rule would wrongly pick 2)
    val e = Seq((20L, 21L), (20L, 22L), (30L, 21L), (30L, 22L),
                (30L, 1L), (1L, 2L))
    val got = run(e, rounds = 2)
    assert(got(30L) == 20L, s"two votes for 20 must beat one for 2: $got")
  }

  test("self-loops drop; a 2-cycle oscillates synchronously (documented)") {
    // a lone edge is the minimal bipartite structure: synchronous
    // updates swap the two labels every round — the documented reason
    // classic LPA randomizes update order. Odd rounds: both carry the
    // OTHER's id; even rounds: back to their own.
    val odd = run(Seq((1L, 2L), (3L, 3L)), rounds = 1)
    assert(odd(1L) == 2L && odd(2L) == 1L, s"$odd")
    val even = run(Seq((1L, 2L), (3L, 3L)), rounds = 2)
    assert(even(1L) == 1L && even(2L) == 2L, s"$even")
    assert(!even.contains(3L), "self-loop-only node has no edges, no row")
  }
}
