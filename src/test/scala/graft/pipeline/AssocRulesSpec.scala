package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[AssocRules.associationRules]] — hand-computed supports,
  * confidence, lift, and the two prune gates. */
class AssocRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rules(rows: Seq[(Long, String)], minItem: Long, minPair: Long) =
    AssocRules.associationRules(rows.toDF("bk", "it"), "bk", "it",
        minItem, minPair)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))))
      .toMap

  test("hand-computed confidence and lift, both directions emitted") {
    // 4 baskets: {a,b}, {a,b}, {a}, {b,c}
    // c_a=3, c_b=3, c_ab=2, N=4
    // conf(a->b) = 2e6 div 3 = 666666; lift = 2*4e6 div 9 = 888888
    val rows = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b",
                   3L -> "a", 4L -> "b", 4L -> "c")
    val got = rules(rows, minItem = 1L, minPair = 1L)
    assert(got(("a", "b")) == ((2L, 3L, 3L, 4L, 666666L, 888888L)), s"$got")
    assert(got(("b", "a")) == ((2L, 3L, 3L, 4L, 666666L, 888888L)), s"$got")
    // conf(b->c) = 1e6 div 3 = 333333; lift = 1*4e6 div (3*1) = 1333333
    assert(got(("b", "c")) == ((1L, 3L, 1L, 4L, 333333L, 1333333L)), s"$got")
    assert(got(("c", "b")) == ((1L, 1L, 3L, 4L, 1000000L, 1333333L)), s"$got")
    // a and c never co-occur -> no rule either way
    assert(!got.contains(("a", "c")) && !got.contains(("c", "a")))
  }

  test("lift separates attraction from independence from repulsion") {
    // 8 baskets; x,y always together (lift 8/4=2); x,z never (no rule);
    // x,w independent: c_x=4, c_w=4, c_xw=2 -> lift = 2*8e6/(16) = 1e6
    val rows = (1L to 4L).flatMap(b => Seq(b -> "x", b -> "y")) ++
      (5L to 8L).map(b => b -> "z") ++
      Seq(1L -> "w", 2L -> "w", 5L -> "w", 6L -> "w")
    val got = rules(rows, 1L, 1L)
    assert(got(("x", "y"))._6 == 2000000L, s"$got")
    assert(got(("x", "w"))._6 == 1000000L, s"$got")
    assert(!got.contains(("x", "z")))
  }

  test("Apriori prunes: infrequent item never reaches the pair join; pair gate independent") {
    val rows = Seq(1L -> "a", 1L -> "b", 2L -> "a", 2L -> "b",
                   3L -> "a", 3L -> "rare")
    // minItem=2 kills `rare` even though (a,rare) co-occur once
    val got = rules(rows, minItem = 2L, minPair = 1L)
    assert(got.keySet == Set(("a", "b"), ("b", "a")), s"$got")
    // minPair=3 kills the (a,b) pair (support 2) though both items pass
    assert(rules(rows, 2L, 3L).isEmpty)
  }

  test("duplicate basket lines collapse before counting") {
    val rows = Seq(1L -> "a", 1L -> "a", 1L -> "b", 2L -> "a")
    val got = rules(rows, 1L, 1L)
    // c_a = 2 (not 3), c_ab = 1
    assert(got(("a", "b")) == ((1L, 2L, 1L, 2L, 500000L, 1000000L)), s"$got")
  }
}
