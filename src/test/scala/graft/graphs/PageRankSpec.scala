package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[PageRank]] — exact integer update rule on hand-computable
  * graphs, mass conservation, and the co-occurrence edge builder. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("two-node symmetric graph: ranks stay at the fixed point") {
    import spark.implicits._
    // a<->b, outdeg 1 each: r' = 150000 + 85*1000000 div 100 = 1000000
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val got = PageRank.pageRank(edges, "src", "dst", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("star graph: hub accumulates, leaves equalize; exact grid values") {
    import spark.implicits._
    // hub h <-> leaves x,y,z (symmetrized): deg(h)=3, deg(leaf)=1
    val edges = Seq("x", "y", "z").flatMap(l => Seq(("h", l), (l, "h")))
      .toDF("src", "dst")
    val got = PageRank.pageRank(edges, "src", "dst", iters = 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // leaves receive hub's share 1000000 div 3 = 333333:
    //   150000 + 85*333333 div 100 = 150000 + 283333 = 433333
    // hub receives 3 leaf shares of 1000000: 150000 + 85*3000000 div 100
    assert(got("h") == ((2700000L, 3L)))
    assert(got("x") == ((433333L, 1L)))
    assert(got("y") == ((433333L, 1L)))
    assert(got("z") == ((433333L, 1L)))
  }

  test("bfsDistances: shortest hop count wins, settled nodes never relabel") {
    import spark.implicits._
    // path a->b->c->d plus shortcut a->c: c must be dist 1 (shortcut),
    // d dist 2; isolated seed z stays at 0; e unreachable -> absent
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
      ("x", "e")).toDF("src", "dst")
    val seeds = Seq("a", "z").toDF("item")
    val got = PageRank.bfsDistances(edges, "src", "dst", seeds, "item", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 0L, "z" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("coOccurrenceEdges: distinct ordered pairs within groups, deduped") {
    import spark.implicits._
    val m = Seq((1L, "a"), (1L, "b"), (1L, "b"), (2L, "a"), (2L, "b"),
      (2L, "c"), (3L, "z")).toDF("g", "item")
    val got = PageRank.coOccurrenceEdges(m, "g", "item")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "c"), ("c", "b")))
  }

  test("personalizedPageRank: single seed, exact 3-iteration values") {
    import spark.implicits._
    // a<->b, seed {a}: r0 = (1e6, 0).
    //   r1: a = 15e6 div 100 = 150000;      b = 85e6 div 100 = 850000
    //   r2: a = 150000 + 85·850000 div 100 = 872500; b = 127500
    //   r3: a = 150000 + 85·127500 div 100 = 258375; b = 741625
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val got = PageRank.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 258375L, "b" -> 741625L))
  }

  test("personalizedPageRank: seeds outside the graph don't dilute mass") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    // "z" is absent from the graph: |seeds ∩ nodes| = 1, so restart
    // mass is identical to the single-seed case
    val seeds = Seq("a", "z").toDF("node")
    val got = PageRank.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 258375L, "b" -> 741625L))
  }

  test("personalizedPageRank: symmetric seed set sits at the fixed point") {
    import spark.implicits._
    // both nodes seeded at 500000 each: r' = 75000 + 425000 = 500000
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val seeds = Seq("a", "b").toDF("node")
    val got = PageRank.personalizedPageRank(edges, "src", "dst",
        seeds, "node", iters = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 500000L, "b" -> 500000L))
  }
}
