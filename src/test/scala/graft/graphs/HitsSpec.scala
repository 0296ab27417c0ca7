package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Hits.hits]] — exact integer normalization on a hand-computable
  * bipartite graph. */
class HitsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bipartite fan: authority ∝ in-hubs, hub ∝ sum of its authorities") {
    import spark.implicits._
    // hubs s1 (supplies p1, p2), s2 (supplies p2): p2 has 2 in-edges
    val edges = Seq(("s1", "p1"), ("s1", "p2"), ("s2", "p2"))
      .toDF("src", "dst")
    val got = Hits.hits(edges, "src", "dst", iters = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // a_raw: p1 = 1e6, p2 = 2e6 -> normalized p1 = 500000, p2 = 1000000
    assert(got(("authority", "p1")) == 500000L)
    assert(got(("authority", "p2")) == 1000000L)
    // h_raw: s1 = 5e5 + 1e6 = 1.5e6, s2 = 1e6 -> s1 = 1e6, s2 = 666666
    assert(got(("hub", "s1")) == 1000000L)
    assert(got(("hub", "s2")) == 666666L)
  }

  test("second iteration stays on the grid and keeps the ordering") {
    import spark.implicits._
    val edges = Seq(("s1", "p1"), ("s1", "p2"), ("s2", "p2"))
      .toDF("src", "dst")
    val got = Hits.hits(edges, "src", "dst", iters = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // a_raw2: p1 = h(s1) = 1e6; p2 = h(s1)+h(s2) = 1666666
    //   -> p1 = 1e6*1e6 div 1666666 = 600000, p2 = 1000000
    assert(got(("authority", "p1")) == 600000L)
    assert(got(("authority", "p2")) == 1000000L)
    assert(got(("hub", "s1")) == 1000000L)
    // h_raw2: s1 = 1.6e6, s2 = 1e6 -> s2 = 1e12 div 1.6e6 = 625000
    assert(got(("hub", "s2")) == 625000L)
  }
}
