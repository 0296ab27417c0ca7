package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Divergence.jensenShannon]] — the JSD anchor points (0,
  * ln 2) and monotonicity in distribution distance. */
class DivergenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def jsd(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    Divergence.jensenShannon(rows.toDF("k", "cat", "c"), "k", "cat", "c")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
  }

  test("identical distributions score exactly 0") {
    val rows = Seq(("a", "x", 3L), ("a", "y", 7L),
                   ("b", "x", 6L), ("b", "y", 14L))
    assert(jsd(rows)(("a", "b")) == ((2L, 0L)))
  }

  test("disjoint supports hit the ln 2 ceiling") {
    // each term contributes 0.5*ln2 = 346573.59 -> rounds to 346574
    val rows = Seq(("a", "x", 5L), ("b", "y", 5L))
    assert(jsd(rows)(("a", "b")) == ((2L, 693148L)))
  }

  test("a nearer distribution scores below a farther one; all pairs emitted") {
    val rows = Seq(
      ("p", "x", 50L), ("p", "y", 50L),
      ("q", "x", 45L), ("q", "y", 55L),
      ("r", "x", 5L), ("r", "y", 95L))
    val m = jsd(rows)
    assert(m.size == 3)
    assert(m(("p", "q"))._2 < m(("p", "r"))._2, s"$m")
    assert(m(("q", "r"))._2 < m(("p", "r"))._2, s"$m")
  }

  test("one-sided category contributes only the present side's half") {
    // a has z, b doesn't: z contributes 0.5*p_z*ln(2) from a only
    val rows = Seq(("a", "x", 5L), ("a", "z", 5L), ("b", "x", 10L))
    val (terms, v) = jsd(rows)(("a", "b"))
    assert(terms == 2L)
    // hand: term z = 0.5*0.5*ln2 = 173287; term x: p=0.5 q=1
    //   0.5*(0.5*ln(0.5/0.75)) + 0.5*(1*ln(1/0.75))
    // = 0.5*0.5*(-0.405465) + 0.5*0.287682 = -101366 + 143841 = 42475
    assert(v == 173287L + 42475L, s"$v")
  }
}
