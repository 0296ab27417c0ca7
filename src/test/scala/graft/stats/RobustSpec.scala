package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Robust]] and [[RankCompare]] against hand-computed anchors. */
class RobustSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def obs(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("grp", "v")
  }

  test("madScale: hand case — lower medians at both passes") {
    // v = [1,2,4,8,9]: med = 4 (pos 3); |v−4| = {3,2,0,4,5} →
    // MAD = 3 (pos 3 of 0,2,3,4,5)
    val r = Robust.madScale(
      obs(Seq(("g", 1L), ("g", 2L), ("g", 4L), ("g", 8L), ("g", 9L))),
      "grp", "v").collect()(0)
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == 4L) // med_c
    assert(r.getLong(3) == 3L) // mad_c
  }

  test("trimmedMean: drops k from each side, splits tie blocks") {
    // [0..8, 100], k = 1: kept 1..8 → mean 4.5
    val r = Robust.trimmedMean(
      obs((0L to 8L).map(("g", _)) :+ ("g", 100L)), "grp", "v")
      .collect()(0)
    assert(r.getLong(2) == 1L)               // k_trim
    assert(r.getLong(3) == 1L && r.getLong(4) == 8L) // lo, hi
    assert(r.getLong(5) == 4500000L)
  }

  test("trimmedMean: tie block straddling the boundary splits exactly") {
    // [1,1,1,9] at trim 1/4: k = 1 → drop one 1 and the 9, keep
    // two 1s → mean exactly 1
    val r = Robust.trimmedMean(
      obs(Seq(("g", 1L), ("g", 1L), ("g", 1L), ("g", 9L))), "grp", "v",
      tNum = 1, tDen = 4).collect()(0)
    assert(r.getLong(2) == 1L)
    assert(r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getLong(5) == 1000000L)
  }

  test("rbo: identical rankings score the truncated-geometric maximum") {
    import spark.implicits._
    // per-depth truncation: Σ_{d≤20} (9^{d−1}·d·10⁶) div (10^d·d)
    // = 878417 (vs the un-truncated 1 − 0.9²⁰ ≈ 0.878423)
    val df = (1L to 25L).map(i => ("g", i, i)).toDF("grp", "pa", "pb")
    val r = RankCompare.rbo(df, "grp", "pa", "pb").collect()(0)
    assert(r.getLong(1) == 20L)      // depth
    assert(r.getLong(2) == 20L)      // n_common
    assert(r.getLong(3) == 878417L)  // rbo_e6
  }

  test("rbo: disjoint top-D prefixes score zero") {
    import spark.implicits._
    val df = (1L to 20L).map(i => ("g", i, i + 20L))
      .toDF("grp", "pa", "pb")
    val r = RankCompare.rbo(df, "grp", "pa", "pb").collect()(0)
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
  }
}
