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

  test("brunnerMunzel: the published unequal-variance example") {
    import spark.implicits._
    // Brunner & Munzel's own data (also scipy's doc example):
    // W = 3.137467, df = 17.682842 — the integer ledger reproduces
    // ΣR2_a = 275, Σu²_a = 42966, ΣR2_b = 375, Σu²_b = 62546,
    // NUM2 = 2225
    val x = Seq(1L, 2L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 1L, 2L, 4L, 1L, 1L)
    val y = Seq(3L, 3L, 4L, 3L, 1L, 2L, 3L, 1L, 1L, 5L, 4L)
    val df = (x.map(("g", 0L, _)) ++ y.map(("g", 1L, _)))
      .toDF("grp", "arm", "v")
    val r = Hypothesis.brunnerMunzel(df, "grp", "arm", "v").collect()(0)
    assert(r.getLong(1) == 14L && r.getLong(2) == 11L)
    assert(r.getLong(3) == 3137467L)
    assert(r.getLong(4) == 17682842L)
  }

  test("brunnerMunzel: tiny arms yield null") {
    import spark.implicits._
    val df = Seq(("g", 0L, 1L), ("g", 1L, 2L), ("g", 1L, 3L))
      .toDF("grp", "arm", "v")
    val r = Hypothesis.brunnerMunzel(df, "grp", "arm", "v").collect()(0)
    assert(r.isNullAt(3))
  }

  test("yuenT: trimmed means + winsorized variances, hand case") {
    import spark.implicits._
    // A = [1..10, 100] (k=1 → kept 2..10... kept [2..10], h=9,
    // tm = 6), B = [2..11] (k=1 → kept [3..10], h=8, tm = 6.5);
    // winsorized moments give t = −0.318447, df = 14.986410
    val a = (1L to 10L) :+ 100L
    val b = 2L to 11L
    val df = (a.map(("g", 0L, _)) ++ b.map(("g", 1L, _)))
      .toDF("grp", "arm", "v")
    val r = Robust.yuenT(df, "grp", "arm", "v").collect()(0)
    assert(r.getLong(1) == 11L && r.getLong(2) == 10L)
    assert(r.getLong(3) == 9L && r.getLong(4) == 8L)
    assert(r.getLong(5) == 6000000L && r.getLong(6) == 6500000L)
    assert(r.getLong(7) == -318447L)
    assert(r.getLong(8) == 14986410L)
  }

  test("yuenT: the outlier that wrecks Welch barely moves Yuen") {
    import spark.implicits._
    // same arms without the 100-outlier: tm_a shifts only from 6 to
    // 5.5 (the trim absorbed the outlier's influence)
    val a = 1L to 10L
    val b = 2L to 11L
    val df = (a.map(("g", 0L, _)) ++ b.map(("g", 1L, _)))
      .toDF("grp", "arm", "v")
    val r = Robust.yuenT(df, "grp", "arm", "v").collect()(0)
    assert(r.getLong(5) == 5500000L)
  }

  test("winsorizedStats: tails clamp onto the kept range") {
    // [0..8, 100], k = 1: lo/hi = 1/8; winsorized multiset
    // {1,1,2..7,8,8}: mean 4.5, var = (269 − 202.5)/9 = 7.388889
    val r = Robust.winsorizedStats(
      obs((0L to 8L).map(("g", _)) :+ ("g", 100L)), "grp", "v")
      .collect()(0)
    assert(r.getLong(2) == 1L)                        // k_wins
    assert(r.getLong(3) == 1L && r.getLong(4) == 8L)  // lo, hi
    assert(r.getLong(5) == 4500000L)
    assert(r.getLong(6) == 7388889L)
  }

  test("kendallTauDistance: identical, reversed, and partial orders") {
    import spark.implicits._
    val same = (1L to 25L).map(i => ("g", i, i)).toDF("grp", "pa", "pb")
    val r1 = RankCompare.kendallTauDistance(same, "grp", "pa", "pb")
      .collect()(0)
    assert(r1.getLong(2) == 20L && r1.getLong(4) == 0L)
    val rev = (1L to 20L).map(i => ("g", i, 21L - i))
      .toDF("grp", "pa", "pb")
    val r2 = RankCompare.kendallTauDistance(rev, "grp", "pa", "pb")
      .collect()(0)
    assert(r2.getLong(3) == 190L && r2.getLong(4) == 1000000L)
    val part = Seq(("g", 1L, 2L), ("g", 2L, 1L), ("g", 3L, 3L),
                   ("g", 30L, 30L)).toDF("grp", "pa", "pb")
    val r3 = RankCompare.kendallTauDistance(part, "grp", "pa", "pb")
      .collect()(0)
    assert(r3.getLong(2) == 3L && r3.getLong(3) == 1L)
    assert(r3.getLong(4) == 333333L)
  }

  test("rbo: disjoint top-D prefixes score zero") {
    import spark.implicits._
    val df = (1L to 20L).map(i => ("g", i, i + 20L))
      .toDF("grp", "pa", "pb")
    val r = RankCompare.rbo(df, "grp", "pa", "pb").collect()(0)
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
  }
}
