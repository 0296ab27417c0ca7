package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Concentration.theilIndex]], [[Agreement.cronbachAlpha]] and
  * [[RankCorr.partialCorr]] against hand-computed anchors. */
class CompositeStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("theilIndex: hand case with per-row e6 rounding") {
    import spark.implicits._
    // [1,1,2], S = 4: terms round(0.25·ln(0.75)·1e6) = −71921 (×2),
    // round(0.5·ln(1.5)·1e6) = 202733 → T_e6 = 58891
    val r = Concentration.theilIndex(
      Seq(("g", 1L), ("g", 1L), ("g", 2L)).toDF("grp", "v"),
      "grp", "v").collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 58891L)
  }

  test("theilIndex: perfect equality scores 0; zero members drop") {
    import spark.implicits._
    val r = Concentration.theilIndex(
      Seq(("g", 5L), ("g", 5L), ("g", 0L)).toDF("grp", "v"),
      "grp", "v").collect()(0)
    // two equal positive members + one zero: T = Σ(x/S)ln(3x/10)
    // over the positives — NOT zero (n counts the zero member);
    // check the simpler pure-equality group instead
    assert(r.getLong(1) == 3L)
    val r2 = Concentration.theilIndex(
      Seq(("h", 7L), ("h", 7L)).toDF("grp", "v"), "grp", "v")
      .collect()(0)
    assert(r2.getLong(3) == 0L)
  }

  test("cronbachAlpha: hand case — near-parallel items") {
    import spark.implicits._
    // 4 subjects × 3 items: num = Σ(n·qᵢ − sᵢ²) = 560,
    // den = n·Q − S² = 1552 → α = 1.5·(1 − 560/1552) → 958763 e6
    val df = Seq((2L, 4L, 3L), (4L, 8L, 5L), (6L, 12L, 9L),
                 (8L, 16L, 11L)).toDF("a", "b", "c")
    val r = Agreement.cronbachAlpha(df, Seq("a", "b", "c")).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 958763L)
  }

  test("partialCorr: hand case — quantized-contract replay") {
    import spark.implicits._
    val df = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 5L, 2L),
                 (4L, 4L, 3L), (5L, 7L, 4L))
      .map { case (x, y, z) => ("g", x, y, z) }
      .toDF("grp", "x", "y", "z")
    val r = RankCorr.partialCorr(df, "grp", "x", "y", "z").collect()(0)
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == 904194L)  // rxy_e6
    assert(r.getLong(3) == 970725L)  // rxz_e6
    assert(r.getLong(4) == 866325L)  // ryz_e6
    assert(r.getLong(5) == 527045L)  // pr_e6
  }

  test("partialCorr: constant covariate nulls the partial") {
    import spark.implicits._
    val df = Seq(("g", 1L, 2L, 7L), ("g", 2L, 3L, 7L), ("g", 3L, 5L, 7L))
      .toDF("grp", "x", "y", "z")
    val r = RankCorr.partialCorr(df, "grp", "x", "y", "z").collect()(0)
    assert(r.isNullAt(3) && r.isNullAt(5)) // rxz, pr
  }
}
