package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[PairedRank]] / [[Multiplicity]] and the new [[Hypothesis]] /
  * [[Diagnostics]] members against hand-computed anchors (every
  * value derived from the published formula on a case small enough
  * to verify by hand — see the per-test derivations). */
class PairedRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def dobs(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("grp", "d")
  }

  private def aobs(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("grp", "arm", "v")
  }

  private def series(key: String, ys: Seq[Long]) = {
    import spark.implicits._
    ys.zipWithIndex.map { case (y, i) =>
      (key, java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), y)
    }.toDF("series", "ds", "y")
  }

  // --- Wilcoxon signed-rank -------------------------------------
  // d = [3,−1,2,−2,4,5]: |d| ranks 1→1, 2→2.5/2.5 (doubled 5,5),
  // 3→4 (8), 4→5 (10), 5→6 (12); W2⁺ = 8+5+10+12 = 35; E = 21;
  // tiesum = 2³−2 = 6; Var = 6·7·13/6 − 0.5 = 90.5;
  // z = 14/√90.5 → 1471647 e6.
  test("wilcoxonSignedRank: hand case with one tie block") {
    val r = PairedRank.wilcoxonSignedRank(
      dobs(Seq(("g", 3L), ("g", -1L), ("g", 2L), ("g", -2L),
               ("g", 4L), ("g", 5L))), "grp", "d").collect()(0)
    assert(r.getLong(1) == 6L)       // n_pairs
    assert(r.getLong(2) == 35L)      // w2_plus
    assert(r.getLong(3) == 6L)       // tiesum
    assert(r.getLong(4) == 1471647L) // z_e6
  }

  test("wilcoxonSignedRank: zeros dropped, all-tied |d| is the " +
       "n=1-style degenerate variance guard") {
    val r = PairedRank.wilcoxonSignedRank(
      dobs(Seq(("g", 0L), ("g", 5L))), "grp", "d").collect()(0)
    assert(r.getLong(1) == 1L)
    // n=1: W2⁺ = r2 = 2, E = 1, Var = 1·2·3/6 = 1 → z = 1
    assert(r.getLong(4) == 1000000L)
  }

  // --- exact sign test ------------------------------------------
  // n=6, s=4: m=2, tail = C(6,0)+C(6,1)+C(6,2) = 22, num = 44,
  // p = 44/64 → 687500 e6.
  test("signTestExact: binomial tail exact rational") {
    val r = PairedRank.signTestExact(
      dobs(Seq(("g", 3L), ("g", -1L), ("g", 2L), ("g", -2L),
               ("g", 4L), ("g", 5L))), "grp", "d").collect()(0)
    assert(r.getLong(1) == 6L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 687500L)
  }

  test("signTestExact: balanced split caps p at 1") {
    val r = PairedRank.signTestExact(
      dobs(Seq(("g", 1L), ("g", -1L))), "grp", "d").collect()(0)
    assert(r.getLong(3) == 1000000L)
  }

  // --- Quade test ------------------------------------------------
  // Conover-style 4 blocks × 3 treatments, no within-block ties:
  // S_A=3, S_B=7, S_C=−10 (4-scaled: 12, 28, −40), F = 5.780488.
  test("quadeTest: hand case matches the published formula") {
    import spark.implicits._
    val df = Seq(
      (1L, "A", 52L), (1L, "B", 45L), (1L, "C", 38L),
      (2L, "A", 63L), (2L, "B", 79L), (2L, "C", 50L),
      (3L, "A", 45L), (3L, "B", 57L), (3L, "C", 39L),
      (4L, "A", 53L), (4L, "B", 51L), (4L, "C", 43L))
      .toDF("b", "t", "y")
    val r = PairedRank.quadeTest(df, "b", "t", "y")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("A").getLong(1) == 12L)
    assert(r("B").getLong(1) == 28L)
    assert(r("C").getLong(1) == -40L)
    assert(r("A").getLong(2) == 4L && r("A").getLong(3) == 3L)
    assert(r("A").getLong(4) == 5780488L)
  }

  // --- Cramér–von Mises -----------------------------------------
  // A = {1,2,3}, B = {2,3,4} with midranks: U4 = 240,
  // T = U/(nmN) − (4nm−1)/(6N) → 138889 e6.
  test("cramerVonMises: hand case with ties across arms") {
    val r = Hypothesis.cramerVonMises(
      aobs(Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 0L, 3L),
               ("g", 1L, 2L), ("g", 1L, 3L), ("g", 1L, 4L))),
      "grp", "arm", "v").collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 240L)     // u4
    assert(r.getLong(4) == 138889L)  // t_e6
  }

  test("cramerVonMises: identical arms land at T = 0 here") {
    // A = B = {1,2}: per tie block (ca=cb=1, c=2) the doubled gaps
    // are (3−2)² = 1 and (7−4)² = 9 per arm → sa = sb = 10,
    // U4 = 2·10 + 2·10 = 40; T = 10/16 − 15/24 = 0
    val r = Hypothesis.cramerVonMises(
      aobs(Seq(("g", 0L, 1L), ("g", 0L, 2L),
               ("g", 1L, 1L), ("g", 1L, 2L))),
      "grp", "arm", "v").collect()(0)
    assert(r.getLong(3) == 40L)
    assert(r.getLong(4) == 0L)
  }

  // --- Mantel–Haenszel ------------------------------------------
  // strata (a,b,c,d): (10,5,4,11) and (6,9,5,10) → Σa = 16,
  // chi2 = 2.411086, OR_MH = 2.615385 (per-stratum e6 truncation).
  test("mantelHaenszel: two-stratum hand case") {
    import spark.implicits._
    def stratum(s: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((s, 1L, 1L)) ++ Seq.fill(b)((s, 1L, 0L)) ++
        Seq.fill(c)((s, 0L, 1L)) ++ Seq.fill(d)((s, 0L, 0L))
    val df = (stratum("s1", 10, 5, 4, 11) ++ stratum("s2", 6, 9, 5, 10))
      .toDF("st", "e", "o")
    val r = Hypothesis.mantelHaenszel(df, "st", "e", "o").collect()
    assert(r.length == 2)
    val row = r.find(_.getString(0) == "s1").get
    assert(row.getLong(1) == 10L && row.getLong(2) == 15L &&
           row.getLong(3) == 14L && row.getLong(4) == 30L)
    assert(row.getLong(5) == 2411086L) // chi2_e6
    assert(row.getLong(6) == 2615385L) // or_e6
  }

  // --- Hodges–Lehmann -------------------------------------------
  // A = {1,5,7}, B = {2,4}: diffs sorted −3,−1,1,3,3,5 → lower
  // median at position 3 → 1.
  test("hodgesLehmannShift: lower median of pairwise differences") {
    val r = Hypothesis.hodgesLehmannShift(
      aobs(Seq(("g", 0L, 1L), ("g", 0L, 5L), ("g", 0L, 7L),
               ("g", 1L, 2L), ("g", 1L, 4L))),
      "grp", "arm", "v").collect()(0)
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == 6L)  // n_pairs
    assert(r.getLong(4) == 1L)  // hl_c
  }

  test("hodgesLehmannShift: empty arm yields null hl") {
    val r = Hypothesis.hodgesLehmannShift(
      aobs(Seq(("g", 0L, 1L), ("g", 0L, 2L))),
      "grp", "arm", "v").collect()(0)
    assert(r.getLong(3) == 0L)
    assert(r.isNullAt(4))
  }

  // --- turning points -------------------------------------------
  // [1,3,2,5,4]: turns at 3, 2, 5 → T = 3; z = (3 − 2)/√(51/90)
  // → 1328422 e6.
  test("turningPointTest: hand case") {
    val r = Diagnostics.turningPointTest(series("s", Seq(1L, 3L, 2L, 5L, 4L)),
      "series").collect()(0)
    assert(r.getLong(1) == 5L && r.getLong(2) == 3L)
    assert(r.getLong(3) == 1328422L)
  }

  test("turningPointTest: plateaus are not strict turns") {
    // [1,3,3,1]: no strict peak (3 == 3) → T = 0
    val r = Diagnostics.turningPointTest(series("s", Seq(1L, 3L, 3L, 1L)),
      "series").collect()(0)
    assert(r.getLong(2) == 0L)
  }

  // --- Bartels RVN ----------------------------------------------
  // monotone [1..5]: doubled ranks 2,4,6,8,10; NM4 = 16, D4 = 40,
  // RVN = 0.4; exact Var = 0.53; z = −1.6/√0.53 → −2197769 e6.
  test("bartelsRvn: monotone series reads far below 2") {
    val r = Diagnostics.bartelsRvn(series("s", Seq(1L, 2L, 3L, 4L, 5L)),
      "series").collect()(0)
    assert(r.getLong(1) == 5L)
    assert(r.getLong(2) == 16L && r.getLong(3) == 40L)
    assert(r.getLong(4) == 400000L)
    assert(r.getLong(5) == -2197769L)
  }

  test("bartelsRvn: constant series yields nulls") {
    val r = Diagnostics.bartelsRvn(series("s", Seq(7L, 7L, 7L)),
      "series").collect()(0)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  // --- Grubbs ----------------------------------------------------
  // v = {1,2,3,10}: devs |4v − 16| = 12,8,4,24 → max at v = 10;
  // s² = (114 − 64)/3; G = 6/√(50/3) → 1469694 e6.
  test("grubbsMax: hand case, argmax at the extreme value") {
    import spark.implicits._
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 10L))
      .toDF("grp", "v")
    val r = Hypothesis.grubbsMax(df, "grp", "v").collect()(0)
    assert(r.getLong(1) == 4L)
    assert(r.getLong(2) == 10L)      // x_at
    assert(r.getLong(3) == 1469694L) // g_e6
  }

  test("grubbsMax: constant group yields null G") {
    import spark.implicits._
    val df = Seq(("g", 5L), ("g", 5L), ("g", 5L)).toDF("grp", "v")
    val r = Hypothesis.grubbsMax(df, "grp", "v").collect()(0)
    assert(r.isNullAt(3))
  }

  // --- Cox–Stuart ------------------------------------------------
  // [1..6]: c = 3, pairs (1,4),(2,5),(3,6) all rising → n_pairs = 3,
  // n_pos = 3, p = 2·C(3,0)/2³ = 1/4 → 250000 e6.
  test("coxStuart: monotone series gives the exact one-sided-tail p") {
    val r = Diagnostics.coxStuart(
      series("s", Seq(1L, 2L, 3L, 4L, 5L, 6L)), "series").collect()(0)
    assert(r.getLong(1) == 6L && r.getLong(2) == 3L && r.getLong(3) == 3L)
    assert(r.getLong(4) == 250000L)
  }

  test("coxStuart: odd length drops the middle point") {
    // [5,1,9,2,7]: c = 3, pairs (x1,x4) = (5,2) ↓ and (x2,x5) =
    // (1,7) ↑ — the middle x3 pairs with nothing
    val r = Diagnostics.coxStuart(
      series("s", Seq(5L, 1L, 9L, 2L, 7L)), "series").collect()(0)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 1000000L) // s = n/2 → p capped at 1
  }

  // --- Benjamini–Hochberg ---------------------------------------
  // p = [.01,.02,.04,.5], m = 4: raw adj = [40000,40000,53333,
  // 500000]; suffix-min keeps them; rejections at q=5%: first two.
  test("bhAdjust: step-up ledger on a 4-test battery") {
    import spark.implicits._
    val df = Seq(("t1", 10000L), ("t2", 20000L), ("t3", 40000L),
                 ("t4", 500000L)).toDF("test", "p_e6")
    val r = Multiplicity.bhAdjust(df, "test", "p_e6")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("t1").getLong(4) == 40000L && r("t1").getLong(5) == 1L)
    assert(r("t2").getLong(4) == 40000L && r("t2").getLong(5) == 1L)
    assert(r("t3").getLong(4) == 53333L && r("t3").getLong(5) == 0L)
    assert(r("t4").getLong(4) == 500000L && r("t4").getLong(5) == 0L)
  }

  test("bhAdjust: suffix-min monotonizes an inversion") {
    import spark.implicits._
    // p = [.04, .05], m = 2: raw = [80000, 50000] — the rank-1 raw
    // exceeds the rank-2 raw; BH assigns both min(80000, 50000)=...
    // suffix-min from the largest p: t2 → 50000; t1 → min(80000,
    // 50000) = 50000
    val df = Seq(("t1", 40000L), ("t2", 50000L)).toDF("test", "p_e6")
    val r = Multiplicity.bhAdjust(df, "test", "p_e6")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("t1").getLong(4) == 50000L)
    assert(r("t2").getLong(4) == 50000L)
  }
}
