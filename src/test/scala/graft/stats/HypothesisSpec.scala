package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Hypothesis.ksTest]] / [[Hypothesis.mannWhitneyU]] against
  * hand-computed statistics on tiny arms. */
class HypothesisSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def obs(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("grp", "arm", "v")
  }

  test("ksTest: identical samples give D = 0") {
    val df = obs(Seq(("g", 0L, 1L), ("g", 0L, 2L), ("g", 0L, 3L),
                     ("g", 1L, 1L), ("g", 1L, 2L), ("g", 1L, 3L)))
    val r = Hypothesis.ksTest(df, "grp", "arm", "v").collect()
    assert(r.length == 1)
    assert(r(0).getLong(3) == 0L) // d_e6
  }

  test("ksTest: disjoint samples give D = 1 located at arm-a's max") {
    // arm 0: {1,2}; arm 1: {10,20} — F_a jumps to 1 by v=2 while
    // F_b is still 0, so D = 1 at v = 2 (the earliest max location)
    val df = obs(Seq(("g", 0L, 1L), ("g", 0L, 2L),
                     ("g", 1L, 10L), ("g", 1L, 20L)))
    val r = Hypothesis.ksTest(df, "grp", "arm", "v").collect()(0)
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L) // n_a, n_b
    assert(r.getLong(3) == 1000000L)                 // d_e6
    assert(r.getLong(4) == 2L)                       // d_at
  }

  test("ksTest: hand case D = 1/2 with earliest-value argmax tie") {
    // arm 0: {1,2}; arm 1: {2,3}. Grid cdfs (×2): v=1 → (1,0) d=2;
    // v=2 → (2,1) d=2; v=3 → (2,2) d=0. D = 2/(2·2) = 0.5 at v=1.
    val df = obs(Seq(("g", 0L, 1L), ("g", 0L, 2L),
                     ("g", 1L, 2L), ("g", 1L, 3L)))
    val r = Hypothesis.ksTest(df, "grp", "arm", "v").collect()(0)
    assert(r.getLong(3) == 500000L)
    assert(r.getLong(4) == 1L)
  }

  test("mannWhitneyU: no ties, complete separation — U = n_a·n_b") {
    // arm 0: {3,4}, arm 1: {1,2} — every a beats every b: U_a = 4,
    // u2_a = 8. Ranks of arm a = {3,4}, R_a = 7, 2R = 14,
    // u2 = 14 − 2·3 = 8. z = (8−4)/2 / sqrt(2·2/12·(5−0)) ≈ 1.549.
    val df = obs(Seq(("g", 0L, 3L), ("g", 0L, 4L),
                     ("g", 1L, 1L), ("g", 1L, 2L)))
    val r = Hypothesis.mannWhitneyU(df, "grp", "arm", "v").collect()(0)
    assert(r.getLong(3) == 8L) // u2_a = 2U
    val z = 4.0 / 2.0 / math.sqrt(2.0 * 2.0 / 12.0 * 5.0)
    assert(r.getLong(4) == math.round(z * 1000000.0))
  }

  test("mannWhitneyU: ties take midranks and the tie correction") {
    // arm 0: {1,2}, arm 1: {2,3}. Midranks: 1→1, 2→2.5, 3→4.
    // R_a = 3.5, 2R = 7, u2 = 7 − 6 = 1 (U_a = 0.5).
    // tiesum = 2³−2 = 6; n=4: var = 4/12·(5 − 6/12) = 1.5;
    // z = (1 − 4)/2 / sqrt(1.5).
    val df = obs(Seq(("g", 0L, 1L), ("g", 0L, 2L),
                     ("g", 1L, 2L), ("g", 1L, 3L)))
    val r = Hypothesis.mannWhitneyU(df, "grp", "arm", "v").collect()(0)
    assert(r.getLong(3) == 1L)
    val z = (1.0 - 4.0) / 2.0 / math.sqrt(2.0 * 2.0 / 12.0 * (5.0 - 6.0 / 12.0))
    assert(r.getLong(4) == math.round(z * 1000000.0))
  }

  test("mannWhitneyU: all values tied — degenerate variance nulls z") {
    val df = obs(Seq(("g", 0L, 7L), ("g", 0L, 7L),
                     ("g", 1L, 7L), ("g", 1L, 7L)))
    val r = Hypothesis.mannWhitneyU(df, "grp", "arm", "v").collect()(0)
    assert(r.isNullAt(4))
  }

  test("welchT: hand-computed t and Welch-Satterthwaite df") {
    // arm0 = [10,12,14] (mean 12, var 4); arm1 = [20,24] (mean 22, var 8)
    // se2 = 4/3 + 4 = 16/3; t = -10/sqrt(16/3) = -4.330127
    // df = (16/3)^2 / ((4/3)^2/2 + 16/1) = 1.6842105
    val r = Hypothesis.welchT(obs(Seq(("g", 0L, 10L), ("g", 0L, 12L),
        ("g", 0L, 14L), ("g", 1L, 20L), ("g", 1L, 24L))),
      "grp", "arm", "v").collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getLong(3) == -4330127L, s"$r")
    assert(r.getLong(4) == 1684211L, s"$r")
  }

  test("welchT: equal arms give t = 0; degenerate variances null") {
    val same = obs(Seq(("g", 0L, 5L), ("g", 0L, 7L),
                       ("g", 1L, 5L), ("g", 1L, 7L)))
    val r = Hypothesis.welchT(same, "grp", "arm", "v").collect().head
    assert(r.getLong(3) == 0L, s"$r")
    // both arms constant: se2 = 0 -> null; tiny arm (n<2) -> null
    val flat = obs(Seq(("f", 0L, 5L), ("f", 0L, 5L),
                       ("f", 1L, 9L), ("f", 1L, 9L)))
    val rf = Hypothesis.welchT(flat, "grp", "arm", "v").collect().head
    assert(rf.isNullAt(3) && rf.isNullAt(4), s"$rf")
    val tiny = obs(Seq(("t", 0L, 5L), ("t", 1L, 9L), ("t", 1L, 11L)))
    val rt = Hypothesis.welchT(tiny, "grp", "arm", "v").collect().head
    assert(rt.isNullAt(3), s"$rt")
  }

  private def kw(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Hypothesis.kruskalWallis(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(6)).map(_.asInstanceOf[Long]))))
      .toMap
  }

  test("kruskalWallis: clean two-group separation hits the closed form") {
    // A = {1,2,3}, B = {4,5,6}: pooled ranks 1..6, no ties;
    // H = 12/(6*7) * (3*(2-3.5)^2 + 3*(5-3.5)^2) = 27/7 = 3.857143
    val rows = Seq("a" -> 1L, "a" -> 2L, "a" -> 3L,
                   "b" -> 4L, "b" -> 5L, "b" -> 6L)
    val got = kw(rows)
    assert(got("a") == ((3L, Some(3857143L))), s"$got")
    assert(got("b") == ((3L, Some(3857143L))), s"$got")
  }

  test("cochranArmitage: perfect dose trend hits the closed form") {
    // w=0: 0/2, w=1: 1/2, w=2: 2/2. N=6, R=3, U=5, wn=6, w2n=10.
    // numN = 6·5−3·6 = 12; radicand = 3·3·(6·10−36) = 216;
    // z = 12/sqrt(216/5) = 1.8257419
    import spark.implicits._
    val df = Seq((0L, 0L), (0L, 0L), (1L, 1L), (1L, 0L),
                 (2L, 1L), (2L, 1L)).toDF("w", "y")
    val r = Hypothesis.cochranArmitage(df, "w", "y").collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L && r.getLong(2) == 3L)
    assert(r.getLong(3) == math.round(12.0 / math.sqrt(216.0 / 5.0) * 1e6),
      s"$r")
  }

  test("cochranArmitage: flat rates give z = 0; constant outcome nulls") {
    import spark.implicits._
    val flat = Seq((0L, 1L), (0L, 0L), (1L, 1L), (1L, 0L)).toDF("w", "y")
    assert(Hypothesis.cochranArmitage(flat, "w", "y")
      .collect().head.getLong(3) == 0L)
    val const = Seq((0L, 0L), (1L, 0L), (2L, 0L)).toDF("w", "y")
    assert(Hypothesis.cochranArmitage(const, "w", "y")
      .collect().head.isNullAt(3))
  }

  test("cliffsDelta: separation ±1, overlap hand case, empty arm null") {
    // a = {3,4} all above b = {1,2}: δ = +1
    val sep = Hypothesis.cliffsDelta(obs(Seq(("g", 0L, 3L), ("g", 0L, 4L),
      ("g", 1L, 1L), ("g", 1L, 2L))), "grp", "arm", "v").collect().head
    assert(sep.getLong(3) == 1000000L, s"$sep")
    // a = {1,2}, b = {2,3}: gt=0, lt=3, one tie → δ = −3/4
    val mid = Hypothesis.cliffsDelta(obs(Seq(("g", 0L, 1L), ("g", 0L, 2L),
      ("g", 1L, 2L), ("g", 1L, 3L))), "grp", "arm", "v").collect().head
    assert(mid.getLong(3) == -750000L, s"$mid")
    val empty = Hypothesis.cliffsDelta(obs(Seq(("g", 0L, 1L))),
      "grp", "arm", "v").collect().head
    assert(empty.isNullAt(3), s"$empty")
  }

  private def ad(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Hypothesis.andersonDarlingK(rows.toDF("g", "v"), "g", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .toMap
  }

  test("andersonDarlingK: exact-fraction anchor on the tied fixture") {
    // a = {1,2,3,7}, b = {2,4,4,5}: the Scholz–Stephens A²akN
    // formula in exact rationals gives 0.79924853…; the engine's
    // per-cell e6 ledger (verified against the fraction computation
    // offline) lands at 799248
    val got = ad(Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "a" -> 7L,
                     "b" -> 2L, "b" -> 4L, "b" -> 4L, "b" -> 5L))
    assert(got("a") == ((4L, Some(799248L))), s"$got")
    assert(got("b") == ((4L, Some(799248L))), s"$got")
  }

  test("andersonDarlingK: identical groups score exactly 0; separation is large; degenerates null") {
    // two copies of the same sample: every cell numerator
    // N·M2 − n_g·B2 vanishes identically
    val same = ad(Seq("a" -> 1L, "a" -> 2L, "a" -> 3L,
                      "b" -> 1L, "b" -> 2L, "b" -> 3L))
    assert(same("a")._2 == Some(0L), s"$same")
    // disjoint supports (offline fraction value 2.48440065…)
    val sep = ad(Seq("a" -> 1L, "a" -> 2L, "a" -> 3L,
                     "b" -> 10L, "b" -> 11L, "b" -> 12L))
    assert(sep("a")._2 == Some(2484400L), s"$sep")
    // all values tied (single-point grid) and single group: null
    val flat = ad(Seq("a" -> 7L, "a" -> 7L, "b" -> 7L))
    assert(flat("a")._2.isEmpty, s"$flat")
    val one = ad(Seq("a" -> 1L, "a" -> 2L))
    assert(one("a")._2.isEmpty, s"$one")
  }

  test("gTest: exact independence gives 0; diagonal table hits 40·ln2") {
    import spark.implicits._
    // perfectly independent 2×2 (every cell 1): every E = O → G = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val r0 = Hypothesis.gTest(ind, "u", "v").collect().head
    assert(r0.getLong(4) == 0L && r0.getLong(3) == 1L, s"$r0")
    // [[10,0],[0,10]]: G = 4·10·ln2 — per-cell e6 round 6931472,
    // doubled sum 27725888
    val diag = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("u", "v")
    val r1 = Hypothesis.gTest(diag, "u", "v").collect().head
    assert(r1.getLong(0) == 20L && r1.getLong(4) == 27725888L, s"$r1")
  }

  test("ansariBradley: tails-vs-center hand case hits z = −√3; symmetry gives 0") {
    // arm0 = {1,4} (tails), arm1 = {2,3} (center): doubled scores
    // 2,4,4,2 → W2 = 4, S1 = 12, S2q = 40; numN = −8, radicand = 64,
    // z = −8/√(64/3) = −√3
    val tails = Hypothesis.ansariBradley(obs(Seq(("g", 0L, 1L),
      ("g", 0L, 4L), ("g", 1L, 2L), ("g", 1L, 3L))),
      "grp", "arm", "v").collect().head
    assert(tails.getLong(3) == 4L, s"$tails")
    assert(tails.getLong(4) ==
      math.round(-8.0 / math.sqrt(64.0 / 3.0) * 1e6), s"$tails")
    // identical arms: numerator exactly 0
    val same = Hypothesis.ansariBradley(obs(Seq(("g", 0L, 1L),
      ("g", 0L, 2L), ("g", 0L, 3L), ("g", 1L, 1L), ("g", 1L, 2L),
      ("g", 1L, 3L))), "grp", "arm", "v").collect().head
    assert(same.getLong(4) == 0L, s"$same")
    // every pooled score equal (two tie blocks mirror each other):
    // score variance 0 → null
    val flat = Hypothesis.ansariBradley(obs(Seq(("g", 0L, 1L),
      ("g", 0L, 2L), ("g", 1L, 1L), ("g", 1L, 2L))),
      "grp", "arm", "v").collect().head
    assert(flat.isNullAt(4), s"$flat")
  }

  private def jt(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    val r = Hypothesis.jonckheereTerpstra(rows.toDF("g", "v"), "g", "v")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
     Option(r.get(4)).map(_.asInstanceOf[Long]))
  }

  test("jonckheereTerpstra: ordered separation hits the closed form") {
    // g1 = {1,2} < g2 = {3,4}: J = 4 (max), E = 2, Var = 5/3,
    // z = 2/√(5/3) = 1.5491933
    val r = jt(Seq((1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L)))
    assert(r._3 == 8L && r._4 == 4L, s"$r") // J2, E2
    assert(r._5 == Some(math.round(2.0 / math.sqrt(5.0 / 3.0) * 1e6)),
      s"$r")
  }

  test("jonckheereTerpstra: ties at half credit and the tie-corrected variance") {
    // g1 = {1,1}, g2 = {1,2}: U = 2 + ½·2 = 3 → J2 = 6; E2 = 4;
    // Var = 54/72 + 0 + 24/96 = 1.0 → z = (6−4)/2/1 = 1 exactly
    val r = jt(Seq((1L, 1L), (1L, 1L), (2L, 1L), (2L, 2L)))
    assert(r == ((4L, 2L, 6L, 4L, Some(1000000L))), s"$r")
  }

  test("jonckheereTerpstra: all-tied and single-group degenerate to null") {
    assert(jt(Seq((1L, 5L), (1L, 5L), (2L, 5L), (2L, 5L)))._5.isEmpty)
    assert(jt(Seq((1L, 1L), (1L, 2L)))._5.isEmpty)
  }

  private def fr(rows: Seq[(String, String, Long)]) = {
    import spark.implicits._
    Hypothesis.friedman(rows.toDF("blk", "trt", "v"), "blk", "trt", "v")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .toMap
  }

  test("friedman: textbook no-tie case χ² = 4; incomplete blocks drop") {
    // two blocks, both ranking t1 < t2 < t3: χ²_F = 4 exactly
    val base = Seq(("b1", "t1", 1L), ("b1", "t2", 2L), ("b1", "t3", 3L),
                   ("b2", "t1", 10L), ("b2", "t2", 20L), ("b2", "t3", 30L))
    val got = fr(base)
    assert(got("t1") == ((2L, Some(4000000L))), s"$got")
    // a block missing t3 is dropped — statistic unchanged
    val extra = fr(base ++ Seq(("b3", "t1", 5L), ("b3", "t2", 6L)))
    assert(extra("t1") == ((2L, Some(4000000L))), s"$extra")
  }

  test("friedman: within-block midranks; fully-tied blocks null") {
    // one block (1,1,2): doubled midranks 3,3,6 → num=6, den=6,
    // χ² = (k−1)·num/den = 2
    val t1 = fr(Seq(("b", "t1", 1L), ("b", "t2", 1L), ("b", "t3", 2L)))
    assert(t1("t3") == ((1L, Some(2000000L))), s"$t1")
    val flat = fr(Seq(("b", "t1", 5L), ("b", "t2", 5L), ("b", "t3", 5L)))
    assert(flat("t1")._2.isEmpty, s"$flat")
  }

  test("pageTrend: perfect monotone blocks hit the closed form; ties; k<3 null") {
    import spark.implicits._
    def pt(rows: Seq[(String, Long, Long)]) =
      Hypothesis.pageTrend(rows.toDF("blk", "dose", "v"), "blk", "dose", "v")
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(5), Option(r.get(6)).map(_.asInstanceOf[Long]))))
        .toMap
    // two blocks, both increasing with dose: L = 28 (its maximum),
    // L2 = 56, E[L2] = 48, Var[L2] = 2·9·16·2/36 = 16 → z = 8/4 = 2
    // (scipy.page_trend_test on the undoubled scale: (28−24)/√4 = 2)
    val got = pt(Seq(("b1", 1L, 1L), ("b1", 2L, 2L), ("b1", 3L, 3L),
                     ("b2", 1L, 10L), ("b2", 2L, 20L), ("b2", 3L, 30L)))
    assert(got(1L) == ((56L, Some(2000000L))), s"$got")
    // midranks: one block (1,1,2) → L2 = 1·3+2·3+3·6 = 27, z = 3/√8
    val tied = pt(Seq(("b", 1L, 1L), ("b", 2L, 1L), ("b", 3L, 2L)))
    assert(tied(3L) == ((27L, Some(1060660L))), s"$tied")
    // two doses: nothing to sharpen — z null
    assert(pt(Seq(("b", 1L, 1L), ("b", 2L, 2L)))(1L)._2.isEmpty)
  }

  test("kendallW: concordant = 1, reversed pair = 0, fully tied null") {
    import spark.implicits._
    def kwc(rows: Seq[(String, Long, Long)]) = {
      val r = Hypothesis.kendallW(rows.toDF("blk", "trt", "v"),
        "blk", "trt", "v").collect().head
      (r.getLong(0), r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Long]))
    }
    val agree = kwc(Seq(("b1", 1L, 1L), ("b1", 2L, 2L), ("b1", 3L, 3L),
                        ("b2", 1L, 5L), ("b2", 2L, 7L), ("b2", 3L, 9L)))
    assert(agree == ((2L, 3L, Some(1000000L))), s"$agree")
    val oppose = kwc(Seq(("b1", 1L, 1L), ("b1", 2L, 2L), ("b1", 3L, 3L),
                         ("b2", 1L, 9L), ("b2", 2L, 7L), ("b2", 3L, 5L)))
    assert(oppose == ((2L, 3L, Some(0L))), s"$oppose")
    val flat = kwc(Seq(("b1", 1L, 4L), ("b1", 2L, 4L), ("b1", 3L, 4L)))
    assert(flat._3.isEmpty, s"$flat")
  }

  test("moodMedian: 2x2 closed form chi2 = 4; degenerate marginals null") {
    import spark.implicits._
    def mm(rows: Seq[(String, Long, Long)]) =
      Hypothesis.moodMedian(rows.toDF("grp", "arm", "v"), "grp", "arm", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4),
            Option(r.get(5)).map(_.asInstanceOf[Long]))))
        .toMap
    // arm0 = {1,2}, arm1 = {3,4}: lower median 2 (rank (4+1) div 2),
    // cells (0,2)/(2,0), every expected count 1 → χ² = 4
    val got = mm(Seq(("g", 0L, 1L), ("g", 0L, 2L),
                     ("g", 1L, 3L), ("g", 1L, 4L)))
    assert(got(("g", 0L)) == ((0L, 2L, 2L, Some(4000000L))), s"$got")
    assert(got(("g", 1L)) == ((2L, 0L, 2L, Some(4000000L))), s"$got")
    // all values equal: nothing above the median → null
    val flat = mm(Seq(("g", 0L, 5L), ("g", 1L, 5L)))
    assert(flat(("g", 0L))._4.isEmpty, s"$flat")
    // single arm: k < 2 → null
    val one = mm(Seq(("g", 0L, 1L), ("g", 0L, 9L)))
    assert(one(("g", 0L))._4.isEmpty, s"$one")
  }

  test("kruskalWallis: tie correction matches scipy; all-tied is null") {
    // A = {1,1}, B = {2,2}: doubled midranks 3,3,7,7; H0 = 2.4,
    // tiesum = 12, C = 0.8 -> H = 3.0 (scipy.kruskal gives 3.0)
    val tied = kw(Seq("a" -> 1L, "a" -> 1L, "b" -> 2L, "b" -> 2L))
    assert(tied("a")._2 == Some(3000000L), s"$tied")
    // every value equal: C = 0 -> null
    val flat = kw(Seq("a" -> 7L, "a" -> 7L, "b" -> 7L))
    assert(flat("a")._2.isEmpty && flat("b")._2.isEmpty, s"$flat")
    // single group: k < 2 -> null
    val one = kw(Seq("a" -> 1L, "a" -> 2L))
    assert(one("a")._2.isEmpty, s"$one")
  }
}
