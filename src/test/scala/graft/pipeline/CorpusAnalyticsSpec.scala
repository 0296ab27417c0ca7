package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 corpus-analytics additions: source-divergence KL report,
  * Zipf OLS fit, and the source-overlap matrix. */
class CorpusAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- sourceDivergence ------------------------------------------------

  test("KL is exactly zero for sources whose distribution equals the corpus") {
    // two sources with IDENTICAL token distributions: every per-token
    // ratio is 1, ln 1 = 0, so the e6-quantized sum is exactly 0 —
    // no float tolerance needed.
    val docs = Seq(
      ("a", "x x y"), ("a", "x y y"),
      ("b", "x x y"), ("b", "x y y")
    ).toDF("source", "text")
    val out = TextAnalysis.sourceDivergence(docs, "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out == Map("a" -> 0L, "b" -> 0L))
  }

  test("a drifted source scores strictly higher KL than conforming ones") {
    val docs = Seq(
      ("a", "x x y z"), ("b", "x x y z"),
      ("c", "z z z z") // all mass on the corpus's rarest token
    ).toDF("source", "text")
    val out = TextAnalysis.sourceDivergence(docs, "text", "source")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("c") > out("a"))
    assert(out("a") == out("b"))
    // KL >= 0 up to per-row e6 rounding (< 1 micro-unit per type)
    assert(out.values.forall(_ >= -out.size.toLong))
  }

  // ---- zipfFit ---------------------------------------------------------

  test("zipfFit recovers slope -1 and r2 ~ 1 on a planted power-law corpus") {
    // token w_i appears floor(1000/i) times: ln f = ln 1000 - ln rank
    // exactly (up to floor), so OLS must find slope ~ -1.
    val text = (1 to 50).flatMap(i => Seq.fill(1000 / i)(s"w$i")).mkString(" ")
    val out = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text").collect()(0)
    assert(out.getLong(0) == 50L)
    assert(out.getLong(1) == (1 to 50).map(1000 / _).sum.toLong)
    val slope = out.getDouble(2)
    assert(slope > -1.05 && slope < -0.95, s"slope $slope not ~ -1")
    assert(out.getDouble(4) > 0.99, s"r2 ${out.getDouble(4)} not ~ 1")
  }

  test("zipfFit rank decomposition breaks frequency ties by token") {
    // two tokens at the same frequency: ranks must be consecutive and
    // deterministic (token order), total rank range 1..n_types — pinned
    // indirectly by the exact integer sums matching a hand computation.
    val text = "a a b b c"
    val out = TextAnalysis.zipfFit(Seq(text).toDF("text"), "text").collect()(0)
    // ranks: a=1 (f=2), b=2 (f=2), c=3 (f=1);
    // x_e3 = [0, 693, 1099], y_e3 = [693, 693, 0]
    assert(out.getLong(0) == 3L && out.getLong(1) == 5L)
    val xs = Seq(0L, 693L, 1099L); val ys = Seq(693L, 693L, 0L)
    val n = 3.0
    val cov = n * xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum.toDouble * ys.sum
    val varx = n * xs.map(x => x * x).sum - xs.sum.toDouble * xs.sum
    val expSlope = BigDecimal(cov / varx)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(2) == expSlope)
  }

  // ---- sourceOverlap ---------------------------------------------------

  test("source overlap reports exact directed containment and symmetric jaccard") {
    val docs = Seq(
      ("A", "p q r s t u"),  // shingles: p_q_r q_r_s r_s_t s_t_u
      ("B", "p q r s x y"),  // shingles: p_q_r q_r_s r_s_x s_x_y
      ("C", "m n o")         // disjoint
    ).toDF("source", "text")
    val out = TextDedup.sourceOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // only the A/B pair shares shingles; C never appears.
    assert(out.keySet == Set(("A", "B"), ("B", "A")))
    assert(out(("A", "B")) == ((4L, 4L, 2L, 0.5, 0.333333)))
    assert(out(("B", "A")) == ((4L, 4L, 2L, 0.5, 0.333333)))
  }

  test("source overlap folds duplicate shingles across a source's documents") {
    // source A holds the same text twice — its distinct shingle count
    // must not double, so containment stays a set ratio.
    val docs = Seq(
      ("A", "p q r s"), ("A", "p q r s"),
      ("B", "p q r z")
    ).toDF("source", "text")
    val out = TextDedup.sourceOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out(("A", "B")) == 2L) // p_q_r, q_r_s — not 4
  }

  test("collocations: counts exact, PMI separates phrase from syntax") {
    // "san francisco" always co-occurs; "the" pairs with everything
    val docs = Seq.tabulate(6)(i =>
      (i.toLong, s"the w$i visited san francisco near the w${i + 10}"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.collocations(docs, "text", minCount = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // 6 docs x 7 bigrams = 42 bigram occurrences, 48 unigram tokens
    val (cab, ca, cb, pmi) = out(("san", "francisco"))
    assert(cab == 6L && ca == 6L && cb == 6L)
    // exact replay of the single-expression PMI quantization
    val expected = math.round(math.log((6.0 / 42.0) /
      ((6.0 / 48.0) * (6.0 / 48.0))) * 1e6)
    assert(pmi == expected)
    // "near the" (6 occurrences, but "the" has 12 unigram hits) scores
    // strictly lower than the tight phrase
    assert(out(("near", "the"))._4 < pmi)
    // nothing below the count threshold leaks through
    assert(out.keys.forall { case (w1, _) => w1 != "w0" })
  }
}
