package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Sprt.sprtLedger]] — driver-quantized literals, boundary
  * crossings in both directions, and the frozen-decision contract. */
class SprtSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  private def run(rows: Seq[(String, java.sql.Date, Long, Long)]) =
    Sprt.sprtLedger(rows.toDF("k", "dd", "s", "n"),
        "k", "dd", "s", "n", p0 = 0.5, p1 = 0.55)
      .collect().map { r =>
        r.getString(0) -> ((r.getLong(1), r.getLong(4), r.getLong(5),
          Option(r.getDate(6)).map(_.toString)))
      }.toMap

  test("literals quantize the four log terms on the driver") {
    val (l1, l0, a, b) = Sprt.literals(0.5, 0.55, 0.05, 0.2)
    assert(l1 == math.round(math.log(1.1) * 1e6))
    assert(l0 == math.round(math.log(0.9) * 1e6))
    assert(a == math.round(math.log(16.0) * 1e6))
    assert(b == math.round(math.log(0.2 / 0.95) * 1e6))
    assert(l1 > 0 && l0 < 0 && a > 0 && b < 0)
  }

  test("all-success day crosses the H1 boundary immediately; llr exact") {
    val (l1, _, a, _) = Sprt.literals(0.5, 0.55, 0.05, 0.2)
    val got = run(Seq(("x", d("2024-01-01"), 30L, 30L),
                      ("x", d("2024-01-02"), 30L, 30L)))
    assert(30L * l1 >= a) // the fixture really crosses on day 1
    val (nDays, llr, dec, day) = got("x")
    assert(nDays == 2L && dec == 1L && day == Some("2024-01-01"))
    assert(llr == 60L * l1) // final trajectory value
  }

  test("balanced days drift to H0 at the hand-computed crossing day") {
    val (l1, l0, _, b) = Sprt.literals(0.5, 0.55, 0.05, 0.2)
    // 10/20 per day: llr(t) = 10t·(l1 + l0) — first t with ≤ b
    val perDay = 10L * (l1 + l0)
    val tCross = (1 to 100).find(t => perDay * t <= b).get
    val rows = (1 to tCross + 3).map(i =>
      ("x", d(f"2024-01-${i}%02d"), 10L, 20L))
    val (_, _, dec, day) = run(rows)("x")
    assert(dec == -1L && day == Some(f"2024-01-${tCross}%02d"))
  }

  test("the first crossing FREEZES the decision against later evidence") {
    val (l1, _, a, bLit) = Sprt.literals(0.5, 0.55, 0.05, 0.2)
    // day 1: 20 failures — crosses H0 at once; then overwhelming
    // successes push the trajectory above the H1 boundary — the
    // decision must stay −1 from day 1
    val rows = Seq(("x", d("2024-01-01"), 0L, 20L),
                   ("x", d("2024-01-02"), 500L, 500L),
                   ("x", d("2024-01-03"), 500L, 500L))
    val got = Sprt.sprtLedger(rows.toDF("k", "dd", "s", "n"),
        "k", "dd", "s", "n", 0.5, 0.55).collect().head
    assert(got.getLong(5) == -1L, s"$got")
    assert(got.getDate(6).toString == "2024-01-01")
    assert(got.getLong(4) > a, s"llr ${got.getLong(4)} should exceed $a")
    assert(20L * math.abs(graft.ts.Sprt.literals(0.5, 0.55, 0.05, 0.2)._2)
      >= math.abs(bLit)) // fixture sanity: day 1 really crosses
  }

  test("a test that never crosses reports decision 0 with no day") {
    // one balanced day: llr tiny, inside both boundaries
    val got = run(Seq(("x", d("2024-01-01"), 1L, 2L)))
    val (_, _, dec, day) = got("x")
    assert(dec == 0L && day.isEmpty)
  }
}
