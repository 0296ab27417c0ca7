package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Concentration.gini]] against closed-form hand cases. */
class ConcentrationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Concentration.gini(rows.toDF("grp", "x"), "grp", "x")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("gini: {1,2,3,4} is exactly 0.25; top decile = the single max") {
    val got = run(Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L)))
    assert(got("g") == ((4L, 10L, 250000L, 400000L)))
  }

  test("gini: equal values give 0 regardless of tie order") {
    val got = run(Seq.fill(7)(("g", 5L)))
    // top ceil(7/10) = 1 member of 7 equals holds 1/7 of the total
    assert(got("g")._3 == 0L)
    assert(got("g")._4 == math.round(5.0 / 35.0 * 1000000.0))
  }

  test("gini: {0,10} maximal two-member inequality = 0.5") {
    val got = run(Seq(("g", 0L), ("g", 10L)))
    assert(got("g") == ((2L, 10L, 500000L, 1000000L)))
  }

  test("gini: groups are independent") {
    val got = run(Seq(("a", 1L), ("a", 1L), ("b", 0L), ("b", 10L)))
    assert(got("a")._3 == 0L)
    assert(got("b")._3 == 500000L)
  }

  test("abcClasses: exact integer thresholds, descending cumulative") {
    import spark.implicits._
    // total 100: cum 50 (A, 5000 ≤ 7000), 80 (B, 8000 ≤ 9000),
    // 95 (C), 100 (C)
    val df = Seq(("g", 1L, 50L), ("g", 2L, 30L), ("g", 3L, 15L),
                 ("g", 4L, 5L)).toDF("grp", "id", "x")
    val got = Concentration.abcClasses(df, "grp", "id", "x")
      .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getString(4))))
      .toMap
    assert(got == Map(1L -> ((50L, "A")), 2L -> ((80L, "B")),
                      3L -> ((95L, "C")), 4L -> ((100L, "C"))))
  }

  test("abcClasses: value ties order by id deterministically") {
    import spark.implicits._
    // two equal 50s, total 100: first by id is cum 50 → A, second is
    // cum 100 → C regardless of physical row order
    val df = Seq(("g", 9L, 50L), ("g", 3L, 50L)).toDF("grp", "id", "x")
    val got = Concentration.abcClasses(df, "grp", "id", "x")
      .collect().map(r => r.getLong(1) -> r.getString(4)).toMap
    assert(got == Map(3L -> "A", 9L -> "C"))
  }
}
