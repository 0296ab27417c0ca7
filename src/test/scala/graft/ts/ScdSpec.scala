package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Scd.scd2]] — change detection, interval chaining, same-day
  * ordering, and the open current version. */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("scd2 collapses repeats and chains validity intervals") {
    import spark.implicits._
    val ch = Seq(
      // entity 1: A, A (repeat, dropped), B, B (dropped), A again (kept)
      (1L, d("2024-01-01"), "A", 10L),
      (1L, d("2024-01-05"), "A", 11L),
      (1L, d("2024-02-01"), "B", 12L),
      (1L, d("2024-02-10"), "B", 13L),
      (1L, d("2024-03-01"), "A", 14L),
      // entity 2: same-day flip ordered by id: A (id 20) then B (id 21)
      (2L, d("2024-01-01"), "A", 20L),
      (2L, d("2024-01-01"), "B", 21L))
      .toDF("k", "dd", "attr", "oid")
    val got = Scd.scd2(ch, "k", "dd", "attr", "oid")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
        if (r.isNullAt(3)) "open" else r.getDate(3).toString,
        r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(
      (1L, "A", "2024-01-01", "2024-02-01", 1L, 0L),
      (1L, "B", "2024-02-01", "2024-03-01", 2L, 0L),
      (1L, "A", "2024-03-01", "open", 3L, 1L),
      (2L, "A", "2024-01-01", "2024-01-01", 1L, 0L),
      (2L, "B", "2024-01-01", "open", 2L, 1L)))
  }
}
