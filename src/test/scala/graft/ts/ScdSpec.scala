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

  test("applyCdc: latest wins, trailing tombstone kills, re-insert revives") {
    import spark.implicits._
    val ch = Seq(
      // key 1: two upserts — latest (seq 3) wins
      (1L, 1L, 10L, "upsert", 100L),
      (1L, 3L, 11L, "upsert", 300L),
      // key 2: upsert then DELETE last — key absent from the state
      (2L, 1L, 20L, "upsert", 100L),
      (2L, 2L, 21L, "delete", 0L),
      // key 3: delete then re-insert — key survives with the new value
      (3L, 1L, 30L, "delete", 0L),
      (3L, 2L, 31L, "upsert", 700L),
      // key 4: same seq, id breaks the tie (id 41 wins)
      (4L, 5L, 40L, "upsert", 1L),
      (4L, 5L, 41L, "upsert", 2L))
      .toDF("k", "seq", "oid", "op", "v")
    val got = Scd.applyCdc(ch, "k", "op", "delete",
        Seq("seq", "oid"), Seq("v"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 11L, 300L, 2L)),
      3L -> ((2L, 31L, 700L, 2L)),
      4L -> ((5L, 41L, 2L, 2L))))
    assert(!got.contains(2L))
  }
}
