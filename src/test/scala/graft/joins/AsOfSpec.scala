package graft.joins

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join: latest right row at or before each left row") {
    val left = Seq(
      ("a", ts("2024-01-02 05:00:00"), 1L),
      ("a", ts("2024-01-01 00:30:00"), 2L),
      ("a", ts("2023-12-30 00:00:00"), 3L), // before any right row → null
      ("a", ts("2024-01-02 00:00:00"), 4L), // exact tie → inclusive
      ("b", ts("2024-01-02 05:00:00"), 5L)  // series b has its own rights
    ).toDF("series", "ds", "id")
    val right = Seq(
      ("a", ts("2024-01-01 00:00:00"), 10.0),
      ("a", ts("2024-01-02 00:00:00"), 20.0),
      ("b", ts("2024-01-02 00:00:00"), 99.0)
    ).toDF("series", "ds", "v")

    val out = AsOf.asOfJoin(left, right, Seq("v"), Seq("series")).collect()
      .map(r => r.getLong(2) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L).contains(20.0))
    assert(out(2L).contains(10.0))
    assert(out(3L).isEmpty)
    assert(out(4L).contains(20.0))
    assert(out(5L).contains(99.0))
  }

  test("all value columns come from the SAME matched right row, nulls included") {
    // the nearest right row holds a NULL in one value column; per-column
    // running-last would pull v1 from the older row — row-attach keeps it null
    val left = Seq(("a", ts("2024-01-03 00:00:00"), 1L)).toDF("series", "ds", "id")
    val right = Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(10.0), Some(100.0)),
      ("a", ts("2024-01-02 00:00:00"), None, Some(200.0))
    ).toDF("series", "ds", "v1", "v2")
    val r = AsOf.asOfJoin(left, right, Seq("v1", "v2"), Seq("series")).collect().head
    assert(r.isNullAt(r.fieldIndex("v1")), "v1 must be the matched row's null, not 10.0")
    assert(r.getDouble(r.fieldIndex("v2")) == 200.0)
  }

  test("row count preserved and right rows never leak") {
    val left = (1 to 100).map(i => ("s", ts(f"2024-01-${i % 28 + 1}%02d 12:00:00"), i.toLong))
      .toDF("series", "ds", "id")
    val right = (1 to 10).map(i => ("s", ts(f"2024-01-${i * 2}%02d 00:00:00"), i.toDouble))
      .toDF("series", "ds", "v")
    val out = AsOf.asOfJoin(left, right, Seq("v"), Seq("series"))
    assert(out.count() == 100)
    assert(out.columns.toSet == Set("series", "ds", "id", "v"))
  }
}
