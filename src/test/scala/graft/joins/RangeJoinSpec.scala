package graft.joins

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[RangeJoin.rangeJoin]] — the bucketized interval join must equal
  * the naive BETWEEN predicate at every bucket width, emit no
  * duplicates for intervals spanning many buckets, and keep both ends
  * inclusive. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixtures() = {
    import spark.implicits._
    // deterministic scatter: 300 points, 40 intervals of mixed lengths
    // (0-width, sub-bucket, multi-bucket), two key groups
    val pts = (0 until 300).map(i =>
      (i.toLong, s"u${i % 2}", (i * 37 % 1000).toLong)).toDF("pid", "u", "t")
    val ivs = (0 until 40).map { j =>
      val s = (j * 53 % 900).toLong
      (j.toLong, s"u${j % 2}", s, s + (j % 5) * 70L)
    }.toDF("iid", "u", "lo", "hi")
    (pts, ivs)
  }

  test("bucketized join equals the naive BETWEEN join at several widths") {
    val (pts, ivs) = fixtures()
    val naive = pts.join(ivs, Seq("u"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 7L, 64L, 100L, 5000L)) {
      val got = RangeJoin.rangeJoin(pts, ivs, "t", "lo", "hi", Seq("u"), w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"w=$w emitted duplicates")
      assert(got.toSet == naive, s"w=$w diverged from the naive join")
    }
  }

  test("both interval ends are inclusive; outside points don't match") {
    import spark.implicits._
    val pts = Seq((1L, "k", 99L), (2L, "k", 100L), (3L, "k", 150L),
                  (4L, "k", 200L), (5L, "k", 201L)).toDF("pid", "u", "t")
    val ivs = Seq((0L, "k", 100L, 200L)).toDF("iid", "u", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, ivs, "t", "lo", "hi", Seq("u"), 60L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L, 4L))
  }

  test("keys separate: a point never matches another key's interval") {
    import spark.implicits._
    val pts = Seq((1L, "a", 50L), (2L, "b", 50L)).toDF("pid", "u", "t")
    val ivs = Seq((0L, "a", 0L, 100L)).toDF("iid", "u", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, ivs, "t", "lo", "hi", Seq("u"), 10L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("plan shape: the decomposition never plans a nested-loop join") {
    val (pts, ivs) = fixtures()
    val plan = RangeJoin.rangeJoin(pts, ivs, "t", "lo", "hi", Seq("u"), 64L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    // the naive predicate on the same inputs DOES — the trap this op removes
    val naive = pts.join(ivs, col("t") >= col("lo") && col("t") <= col("hi"))
      .queryExecution.executedPlan.toString
    assert(naive.contains("BroadcastNestedLoop"))
  }

  test("negative domains bucket correctly (floor, not truncate-toward-zero)") {
    import spark.implicits._
    val pts = Seq((1L, "k", -150L), (2L, "k", -50L), (3L, "k", 50L))
      .toDF("pid", "u", "t")
    val ivs = Seq((0L, "k", -100L, 0L)).toDF("iid", "u", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, ivs, "t", "lo", "hi", Seq("u"), 60L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L))
  }
}
