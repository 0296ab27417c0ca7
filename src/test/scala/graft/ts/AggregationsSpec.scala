package graft.ts

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AggregationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // duplicate timestamps on one day, distinct on another (A1 dedupe)
  private lazy val dup = Seq(
    (ts("2024-03-11 10:00:00"), 1.0),
    (ts("2024-03-11 11:00:00"), 3.0),
    (ts("2024-03-11 12:00:00"), 2.0),
    (ts("2024-03-12 09:00:00"), 10.0)
  ).toDF("ds", "y")

  test("groupByTime dedupes duplicate buckets under every aggregation") {
    def agg(a: String): Map[Timestamp, Double] =
      Aggregations.groupByTime(dup, Some("D"), a)
        .collect().map(r => r.getTimestamp(0) -> r.getDouble(1)).toMap
    val d1 = ts("2024-03-11 00:00:00"); val d2 = ts("2024-03-12 00:00:00")
    assert(agg("sum") == Map(d1 -> 6.0, d2 -> 10.0))
    assert(agg("min") == Map(d1 -> 1.0, d2 -> 10.0))
    assert(agg("max") == Map(d1 -> 3.0, d2 -> 10.0))
    assert(agg("mean") == Map(d1 -> 2.0, d2 -> 10.0))
    assert(agg("median") == Map(d1 -> 2.0, d2 -> 10.0))
    // the reference's "meadian" typo (app.py:44) maps to median, not a crash
    assert(agg("meadian") == Map(d1 -> 2.0, d2 -> 10.0))
  }

  test("groupByTime preserves series columns (multi-series parallelism)") {
    val multi = Seq(("a", ts("2024-03-11 10:00:00"), 1.0),
                    ("a", ts("2024-03-11 11:00:00"), 2.0),
                    ("b", ts("2024-03-11 10:30:00"), 5.0)).toDF("sid", "ds", "y")
    val out = Aggregations.groupByTime(multi, Some("D"), "sum", Seq("sid"))
      .collect().map(r => (r.getString(0), r.getDouble(2))).toMap
    assert(out == Map("a" -> 3.0, "b" -> 5.0))
  }

  test("dateBounds returns min/max ds") {
    val (lo, hi) = Aggregations.dateBounds(dup)
    assert(lo == ts("2024-03-11 10:00:00") && hi == ts("2024-03-12 09:00:00"))
  }

  test("ceiling default = max(y) + 3*stddev_samp, never below max(y)") {
    val ys = Seq(1.0, 2.0, 3.0, 4.0).toDF("y")
    val got = ys.agg(Aggregations.ceilingExpr($"y", None).as("c")).as[Double].head()
    val mean = 2.5
    val sd = math.sqrt(Seq(1.0, 2.0, 3.0, 4.0).map(v => (v - mean) * (v - mean)).sum / 3)
    assert(math.abs(got - (4.0 + 3 * sd)) < 1e-12)
    // user cap below max(y) is clamped up to max(y) (app.py:358-364)
    val clamped = ys.agg(Aggregations.ceilingExpr($"y", Some(2.0)).as("c")).as[Double].head()
    assert(clamped == 4.0)
  }

  test("floor default = min(0, min(y))") {
    val pos = Seq(1.0, 5.0).toDF("y")
    assert(pos.agg(Aggregations.floorExpr($"y").as("f")).as[Double].head() == 0.0)
    val neg = Seq(-2.0, 5.0).toDF("y")
    assert(neg.agg(Aggregations.floorExpr($"y").as("f")).as[Double].head() == -2.0)
  }

  test("defaultHorizon = post-aggregation length when unset (app.py:91)") {
    val agged = Aggregations.groupByTime(dup, Some("D"), "sum")
    assert(Aggregations.defaultHorizon(agged, None) == 2L)
    assert(Aggregations.defaultHorizon(agged, Some(14)) == 14L)
  }
}
