package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class CohortLtvSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(user: Long, day: String, typ: String, value: Double) =
    (user, java.sql.Timestamp.valueOf(s"$day 10:00:00"), typ, value)

  test("hand-traced two-week cohort: retention and cumulative LTV") {
    // cohort of 2 users first active Mon 2024-01-01 week;
    // week 0: u1 buys 10.00, u2 active no buy
    // week 1: only u1 active, buys 5.00
    val df = Seq(
      ev(1L, "2024-01-01", "purchase", 10.0),
      ev(2L, "2024-01-02", "view", 0.0),
      ev(1L, "2024-01-08", "purchase", 5.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.cohortLtv(df, "user_id", "ts",
      "event_type", "value", "purchase")
      .orderBy("offset_weeks").collect()
    assert(got.length == 2)
    val w0 = got(0); val w1 = got(1)
    assert(w0.getAs[Long]("n0") == 2L)
    assert(w0.getAs[Long]("n_active") == 2L)
    assert(w0.getAs[Long]("retention_e6") == 1000000L)
    assert(w0.getAs[Long]("rev_c") == 1000L)
    assert(w0.getAs[Long]("cum_ltv_c") == 500L) // 1000 div 2
    assert(w1.getAs[Long]("n_active") == 1L)
    assert(w1.getAs[Long]("retention_e6") == 500000L)
    assert(w1.getAs[Long]("rev_c") == 500L)
    assert(w1.getAs[Long]("cum_ltv_c") == 750L) // 1500 div 2
  }

  test("active week with no purchases keeps a zero-revenue row") {
    val df = Seq(
      ev(1L, "2024-01-01", "view", 0.0),
      ev(1L, "2024-01-08", "view", 0.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.cohortLtv(df, "user_id", "ts",
      "event_type", "value", "purchase")
      .orderBy("offset_weeks").collect()
    assert(got.length == 2)
    assert(got.forall(_.getAs[Long]("rev_c") == 0L))
    assert(got.forall(_.getAs[Long]("cum_ltv_c") == 0L))
  }

  test("separate cohorts accumulate independently") {
    val df = Seq(
      ev(1L, "2024-01-01", "purchase", 2.0),
      ev(2L, "2024-01-08", "purchase", 4.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = EventAnalytics.cohortLtv(df, "user_id", "ts",
      "event_type", "value", "purchase").collect()
    assert(got.length == 2)
    assert(got.forall(_.getAs[Long]("offset_weeks") == 0L))
    assert(got.map(_.getAs[Long]("cum_ltv_c")).toSet == Set(200L, 400L))
  }
}
