package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[EventAnalytics.funnel]] and [[EventAnalytics.cohortRetention]] on
  * hand-computable fixtures. */
class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("funnel: ordering and window constraints decide each user's depth") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes all three in order within the window
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // u2: click BEFORE the first view — not a qualifying stage 2
      (2L, "click", 50L), (2L, "view", 100L),
      // u3: purchase before click — depth stops at 2
      (3L, "view", 100L), (3L, "purchase", 150L), (3L, "click", 200L),
      // u4: click outside the window from first touch
      (4L, "view", 100L), (4L, "click", 100L + 700L),
      // u5: no view at all — absent from the ledger
      (5L, "click", 10L), (5L, "purchase", 20L),
      // u6: equal timestamps qualify (>= is inclusive)
      (6L, "view", 100L), (6L, "click", 100L), (6L, "purchase", 100L))
      .toDF("user_id", "event_type", "sec")
    val got = EventAnalytics.funnel(ev, "user_id", "event_type", "sec",
        Seq("view", "click", "purchase"), windowSec = 500L)
      .collect().map { r =>
        r.getAs[Long]("user_id") ->
          ((r.getAs[Long]("depth"),
            if (r.isNullAt(r.fieldIndex("t2_sec"))) -1L else r.getAs[Long]("t2_sec"),
            if (r.isNullAt(r.fieldIndex("t3_sec"))) -1L else r.getAs[Long]("t3_sec")))
      }.toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 6L))
    assert(got(1L) == ((3L, 200L, 300L)))
    assert(got(2L) == ((1L, -1L, -1L)))
    assert(got(3L) == ((2L, 200L, -1L)))
    assert(got(4L) == ((1L, -1L, -1L)))
    assert(got(6L) == ((3L, 100L, 100L)))
  }

  test("attribution: latest qualifying touch wins; window and ties are exact") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val ev = Seq(
      // u1: view then click then purchase -> click attributed
      (1L, "view", ts(100), 10L), (1L, "click", ts(200), 11L),
      (1L, "purchase", ts(300), 12L),
      // u2: touch at the SAME second as the purchase qualifies (ties inclusive)
      (2L, "view", ts(300), 20L), (2L, "purchase", ts(300), 21L),
      // u3: touch outside the 7-day window -> null trio
      (3L, "view", ts(100), 30L), (3L, "purchase", ts(100 + 604801), 31L),
      // u4: no touches at all -> null trio
      (4L, "purchase", ts(500), 40L),
      // u5: two same-second touches -> max event_id (the click) wins
      (5L, "view", ts(100), 50L), (5L, "click", ts(100), 51L),
      (5L, "purchase", ts(400), 52L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.lastTouchAttribution(ev, "user_id", "event_type",
        "ts", "event_id", Seq("view", "click"), "purchase", 604800L)
      .collect()
      .map(r => r.getLong(0) -> ((
        if (r.isNullAt(3)) "-" else r.getString(3),
        if (r.isNullAt(4)) -1L else r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5))))
      .toMap
    assert(got(1L) == (("click", 200L, 100L)))
    assert(got(2L) == (("view", 300L, 0L)))
    assert(got(3L) == (("-", -1L, -1L)))
    assert(got(4L) == (("-", -1L, -1L)))
    assert(got(5L) == (("click", 100L, 300L)))
  }

  test("cohort retention: offsets count from each user's first active week") {
    import spark.implicits._
    def ts(day: String) = java.sql.Timestamp.valueOf(s"$day 12:00:00")
    val ev = Seq(
      // u1 active in weeks of Mon 2024-01-01 and Mon 2024-01-15 (offset 2)
      (1L, ts("2024-01-02")), (1L, ts("2024-01-16")),
      // u2 active only in week of 2024-01-08
      (2L, ts("2024-01-08")),
      // u3 active in consecutive weeks of 2024-01-01 and 2024-01-08
      (3L, ts("2024-01-03")), (3L, ts("2024-01-10")), (3L, ts("2024-01-11")))
      .toDF("user_id", "ts")
    val got = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getAs[java.sql.Date]("cohort_wk").toString,
                           r.getAs[Long]("offset_weeks")) ->
                          r.getAs[Long]("n_users")).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> 2L, // u1 + u3 in their cohort week
      ("2024-01-01", 1L) -> 1L, // u3 the next week
      ("2024-01-01", 2L) -> 1L, // u1 two weeks later
      ("2024-01-08", 0L) -> 1L)) // u2
  }

  test("transition matrix: per-user ordered steps, probabilities sum to 1") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val ev = Seq(
      // u1: a -> b -> a -> c ; u2: b -> b (same second, ordered by id)
      (1L, "a", ts("2024-01-01"), 1L), (1L, "b", ts("2024-01-02"), 2L),
      (1L, "a", ts("2024-01-03"), 3L), (1L, "c", ts("2024-01-04"), 4L),
      (2L, "b", ts("2024-01-01"), 5L), (2L, "b", ts("2024-01-01"), 6L),
      // u3: single event -> contributes no step
      (3L, "a", ts("2024-01-01"), 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "event_type",
                                              "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
                          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(
      ("a", "b") -> (1L, 2L, 0.5), ("a", "c") -> (1L, 2L, 0.5),
      ("b", "a") -> (1L, 2L, 0.5), ("b", "b") -> (1L, 2L, 0.5)))
    // per-from probabilities sum to 1
    got.keys.map(_._1).toSeq.distinct.foreach { f =>
      val s = got.collect { case ((`f`, _), (_, _, p)) => p }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"from=$f sum=$s")
    }
  }

  test("rfm: exact quintiles match SQL ntile, composite segment composes") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val ev = (1 to 300).map { i =>
      val u = 1L + rnd.nextInt(37)
      (u, java.sql.Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(28)}%02d " +
         f"${rnd.nextInt(24)}%02d:00:00"), rnd.nextInt(500) / 10.0)
    }.toDF("user_id", "ts", "value")
    val got = EventAnalytics.rfmSegments(ev, "user_id", "ts", "value")
    val rows = got.collect()
    // definitional check: each score equals the naive single-window
    // even-spread rule ((rank0·5) div total + 1) — the q174 convention
    def bucketOf(c: String) =
      (((row_number().over(Window.orderBy(col(c), col("user_id"))) - 1) * 5)
        .cast("long") / lit(rows.length)).cast("long") + 1
    val expect = got.select(col("user_id"), col("recency_days"), col("freq"),
        col("mon_c"))
      .withColumn("r", (lit(6) - bucketOf("recency_days")).cast("long"))
      .withColumn("f", bucketOf("freq").cast("long"))
      .withColumn("m", bucketOf("mon_c").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    rows.foreach { r =>
      val u = r.getLong(0)
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) == expect(u), s"user $u")
      assert(r.getLong(7) == r.getLong(4) * 100 + r.getLong(5) * 10 + r.getLong(6))
    }
    // scores span the full 1..5 range on 37 users
    assert(rows.map(_.getLong(5)).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("decayed trending: fresh beats stale at equal volume; weights exact") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      // "fresh": 2 events at the reference instant; "stale": 2 events 7d old
      ("fresh", ts("2024-01-08 00:00:00")), ("fresh", ts("2024-01-08 00:00:00")),
      ("stale", ts("2024-01-01 00:00:00")), ("stale", ts("2024-01-01 00:00:00")))
      .toDF("event_type", "ts")
    val got = EventAnalytics.decayedTrending(ev, "event_type", "ts", 7.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("fresh") == (2L, 2000000L, 1L)) // weight 1.0 each
    assert(got("stale") == (2L, 1000000L, 2L)) // one half-life -> 0.5 each
  }
}
