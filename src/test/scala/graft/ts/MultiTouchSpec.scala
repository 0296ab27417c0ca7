package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class MultiTouchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("three-touch conversion: U-shape 40/20/40, linear remainder") {
    // user 1: view@100, click@200, view@300, purchase@400
    val df = Seq(
      (1L, ts(100), 1L, "view"), (2L, ts(200), 1L, "click"),
      (3L, ts(300), 1L, "view"), (4L, ts(400), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = MultiTouch.multiTouchAttribution(df, "user_id",
      "event_type", "ts", "event_id", Seq("view", "click"), "purchase",
      windowSec = 1000L).collect()
      .map(r => r.getAs[String]("touch_type") ->
        ((r.getAs[Long]("linear_e6"), r.getAs[Long]("ushape_e6")))).toMap
    // linear: 1e6 div 3 = 333333 each, remainder 1 to rank-1 (view)
    // ushape: first view 400000, middle click 200000, last view 400000
    assert(got("view") == ((333334L + 333333L, 800000L)))
    assert(got("click") == ((333333L, 200000L)))
  }

  test("credits sum to exactly 1e6 per conversion") {
    // 7 touches -> 1e6 div 7 leaves remainder 3; U mid split 200000/5
    val touches = (1 to 7).map(i => (i.toLong, ts(i * 10L), 1L,
      if (i % 2 == 0) "click" else "view"))
    val df = (touches :+ ((99L, ts(500), 1L, "purchase")))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = MultiTouch.multiTouchAttribution(df, "user_id",
      "event_type", "ts", "event_id", Seq("view", "click"), "purchase",
      windowSec = 1000L).collect()
    assert(got.map(_.getAs[Long]("linear_e6")).sum == 1000000L)
    assert(got.map(_.getAs[Long]("ushape_e6")).sum == 1000000L)
  }

  test("touches outside the window are not credited; decay halves per halflife") {
    val df = Seq(
      (1L, ts(0), 1L, "view"),          // outside the 100s window
      (2L, ts(350), 1L, "view"),        // age 50 = one halflife
      (3L, ts(400), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = MultiTouch.multiTouchAttribution(df, "user_id",
      "event_type", "ts", "event_id", Seq("view", "click"), "purchase",
      windowSec = 100L, halfLifeSec = 50L).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_touches") == 1L)
    assert(r.getAs[Long]("linear_e6") == 1000000L)
    assert(r.getAs[Long]("decay_e6") == 500000L)
  }

  test("single-touch and two-touch U-shape edge cases") {
    val df = Seq(
      (1L, ts(10), 1L, "view"), (2L, ts(20), 1L, "purchase"),
      (3L, ts(10), 2L, "view"), (4L, ts(15), 2L, "click"),
      (5L, ts(20), 2L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val rows = MultiTouch.multiTouchAttribution(df, "user_id",
      "event_type", "ts", "event_id", Seq("view", "click"), "purchase",
      windowSec = 100L).collect()
    val byType = rows.map(r => r.getAs[String]("touch_type") ->
      r.getAs[Long]("ushape_e6")).toMap
    // user1 single view 1e6; user2 view 500000 + click 500000
    assert(byType("view") == 1500000L)
    assert(byType("click") == 500000L)
  }
}
