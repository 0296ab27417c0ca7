package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RateSpikeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ev(day: Int, n: Int, typ: String = "err") =
    (1 to n).map(i => (typ,
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d 0${i % 9}:00:00")))

  test("flat baseline then a spike: exact z and the flag") {
    // 9 days at 9/day, day 10 at 36: mu = 9, z = 27/3 = 9 -> spike
    val rows = (1 to 9).flatMap(d => ev(d, 9)) ++ ev(10, 36)
    val got = RateSpike.rateSpikes(rows.toDF("event_type", "ts"),
      "event_type", "ts").orderBy("d").collect()
    val last = got.last
    assert(last.getAs[Long]("x") == 36L)
    assert(last.getAs[Long]("base_sum") == 81L)
    assert(last.getAs[Long]("base_n") == 9L)
    assert(last.getAs[Long]("z_e6") == 9000000L)
    assert(last.getAs[Long]("is_spike") == 1L)
    // steady days are not spikes; day 1 has no baseline -> null z
    assert(got.head.isNullAt(got.head.fieldIndex("z_e6")))
    assert(got.init.forall(_.getAs[Long]("is_spike") == 0L))
  }

  test("baseline window is trailing and capped at 28 observations") {
    // 40 days at 1/day then a day at 10: base_n must be 28, not 40
    val rows = (1 to 40).flatMap(d =>
      ev((d - 1) % 28 + 1, 1).map { case (t, _) =>
        (t, new java.sql.Timestamp(
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
            + (d - 1) * 86400000L)) }) ++
      Seq.fill(10)(("err", new java.sql.Timestamp(
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
          + 40L * 86400000L)))
    val got = RateSpike.rateSpikes(rows.toDF("event_type", "ts"),
      "event_type", "ts").orderBy("d").collect().last
    assert(got.getAs[Long]("base_n") == 28L)
    assert(got.getAs[Long]("x") == 10L)
    assert(got.getAs[Long]("is_spike") == 1L) // z = 9/1 = 9
  }

  test("series are independent") {
    val rows = ev(1, 5, "a") ++ ev(2, 5, "a") ++ ev(2, 50, "b")
    val got = RateSpike.rateSpikes(rows.toDF("event_type", "ts"),
      "event_type", "ts").collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        r.getAs[Long]("is_spike")).toMap
    assert(got(("a", "2024-01-02")) == 0L)
    // b's single day has no baseline -> not a spike (null z)
    assert(got(("b", "2024-01-02")) == 0L)
  }
}
