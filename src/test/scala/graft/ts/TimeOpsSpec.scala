package graft.ts

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class TimeOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("parseTimestamp handles ISO8601 with Z (reference primary path)") {
    val out = Seq("2024-03-12T23:59:59Z", "2024-03-11T00:00:00Z").toDF("raw")
      .select(TimeOps.parseTimestamp($"raw").as("ds")).as[Timestamp].collect()
    assert(out.toSeq == Seq(ts("2024-03-12 23:59:59"), ts("2024-03-11 00:00:00")))
  }

  test("parseTimestamp falls back to dd-MM-yyyy HH:mm per-value (mixed column)") {
    // the reference falls back per-COLUMN (app.py:79-87); we parse per-value
    val out = Seq("03-01-2015 01:00", "2015-01-03T02:00:00Z", "garbage").toDF("raw")
      .select(TimeOps.parseTimestamp($"raw").as("ds")).collect().map(r => Option(r.getTimestamp(0)))
    assert(out(0).contains(ts("2015-01-03 01:00:00")))
    assert(out(1).contains(ts("2015-01-03 02:00:00")))
    assert(out(2).isEmpty)
  }

  test("parseTimestamp normalizes offset time zones to UTC") {
    val out = Seq("2024-01-01T12:00:00+02:00", "2024-01-01T12:00:00+05:00").toDF("raw")
      .select(TimeOps.parseTimestamp($"raw").as("ds")).as[Timestamp].collect()
    assert(out.toSeq == Seq(ts("2024-01-01 10:00:00"), ts("2024-01-01 07:00:00")))
  }

  test("bucket: None is identity, D/W/M/H/m truncate to period start") {
    val in = Seq(ts("2024-03-13 15:42:37")).toDF("ds") // a Wednesday
    def one(g: Option[String]) =
      in.select(TimeOps.bucket($"ds", g).as("b")).as[Timestamp].head()
    assert(one(None) == ts("2024-03-13 15:42:37"))
    assert(one(Some("D")) == ts("2024-03-13 00:00:00"))
    assert(one(Some("W")) == ts("2024-03-11 00:00:00")) // ISO week → Monday
    assert(one(Some("M")) == ts("2024-03-01 00:00:00"))
    assert(one(Some("H")) == ts("2024-03-13 15:00:00"))
    assert(one(Some("m")) == ts("2024-03-13 15:42:00"))
  }

  test("grain aliases: min/m/T all mean minute; unsupported grain raises") {
    assert(TimeOps.normalizeGrain("min") == "m")
    assert(TimeOps.normalizeGrain("T") == "m")
    assert(TimeOps.normalizeGrain("m") == "m")
    intercept[IllegalArgumentException] { TimeOps.normalizeGrain("fortnight") }
  }

  test("bucketEnd/periodEndLabel: week ends Sunday, month ends last day") {
    val in = Seq(ts("2024-03-13 15:42:37")).toDF("ds")
    def end(g: String) = in.select(TimeOps.bucketEnd($"ds", g).as("e")).as[Timestamp].head()
    def lbl(g: String) = in.select(TimeOps.periodEndLabel($"ds", g).as("e")).as[Timestamp].head()
    assert(end("W") == ts("2024-03-18 00:00:00"))
    assert(lbl("W") == ts("2024-03-17 23:59:59"))
    assert(end("M") == ts("2024-04-01 00:00:00"))
    assert(lbl("M") == ts("2024-03-31 23:59:59"))
    assert(end("D") == ts("2024-03-14 00:00:00"))
  }

  test("S5 CSV source feeds the parse/bucket path (spark.read.csv end-to-end)") {
    // the reference's CSV ingestion is Spark's built-in csv reader; what
    // needs pinning is that a header CSV with MIXED timestamp formats
    // flows through parseTimestamp → bucket unchanged (strings in, the
    // same T2 fallback chain, day buckets out)
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.csv"),
      "date,v\n2024-03-05T10:30:00Z,1.5\n2024-03-05 11:00:00,2.5\n2024/03/06 09:15:00,4.0\n")
    val raw = spark.read.option("header", "true").csv(dir)
    val got = raw
      .select(TimeOps.bucket(TimeOps.parseTimestamp($"date"), Some("D")).as("d"),
              $"v".cast("double").as("v"))
      .groupBy("d").agg(org.apache.spark.sql.functions.sum("v").as("s"))
      .collect().map(r => (r.getTimestamp(0), r.getDouble(1))).toMap
    assert(got == Map(ts("2024-03-05 00:00:00") -> 4.0, ts("2024-03-06 00:00:00") -> 4.0),
      s"csv→parse→bucket mismatch: $got")
  }

  test("bucket invariant: bucket(ds) <= ds < bucketEnd(ds)") {
    val rnd = new scala.util.Random(42)
    val stamps = Seq.fill(200)(new Timestamp(1700000000000L + rnd.nextLong() % 100000000000L))
    val df = stamps.toDF("ds")
    for (g <- Seq("D", "W", "M", "H", "m")) {
      val bad = df.filter(!(TimeOps.bucket($"ds", Some(g)) <= $"ds" &&
                            $"ds" < TimeOps.bucketEnd($"ds", g))).count()
      assert(bad == 0, s"grain $g violated bucket invariant")
    }
  }
}
