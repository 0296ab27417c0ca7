package graft.streaming

import graft.SparkTestSession
import graft.ts.Aggregations
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Batch/stream parity: the streaming windowed aggregation must produce
  * exactly the batch groupByTime result on the same data. */
class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sourceData = {
    val base = java.sql.Timestamp.valueOf("2024-03-04 00:00:00").getTime // Monday
    val rnd = new scala.util.Random(5)
    (0 until 500).map { i =>
      ("s" + (i % 3), new java.sql.Timestamp(base + rnd.nextInt(14 * 86400) * 1000L),
       rnd.nextInt(100).toDouble)
    }
  }

  private def runParity(grain: String): Unit = {
    val data = sourceData
    val batch = data.toDF("series", "ds", "y")
    val expected = Aggregations.groupByTime(batch, Some(grain), "sum", Seq("series"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet

    val dir = Files.createTempDirectory(s"graft-stream-$grain").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val agg = StreamOps.streamingGroupByTime(stream, grain, "sum", Seq("series"))
    val qname = s"parity_$grain"
    val q = agg.writeStream.outputMode("complete").format("memory").queryName(qname).start()
    try {
      q.processAllAvailable()
      val got = spark.table(qname).collect()
        .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2))).toSet
      assert(got == expected, s"grain $grain: stream != batch")
    } finally q.stop()
  }

  test("hourly windows match batch bucketing") { runParity("H") }
  test("daily windows match batch bucketing") { runParity("D") }
  test("weekly windows are Monday-aligned like date_trunc") { runParity("W") }

  test("month grain is rejected in streaming mode (calendar-width)") {
    intercept[IllegalArgumentException] { StreamOps.windowDuration("M") }
  }

  test("stateful running bounds track batch count/sum/min/max per series") {
    val data = sourceData
    val batch = data.toDF("series", "ds", "y")
    val expected = batch.groupBy("series")
      .agg(count("*").as("n"), sum("y").as("s"), min("ds"), max("ds"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
             r.getTimestamp(3).getTime / 1000, r.getTimestamp(4).getTime / 1000)).toMap

    val dir = Files.createTempDirectory("graft-stream-state").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = StreamOps.runningBounds(stream)
      .writeStream.outputMode("update").format("memory").queryName("bounds").start()
    try {
      q.processAllAvailable()
      // last update per series carries the full-state aggregate
      val got = spark.table("bounds").orderBy(col("n").desc)
        .collect().groupBy(_.getString(0)).map { case (k, rows) =>
          val r = rows.maxBy(_.getLong(1))
          k -> (r.getLong(1), r.getDouble(2),
                r.getTimestamp(3).getTime / 1000, r.getTimestamp(4).getTime / 1000)
        }
      assert(got == expected)
    } finally q.stop()
  }
}
