package graft.streaming

import graft.SparkTestSession
import graft.forecast.AnalyzeSlice
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Batch/stream parity for the composed §3.1 analyze slice: after
  * any stream prefix, every emitted target-day row equals the batch
  * [[AnalyzeSlice.analyzeSlice]] row — day agg, covariate
  * splice (observed overrides h-step prediction), alignment, and the
  * target forecast state all in ONE streaming job. The still-open
  * max UNION day per series is the only difference. */
class StreamAnalyzeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime

  private def ev(series: String, day: Int, i: Int, v: Long) =
    (series, new java.sql.Timestamp(base + day * 86400000L + i * 1000L), v)

  /** Batch reference: day-bucketed sums for both inputs →
    * analyzeSlice, dropping each series' max (still-open) UNION day. */
  private def wantRows(tgt: Seq[(String, java.sql.Timestamp, Long)],
                       cov: Seq[(String, java.sql.Timestamp, Long)]) = {
    def daily(rows: Seq[(String, java.sql.Timestamp, Long)]) =
      rows.toDF("series", "ts", "v")
        .groupBy(col("series"), to_date(date_trunc("day", col("ts"))).as("d"))
        .agg(sum(col("v")).as("y"))
    val td = daily(tgt); val cd = daily(cov)
    val sliced = AnalyzeSlice.analyzeSlice(td, cd, "series", "d", "y", "y",
      m = 3)
    val lastDay = td.select(col("series"), col("d"))
      .union(cd.select(col("series"), col("d")))
      .groupBy(col("series")).agg(max(col("d")).as("mx"))
    sliced.join(lastDay, Seq("series")).filter(col("d") < col("mx"))
      .collect().map { r =>
        (r.getString(0), r.getDate(1).toString, r.getLong(2),
         Option(r.get(3)).map(_.asInstanceOf[Long]),
         Option(r.get(4)).map(_.asInstanceOf[Long]),
         Option(r.get(5)).map(_.asInstanceOf[Long]),
         r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
      }.toSet
  }

  private def gotRows(table: String) =
    spark.table(table).collect().map { r =>
      (r.getString(0), new java.sql.Date(r.getLong(1) * 1000L).toString,
       r.getLong(2),
       Option(r.get(3)).map(_.asInstanceOf[Long]),
       Option(r.get(4)).map(_.asInstanceOf[Long]),
       Option(r.get(5)).map(_.asInstanceOf[Long]),
       r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
    }.toSet

  // target: 10 days with period-3 rhythm + drift; covariate: sparse
  // (skips days 2, 5, 6 — exercising the h-step prediction walk) and
  // starts AFTER the target (day 1 — exercising the null-pred phase)
  private def tgtRows(s: String, off: Long) =
    for (d <- 0 until 10; i <- 1 to 3)
      yield ev(s, d, i, off + d * 10L + (d % 3) * 7L + i)
  private def covRows(s: String, off: Long) =
    for (d <- Seq(1, 3, 4, 7, 8, 9); i <- 1 to 2)
      yield ev(s, d, i + 10, off + d * 5L + (d % 2) * 3L + i)

  private def startJob(tDir: String, cDir: String, name: String) = {
    val schema = spark.read.parquet(tDir).schema
    val ts = spark.readStream.schema(schema).parquet(tDir)
    val cs = spark.readStream.schema(schema).parquet(cDir)
    StreamAnalyze.streamingAnalyze(ts, cs, "series", "ts", "v", m = 3)
      .writeStream.outputMode("update").format("memory")
      .queryName(name).start()
  }

  test("single-batch stream equals the batch analyze slice on all closed days") {
    val tgt = tgtRows("a", 0L) ++ tgtRows("b", 100L)
    val cov = covRows("a", 0L) ++ covRows("b", 50L)
    val tDir = Files.createTempDirectory("graft-az-t").toString
    val cDir = Files.createTempDirectory("graft-az-c").toString
    tgt.toDF("series", "ts", "v").write.mode("overwrite").parquet(tDir)
    cov.toDF("series", "ts", "v").write.mode("overwrite").parquet(cDir)
    val q = startJob(tDir, cDir, "az1")
    try {
      q.processAllAvailable()
      val want = wantRows(tgt, cov)
      assert(want.nonEmpty && want.exists(_._4.isEmpty), "fixture sanity")
      assert(gotRows("az1") == want)
    } finally q.stop()
  }

  test("multi-batch prefixes keep parity; late events for closed days are final") {
    // appends are DAY-ORDERED across the two sources (all of day d
    // written before any of day d+1): the union day-close device
    // requires the streams to advance in day alignment — if one
    // source races a day ahead, the other's same-day rows are late
    // by contract. Day-ordered writes make every micro-batch split
    // the engine picks a valid prefix.
    val tDir = Files.createTempDirectory("graft-az-t2").toString
    val cDir = Files.createTempDirectory("graft-az-c2").toString
    val allT = tgtRows("a", 0L)
    val allC = covRows("a", 0L)
    def dayOf(r: (String, java.sql.Timestamp, Long)): Int =
      ((r._2.getTime - base) / 86400000L).toInt
    val t1 = allT.filter(dayOf(_) <= 4)
    val c1 = allC.filter(dayOf(_) <= 3)
    t1.toDF("series", "ts", "v").write.mode("append").parquet(tDir)
    c1.toDF("series", "ts", "v").write.mode("append").parquet(cDir)
    val q = startJob(tDir, cDir, "az2")
    try {
      q.processAllAvailable()
      assert(gotRows("az2") == wantRows(t1, c1))
      def append(dir: String, rows: Seq[(String, java.sql.Timestamp, Long)]) =
        if (rows.nonEmpty)
          rows.toDF("series", "ts", "v").write.mode("append").parquet(dir)
      for (d <- 4 to 9) {
        append(cDir, allC.filter(dayOf(_) == d))
        append(tDir, allT.filter(r => dayOf(r) == d && dayOf(r) > 4))
        if (d == 6) {
          // intermediate aligned prefix keeps parity
          q.processAllAvailable()
          assert(gotRows("az2") ==
            wantRows(allT.filter(dayOf(_) <= 6), allC.filter(dayOf(_) <= 6)))
        }
      }
      // a LATE event for closed day 0 must be ignored — closed days
      // are final
      append(tDir, Seq(ev("a", 0, 9, 99999L)))
      q.processAllAvailable()
      assert(gotRows("az2") == wantRows(allT, allC))
    } finally q.stop()
  }
}
