package graft.streaming

import graft.SparkTestSession
import graft.pipeline.Kmv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Batch/stream parity for the KMV sketch: after the stream drains,
  * each set's LAST emitted update must equal Kmv.estimate over the
  * full batch — and the state is ≤ k hashes per set forever. */
class StreamKmvSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming KMV final updates equal the batch estimate") {
    val rows = (0 until 3000).map(i =>
      (if (i % 2 == 0) "a" else "b", s"member_${i % 900}"))
    val batch = rows.toDF("g", "m")
    val want = Kmv.estimate(Kmv.sketch(batch, "g", "m", k = 64), k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_sketch"), r.getAs[Long]("kth_h"),
          r.getAs[Double]("est")))).toMap

    val dir = Files.createTempDirectory("graft-stream-kmv").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = StreamOps.streamingKmvDistinct(stream, "g", "m", k = 64)
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_updates").start()
    try {
      q.processAllAvailable()
      val got = spark.table("kmv_updates")
        .collect().groupBy(_.getString(0)).map { case (g, rs) =>
          // the largest sketch is the final state
          val r = rs.maxBy(_.getLong(1))
          g -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))
        }
      assert(got == want, s"got=$got want=$want")
    } finally q.stop()
  }

  test("small set: streaming estimate is the exact count") {
    val batch = (1 to 30).map(i => ("s", s"x$i")).toDF("g", "m")
    val dir = Files.createTempDirectory("graft-stream-kmv2").toString
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val q = StreamOps.streamingKmvDistinct(stream, "g", "m", k = 64)
      .writeStream.outputMode("update").format("memory")
      .queryName("kmv_small").start()
    try {
      q.processAllAvailable()
      val r = spark.table("kmv_small").orderBy(col("n_sketch").desc)
        .collect().head
      assert(r.getLong(1) == 30L)
      assert(r.getDouble(3) == 30.0)
    } finally q.stop()
  }
}
