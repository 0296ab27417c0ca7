package graft

import graft.pipeline.TextDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: stage-by-stage timing of the near-dup pipeline (the
  * bench's heaviest query) at a given scale factor. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = graft.queries.t(spark, sfDir, "documents")
    time("warmup count")(docs.count())
    val sh = TextDedup.bigramShingles(docs, "doc_id", "text")
    time("shingles")(sh.count())
    val sig = TextDedup.minhashSignature(sh, 4)
    time("signatures")(sig.count())
    val bands = TextDedup.lshBands(sig, 4, 2)
    time("bands")(bands.count())
    val pairs = TextDedup.candidatePairs(bands)
    time("candidatePairs")(pairs.count())
    val jac = TextDedup.jaccard(sh, pairs)
    time("jaccard")(jac.count())
    time("full q56 uncached")(
      TextDedup.jaccard(sh, TextDedup.candidatePairs(
        TextDedup.lshBands(TextDedup.minhashSignature(sh, 4), 4, 2)))
        .filter(col("jaccard") >= 0.5).count())
    spark.stop()
  }
}
