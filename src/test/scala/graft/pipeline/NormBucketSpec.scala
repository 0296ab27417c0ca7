package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextDedup.normalizedExactDedup]] (CCNet dedup-key fold) and
  * [[TextAnalysis.perplexityBuckets]] (CCNet head/middle/tail split). */
class NormBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("normalized dedup fuses case/accent/digit variants raw dedup misses") {
    val docs = Seq(
      (1L, "the cafe opened in 1987 near the river"),
      // accent + case + digit variant of doc 1: raw md5 differs
      (2L, "The CAFÉ opened in 2024 near the river"),
      (3L, "a completely different document"),
      (4L, "a completely different document"), // raw exact dup of 3
      (5L, "unique text with no twin")).toDF("doc_id", "text")
    val got = TextDedup.normalizedExactDedup(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("canonical_id"), r.getAs[Long]("n_variants"),
          r.getAs[Long]("is_keeper"), r.getAs[Long]("raw_dup")))).toMap
    // 1 and 2 fuse under the fold, invisible to raw dedup
    assert(got(1L) == ((1L, 2L, 1L, 0L)))
    assert(got(2L) == ((1L, 2L, 0L, 0L)))
    // 3 and 4 are raw dups — normalized dedup still sees them
    assert(got(3L) == ((3L, 2L, 1L, 1L)))
    assert(got(4L) == ((3L, 2L, 0L, 1L)))
    assert(got(5L) == ((5L, 1L, 1L, 0L)))
  }

  test("dedupKeyNorm: fold is idempotent and whitespace-insensitive") {
    val df = Seq((1L, "  Héllo   Wörld 42  "), (2L, "hello world 00"))
      .toDF("id", "t")
      .select(col("id"), TextDedup.dedupKeyNorm(col("t")).as("k"))
    val ks = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ks(1L) == "hello world 00")
    assert(ks(1L) == ks(2L))
  }

  test("perplexityBuckets: grid-decomposed rank equals the single-window form") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0 until 90).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      val words = (0 to i % 11).map(j => s"w${(i + j) % 9}").mkString(" ")
      (i.toLong, lang, s"$words end token")
    }.toDF("doc_id", "lang", "text")
    val got = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("ppl_rank"), r.getAs[Long]("ppl_bucket")))).toMap
    val naive = {
      val pd = TextAnalysis.knPerplexity(docs, "doc_id", "text")
        .select(col("doc_id"), col("avg_kn_e3"))
        .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      val w = Window.partitionBy(col("lang")).orderBy(col("avg_kn_e3"), col("doc_id"))
      val n = Window.partitionBy(col("lang"))
      pd.withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n_lang", count(lit(1)).over(n))
        .withColumn("bkt", expr("((rk - 1) * 3) DIV n_lang"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("rk"), r.getAs[Long]("bkt")))).toMap
    }
    assert(got == naive)
  }

  test("perplexityBuckets: per-lang buckets are balanced within one doc") {
    val docs = (0 until 60).map { i =>
      (i.toLong, "en", (0 to 2 + i % 7).map(j => s"t${(i * 3 + j) % 13}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val sizes = TextAnalysis.perplexityBuckets(docs, "doc_id", "text", "lang")
      .groupBy("ppl_bucket").count().collect()
      .map(r => r.getAs[Long]("ppl_bucket") -> r.getAs[Long]("count")).toMap
    assert(sizes.keySet == Set(0L, 1L, 2L))
    assert(sizes.values.max - sizes.values.min <= 1)
  }
}
