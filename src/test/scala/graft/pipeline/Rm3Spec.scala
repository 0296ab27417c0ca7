package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class Rm3Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("expansion recalls a topical doc the literal query misses") {
    // docs 1-3 match 'spark' and also say 'shuffle'; doc 4 says only
    // 'shuffle' (topical, no literal match); doc 5 is off-topic
    val df = Seq(
      (1L, "spark shuffle spark tuning"),
      (2L, "spark shuffle partitions"),
      (3L, "spark shuffle skew fix"),
      (4L, "shuffle spill shuffle memory"),
      (5L, "gardening tips for spring"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rm3TopK(df, "doc_id", "text",
      Seq("spark"), k = 5, fbDocs = 3, fbTerms = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got.contains(4L), s"expansion should recall doc 4: $got")
    assert(!got.contains(5L))
  }

  test("original-term docs still outrank expansion-only docs") {
    val df = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"), (3L, "beta gamma"),
      (4L, "delta epsilon"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.rm3TopK(df, "doc_id", "text",
      Seq("alpha"), k = 4, fbDocs = 2, fbTerms = 1)
      .orderBy("rank").collect()
    val ranked = rows.map(_.getAs[Long]("doc_id")).toSeq
    // docs 1,2 carry alpha at full weight; doc 3 only beta at 0.4
    assert(ranked.take(2).toSet == Set(1L, 2L))
    assert(ranked.contains(3L))
    assert(!ranked.contains(4L))
  }

  test("deterministic: two runs produce identical rankings") {
    val df = (1 to 50).map(i =>
      (i.toLong, s"term${i % 7} term${i % 5} term${i % 3} filler$i"))
      .toDF("doc_id", "text")
    def run() = TextAnalysis.rm3TopK(df, "doc_id", "text",
      Seq("term1", "term2"), k = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_e6"),
                 r.getAs[Long]("rank"))).toSeq
    assert(run() == run())
  }
}
