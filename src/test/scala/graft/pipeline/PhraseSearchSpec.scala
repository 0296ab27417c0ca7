package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("phraseSearch: exact adjacency incl. overlapping occurrences") {
    val df = Seq(
      (1L, "a b c a b c"), (2L, "a a a"), (3L, "c b a"))
      .toDF("doc_id", "text")
    val got = PhraseSearch.phraseSearch(df, "doc_id", "text",
      Seq("a", "b")).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_occurrences"),
        r.getAs[Long]("first_pos")))).toMap
    assert(got == Map(1L -> ((2L, 0L))))
    // overlapping: "a a a" with phrase (a, a) -> occurrences at 0 and 1
    val ov = PhraseSearch.phraseSearch(df, "doc_id", "text",
      Seq("a", "a")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_occurrences")).toMap
    assert(ov(2L) == 2L)
  }

  test("proximitySearch: any order within slop, tightest window") {
    val df = Seq(
      (1L, "scan the big fat order now"), // span(big@2,order@4,scan@0)=4
      (2L, "big x x x x x x order scan"), // span = 8 > 6 -> out
      (3L, "order big scan"))             // span = 2
      .toDF("doc_id", "text")
    val got = PhraseSearch.proximitySearch(df, "doc_id", "text",
      Seq("big", "order", "scan"), slop = 6).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_windows"),
        r.getAs[Long]("min_span"), r.getAs[Long]("first_pos")))).toMap
    assert(got == Map(1L -> ((1L, 4L, 0L)), 3L -> ((1L, 2L, 0L))))
  }

  test("proximitySearch: multiple qualifying windows counted") {
    val df = Seq((1L, "big order big order")).toDF("doc_id", "text")
    val got = PhraseSearch.proximitySearch(df, "doc_id", "text",
      Seq("big", "order"), slop = 3).collect().head
    // pairs: (0,1)s1 (0,3)s3 (2,1)s1 (2,3)s1 -> all within slop 3
    assert(got.getAs[Long]("n_windows") == 4L)
    assert(got.getAs[Long]("min_span") == 1L)
  }
}
