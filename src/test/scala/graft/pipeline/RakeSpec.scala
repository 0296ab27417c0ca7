package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RakeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-traced RAKE scores on a two-phrase doc") {
    // "deep learning of deep models": stopword 'of' splits into
    // phrases [deep learning], [deep models]
    // freq: deep 2, learning 1, models 1
    // deg:  deep 2+2=4, learning 2, models 2
    // ws_e6: deep 2e6, learning 2e6, models 2e6
    // phrase scores: both 4e6; tie -> 'deep learning' first
    val df = Seq((1L, "deep learning of deep models"))
      .toDF("doc_id", "text")
    val got = Rake.rakePhrases(df, "doc_id", "text").collect()
    assert(got.length == 2)
    assert(got(0).getAs[String]("phrase") == "deep learning")
    assert(got(0).getAs[Long]("score_e6") == 4000000L)
    assert(got(1).getAs[String]("phrase") == "deep models")
    assert(got(1).getAs[Long]("score_e6") == 4000000L)
  }

  test("longer phrases outscore their solo words") {
    val df = Seq(
      (1L, "gradient descent converges and gradient descent oscillates"),
      (2L, "descent alone")).toDF("doc_id", "text")
    val got = Rake.rakePhrases(df, "doc_id", "text").collect()
      .map(r => r.getAs[String]("phrase") -> r.getAs[Long]("score_e6"))
      .toMap
    assert(got.contains("gradient descent converges") ||
           got.contains("gradient descent oscillates"))
    // multi-word phrases outrank the lone 'descent alone' words? both
    // exist; at minimum the top phrase is multi-word
    val top = Rake.rakePhrases(df, "doc_id", "text").collect().head
    assert(top.getAs[Long]("n_words") >= 2L)
  }

  test("phrases over maxPhraseLen are dropped") {
    val df = Seq((1L, "one two three four five"), (2L, "a of the"))
      .toDF("doc_id", "text")
    val got = Rake.rakePhrases(df, "doc_id", "text", maxPhraseLen = 4)
      .collect()
    assert(got.isEmpty) // the only phrase has 5 words; doc 2 all stop
  }

  test("duplicate phrases collapse with occurrence count") {
    val df = Seq((1L, "hot gear"), (2L, "hot gear"), (3L, "hot gear"))
      .toDF("doc_id", "text")
    val got = Rake.rakePhrases(df, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_occ") == 3L)
  }
}
