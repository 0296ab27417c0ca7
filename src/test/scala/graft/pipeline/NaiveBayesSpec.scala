package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NaiveBayesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("separable vocabularies classify perfectly") {
    // label A docs say apple/banana, label B docs say xylophone/zebra
    val train = Seq(
      (0L, "apple banana apple", "A"), (2L, "banana apple", "A"),
      (4L, "xylophone zebra", "B"), (6L, "zebra zebra xylophone", "B"))
    val test = Seq(
      (1L, "apple apple", "A"), (3L, "banana", "A"),
      (5L, "zebra xylophone zebra", "B"))
    val df = (train ++ test).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classify(df, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Long]("correct") == 1L))
  }

  test("unseen tokens fall back to the label default, not a crash") {
    val df = Seq(
      (0L, "foo foo", "A"), (2L, "bar", "B"),
      (1L, "quux never seen", "A")).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classify(df, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).collect()
    assert(got.length == 1)
    // all-unseen evidence: decided by prior + per-label default
    assert(Set("A", "B").contains(got.head.getAs[String]("pred_label")))
  }

  test("tie on score breaks toward the ascending label") {
    // symmetric training: identical token mass per label; test doc
    // with one token seen equally by both labels -> exact tie
    val df = Seq(
      (0L, "same", "A"), (2L, "same", "B"),
      (1L, "same", "A")).toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classify(df, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).collect()
    assert(got.head.getAs[String]("pred_label") == "A")
  }

  test("hand-checked scores: priors + smoothed likelihoods") {
    // train: A = "x x", B = "y"; vocab {x, y} v=2
    // A: tot=2, P(x|A)=(2+1)/(2+2)=0.75, P(y|A)=1/4
    // B: tot=1, P(x|B)=1/3, P(y|B)=(1+1)/(1+2)=2/3
    // priors: ln(1/2) each
    // test "x": score_A = ln(.5)+ln(.75), score_B = ln(.5)+ln(1/3)
    val df = Seq(
      (0L, "x x", "A"), (2L, "y", "B"), (1L, "x", "A"))
      .toDF("doc_id", "text", "lang")
    val got = NaiveBayes.classify(df, "doc_id", "text", "lang",
      col("doc_id") % 2 === 0).collect().head
    assert(got.getAs[String]("pred_label") == "A")
    val expected = math.round(math.log(0.5) * 1e6) +
      math.round(math.log(3.0 / 4.0) * 1e6)
    assert(got.getAs[Long]("best_e6") == expected)
  }
}
