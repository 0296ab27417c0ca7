package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // plain-scala replay of the micro-grid GD contract
  private def sig(mE6: Long): Double = 1.0 / (1.0 + math.exp(-(mE6 / 1e6)))
  private def resid(mE6: Long, y: Long): Long = math.round((sig(mE6) - y) * 1e6)

  test("GD replay: weights after 2 iterations match the by-hand micro-grid math") {
    // two single-token docs in distinct buckets: tf feature = 1e6 each,
    // length feature f = round(1e6/256) = 3906 shared by both.
    val docs = Seq((1L, "alpha", 1L), (2L, "beta", 0L)).toDF("doc_id", "text", "y")
    val m = Classifier.trainHashedLogistic(docs, "doc_id", "text", col("y"),
                                           dim = 16, iters = 2)
    val n = 2L
    val fTok = 1000000L
    val fLen = math.round(1.0 * 1e6 / 256)
    def updW(w: Long, g: Long): Long = w - math.round(4.0 * g / (n * 1e6))
    def updB(b: Long, g: Long): Long = b - math.round(4.0 * g / n)
    // iteration 1: margins 0, residuals ±1/2
    val (r1a, r1b) = (resid(0, 1), resid(0, 0))
    var (wa, wb, wl) = (updW(0, r1a * fTok), updW(0, r1b * fTok),
                        updW(0, r1a * fLen + r1b * fLen))
    var b = updB(0, r1a + r1b)
    // iteration 2
    def marg(wTok: Long): Long =
      math.round((wTok * fTok + wl * fLen) / 1e6) + b
    val (r2a, r2b) = (resid(marg(wa), 1), resid(marg(wb), 0))
    val (wa2, wb2) = (updW(wa, r2a * fTok), updW(wb, r2b * fTok))
    val wl2 = updW(wl, r2a * fLen + r2b * fLen)
    val b2 = updB(b, r2a + r2b)
    val nonZero = m.weightsE6.zipWithIndex.filter(_._1 != 0L).map(_.swap).toMap
    assert(nonZero.getOrElse(16, 0L) == wl2, s"length-slot weight: $nonZero")
    assert((nonZero - 16).values.toSet == Set(wa2, wb2),
           s"want {$wa2, $wb2}, got ${(nonZero - 16).values.toSet}")
    assert(m.biasE6 == b2)
  }

  test("separable vocabularies: the distilled model predicts every label") {
    val pos = (1 to 20).map(i => (i.toLong, "good clean prose text here", 1L))
    val neg = (1 to 20).map(i => (100L + i, "spam junk noise garbage words", 0L))
    val docs = (pos ++ neg).toDF("doc_id", "text", "y")
    val out = Classifier.distillClassifier(docs, "doc_id", "text", col("y"),
                                           dim = 64, iters = 8)
      .select(col("label"), col("pred")).collect()
    assert(out.length == 40)
    assert(out.forall(r => r.getLong(0) == r.getLong(1)),
           "8 GD steps must separate disjoint vocabularies")
  }

  test("the length gate is learnable: long-vs-short separates via the length slot") {
    // same vocabulary everywhere — only document LENGTH differs, the
    // signal the tf buckets are blind to and the length slot carries.
    val short = (1 to 15).map(i => (i.toLong, "alpha beta gamma delta", 0L))
    val long = (1 to 15).map(i =>
      (100L + i, Seq.fill(30)("alpha beta gamma delta").mkString(" "), 1L))
    val docs = (short ++ long).toDF("doc_id", "text", "y")
    val out = Classifier.distillClassifier(docs, "doc_id", "text", col("y"),
                                           dim = 16, iters = 16)
      .select(col("label"), col("pred")).collect()
    assert(out.forall(r => r.getLong(0) == r.getLong(1)),
           "length-only separation must be learnable")
  }

  test("training is deterministic: two runs produce identical models") {
    val docs = Seq(
      (1L, "a b c d", 1L), (2L, "c d e f", 0L), (3L, "a a b f", 1L),
      (4L, "e e f a", 0L), (5L, "b c a d", 1L)
    ).toDF("doc_id", "text", "y")
    val m1 = Classifier.trainHashedLogistic(docs, "doc_id", "text", col("y"), 32, 3)
    val m2 = Classifier.trainHashedLogistic(docs, "doc_id", "text", col("y"), 32, 3)
    assert(m1.weightsE6.toSeq == m2.weightsE6.toSeq && m1.biasE6 == m2.biasE6)
  }

  test("inline serving-path scoring is row-for-row identical to the batch ledger") {
    val docs = Seq(
      (1L, "a b c d e f g", 1L),
      (2L, "a a a a b", 0L),                  // repeated tokens: tf rounding
      (3L, "", 1L),                           // feature-less: bare bias
      (4L, "solo", 0L),                       // single token: tf = 1e6
      (5L, Seq.fill(300)("w").mkString(" "), 1L) // past the length cap
    ).toDF("doc_id", "text", "y")
    val model = Classifier.trainHashedLogistic(docs, "doc_id", "text", col("y"),
                                               dim = 16, iters = 3)
    val batch = Classifier.scoreHashedLogistic(docs, "doc_id", "text", col("y"), model)
      .collect().map(_.toString).toSet
    val inline = Classifier.scoreHashedLogisticInline(docs, "doc_id", "text", col("y"), model)
      .collect().map(_.toString).toSet
    assert(inline == batch, "inline margins must equal the join-path margins")
  }

  test("feature-less documents score at the bare bias and still emit a row") {
    val docs = Seq((1L, "word word word", 1L), (2L, "", 0L)).toDF("doc_id", "text", "y")
    val model = Classifier.trainHashedLogistic(docs, "doc_id", "text", col("y"),
                                               dim = 16, iters = 1)
    val out = Classifier.scoreHashedLogistic(docs, "doc_id", "text", col("y"), model)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(2L) == model.biasE6, "empty doc's margin is exactly the bias")
  }

  test("weight updates round half away from zero like both SQL engines") {
    // Scala math.round(-2.5) = -2, but round(-2.5) = -3 in Spark SQL
    // and DuckDB; the GD update must use the SQL convention or a
    // negative-gradient tie diverges from the q124 oracle replay
    assert(Classifier.roundHalfAway(2.5) == 3L)
    assert(Classifier.roundHalfAway(-2.5) == -3L)
    assert(Classifier.roundHalfAway(-2.4) == -2L)
    assert(Classifier.roundHalfAway(2.4) == 2L)
    assert(Classifier.roundHalfAway(0.0) == 0L)
    assert(Classifier.roundHalfAway(-0.5) == -1L)
  }
}
