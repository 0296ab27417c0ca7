package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[VocabStats.vocabRichness]] / [[VocabStats.heapsCurve]] —
  * hand-countable corpora. */
class VocabStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("vocabRichness: hand-counted frequency-of-frequencies") {
    // tokens: a a a b b c d -> N=7 V=4 n1=2 (c,d) n2=1 (b)
    // unseen = 2e6 div 7 = 285714; chao1_e2 = 400 + 2*1*100 div 4 = 450
    val toks = Seq("a", "a", "a", "b", "b", "c", "d")
      .map(Tuple1(_)).toDF("tok")
    val r = VocabStats.vocabRichness(toks, "tok").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5)) ==
      ((7L, 4L, 2L, 1L, 285714L, 450L)), s"$r")
  }

  test("vocabRichness: all-singleton corpus maximizes unseen mass") {
    val toks = Seq("w1", "w2", "w3", "w4").map(Tuple1(_)).toDF("tok")
    val r = VocabStats.vocabRichness(toks, "tok").collect().head
    // n1 = N -> unseen = 1e6; n2 = 0 -> bias-corrected chao1 =
    // 400 + 4*3*100 div 2 = 1000
    assert(r.getLong(4) == 1000000L && r.getLong(5) == 1000L, s"$r")
  }

  test("heapsCurve: saturated vocabulary flattens (beta near 0), fresh grows") {
    // saturated: every doc repeats the same 3 tokens
    val sat = (1L to 40L).flatMap(d =>
      Seq("x", "y", "z").map(t => (d, t))).toDF("doc_id", "tok")
    val satRows = VocabStats.heapsCurve(sat, "doc_id", "tok", 4)
      .collect().sortBy(_.getLong(0))
    assert(satRows.forall(_.getLong(3) == 3L))
    assert(math.abs(satRows.head.getLong(4)) < 50000L,
           s"${satRows.head}")
    // fresh: every doc brings 3 new tokens -> V grows linearly with
    // tokens (beta ~= 1)
    val fresh = (1L to 40L).flatMap(d =>
      Seq(s"t${d}_1", s"t${d}_2", s"t${d}_3").map(t => (d, t)))
      .toDF("doc_id", "tok")
    val freshRows = VocabStats.heapsCurve(fresh, "doc_id", "tok", 4)
      .collect().sortBy(_.getLong(0))
    val beta = freshRows.head.getLong(4)
    assert(math.abs(beta - 1000000L) < 10000L, s"beta=$beta")
    // checkpoints are cumulative and equal-count
    assert(freshRows.map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L, 40L))
    assert(freshRows.map(_.getLong(3)).toSeq == Seq(30L, 60L, 90L, 120L))
  }
}
