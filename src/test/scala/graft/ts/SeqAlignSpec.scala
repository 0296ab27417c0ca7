package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class SeqAlignSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val ref = Seq("signup", "view", "click", "purchase")

  private def align(seqs: Map[String, Seq[String]]) = {
    val rows = seqs.toSeq.flatMap { case (k, es) =>
      es.zipWithIndex.map { case (e, i) => (k, "b", e, i.toLong, i.toLong) }
    }
    SeqAlign.alignToReference(
      rows.toDF("k", "b", "et", "sec", "eid"),
      "k", "b", "et", Seq("sec", "eid"), ref)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("score")).toMap
  }

  test("perfect funnel scores 4 matches = 8") {
    assert(align(Map("u" -> ref))("u") == 8L)
  }

  test("one skipped step costs one gap: 3 matches - 1 = 5") {
    assert(align(Map("u" -> Seq("signup", "view", "purchase")))("u") == 5L)
  }

  test("one extra event costs one gap: 8 - 1 = 7") {
    assert(align(
      Map("u" -> Seq("signup", "view", "error", "click", "purchase")))("u")
      == 7L)
  }

  test("hand-traced substitution beats double gap") {
    // signup view ERROR purchase vs ref: substitute error/click (-1)
    // -> 3 matches (6) - 1 = 5, better than two gaps (6 - 2 = 4)
    assert(align(Map("u" -> Seq("signup", "view", "error", "purchase")))("u")
      == 5L)
  }

  test("empty-ish and off-path sequences score negative") {
    val s = align(Map("u" -> Seq("error", "error", "error", "error",
                                 "error", "error")))
    // 6 events vs 4 ref: best is 4 mismatches + 2 gaps = -6
    assert(s("u") == -6L)
  }
}
