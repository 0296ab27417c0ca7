package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Assoc.pairRules]] — hand-computable supports, confidence
  * asymmetry, lift above/below 1, and the minSupport cut. */
class AssocSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("pair rules: exact supports, confidences, lift on the e6 grid") {
    import spark.implicits._
    // 4 baskets; (a,b) together in 2; a in 3, b in 2; (a,c) once (cut)
    val m = Seq(
      (1L, "a"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c"),
      (4L, "d"))
      .toDF("g", "item")
    val rows = Assoc.pairRules(m, "g", "item", minSupport = 2L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 2L && r.getLong(3) == 3L && r.getLong(4) == 2L)
    assert(r.getLong(5) == 4L)
    assert(r.getLong(6) == 666666L) // conf(a->b) = 2e6 div 3
    assert(r.getLong(7) == 1000000L) // conf(b->a) = 2e6 div 2
    // lift = (666666 * 4) div 2 = 1333332 (> 1e6: positively associated)
    assert(r.getLong(8) == 1333332L)
  }
}
