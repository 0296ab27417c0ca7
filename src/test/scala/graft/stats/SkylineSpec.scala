package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Skyline]] — dominance semantics on hand-checkable point sets:
  * strictness, equal-point twins, per-group independence, and
  * equivalence to the brute-force O(n²) definition on a random set. */
class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def frontier(rows: Seq[(String, Long, Long, Long)]): Set[Long] = {
    import spark.implicits._
    Skyline.skyline2d(rows.toDF("grp", "id", "x", "y"), "grp", "id", "x", "y")
      .collect().map(_.getLong(1)).toSet
  }

  test("textbook frontier: dominated interior points drop") {
    // minimize x, maximize y. (1,10) and (5,20) on frontier;
    // (3,9) dominated by (1,10); (6,20) dominated by (5,20)
    val got = frontier(Seq(("g", 1L, 1L, 10L), ("g", 2L, 3L, 9L),
      ("g", 3L, 5L, 20L), ("g", 4L, 6L, 20L)))
    assert(got == Set(1L, 3L))
  }

  test("equal (x, y) twins are all kept — dominance is strict") {
    val got = frontier(Seq(("g", 1L, 2L, 5L), ("g", 2L, 2L, 5L),
      ("g", 3L, 4L, 4L)))
    assert(got == Set(1L, 2L))
  }

  test("same x, different y: only the max-y row survives that column") {
    val got = frontier(Seq(("g", 1L, 2L, 5L), ("g", 2L, 2L, 7L)))
    assert(got == Set(2L))
  }

  test("groups are independent frontiers") {
    val got = frontier(Seq(("g1", 1L, 1L, 1L), ("g2", 2L, 9L, 1L)))
    assert(got == Set(1L, 2L))
  }

  test("matches the brute-force dominance definition on a random set") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 300L).map(i =>
      ("g", i, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val brute = pts.filterNot { case (_, _, x, y) =>
      pts.exists { case (_, _, xa, ya) =>
        xa <= x && ya >= y && (xa < x || ya > y) }
    }.map(_._2).toSet
    assert(frontier(pts) == brute)
  }
}
