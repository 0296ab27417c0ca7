package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Triangles]] — hand-countable graphs: exact triangle counts per
  * node, dominance of the degree orientation (each triangle counted
  * once), LCC grid values, and symmetrization/self-loop hygiene. */
class TrianglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def census(edges: Seq[(String, String)]): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    Triangles.nodeTriangles(edges.toDF("src", "dst"), "src", "dst")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("single triangle: every corner counts it once, LCC = 1") {
    val got = census(Seq(("a", "b"), ("b", "c"), ("c", "a")))
    assert(got == Map(
      "a" -> ((2L, 1L, 1000000L)),
      "b" -> ((2L, 1L, 1000000L)),
      "c" -> ((2L, 1L, 1000000L))))
  }

  test("K4: each node in 3 triangles, LCC = 1; direction/dup/self-loop noise ignored") {
    val nodes = Seq("a", "b", "c", "d")
    val k4 = for { x <- nodes; y <- nodes if x != y } yield (x, y)
    // add duplicates, reversed rows, and a self-loop: all must be inert
    val got = census(k4 ++ Seq(("a", "b"), ("b", "a"), ("c", "c")))
    assert(got.keySet == nodes.toSet)
    nodes.foreach { n => assert(got(n) == ((3L, 3L, 1000000L))) }
  }

  test("path graph has no triangles; degree-2 interior gets LCC 0") {
    val got = census(Seq(("a", "b"), ("b", "c"), ("c", "d")))
    // endpoints have degree 1 -> excluded; interior nodes deg 2, 0 tris
    assert(got == Map("b" -> ((2L, 0L, 0L)), "c" -> ((2L, 0L, 0L))))
  }

  test("two triangles sharing an edge: shared nodes count both") {
    // a-b-c and b-c-d: b,c in 2 triangles (deg 3), a,d in 1 (deg 2)
    val got = census(Seq(("a", "b"), ("b", "c"), ("c", "a"),
                         ("b", "d"), ("c", "d")))
    assert(got("a") == ((2L, 1L, 1000000L)))
    assert(got("d") == ((2L, 1L, 1000000L)))
    // LCC(b) = 2*2e6 div (3*2) = 666666
    assert(got("b") == ((3L, 2L, 666666L)))
    assert(got("c") == ((3L, 2L, 666666L)))
  }
}
