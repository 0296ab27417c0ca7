package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Components.connectedComponents]] — label convergence within the
  * round budget, separation of components, chain diameters. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)], rounds: Int) = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("src", "dst"), "src", "dst",
        rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components separate; min id labels each") {
    val got = run(Seq((5L, 3L), (3L, 7L), (10L, 11L)), rounds = 3)
    assert(got == Map(3L -> 3L, 5L -> 3L, 7L -> 3L, 10L -> 10L, 11L -> 10L))
  }

  test("chain: the min label travels one hop per round") {
    // 1-2-3-4-5: node 5 is 4 label-hops from 1
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val partial = run(chain, rounds = 2)
    assert(partial(5L) == 3L) // only reached 3's label so far
    val full = run(chain, rounds = 4)
    assert(full == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("cycle converges within half its length") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val got = run(cycle, rounds = 2)
    assert(got.values.toSet == Set(1L))
  }
}
