package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Modularity.modularityByCommunity]] against hand-computed Q. */
class ModularitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(String, String)], comm: Seq[(String, String)]) = {
    import spark.implicits._
    Modularity.modularityByCommunity(
        edges.toDF("src", "dst"), "src", "dst",
        comm.toDF("node", "c"), "node", "c")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
  }

  test("two triangles + bridge: Q = 2·(3/7 − 1/4), split evenly") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"),
                    ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d"))
    val comm = Seq("a" -> "X", "b" -> "X", "c" -> "X",
                   "d" -> "Y", "e" -> "Y", "f" -> "Y")
    val got = run(edges, comm)
    // m = 7; per community: e_c = 3, d_c = 7,
    // q_num = 4·7·3 − 49 = 35, q_e6 = round(1e6·35/196)
    assert(got("X") == ((3L, 7L, 3L, 35L, 178571L)))
    assert(got("Y") == ((3L, 7L, 3L, 35L, 178571L)))
  }

  test("community with zero internal edges keeps e_c = 0 (left join)") {
    // star: center x (comm HUB), leaves p,q,r (comm LEAF) — all 3
    // edges cross communities. m = 3; d_HUB = 3, d_LEAF = 3.
    // q_num = 0 − 9 = −9 for both; Q = 2·(−9)/36 = −0.5.
    val edges = Seq(("x", "p"), ("x", "q"), ("x", "r"))
    val comm = Seq("x" -> "HUB", "p" -> "LEAF", "q" -> "LEAF", "r" -> "LEAF")
    val got = run(edges, comm)
    assert(got("HUB") == ((1L, 3L, 0L, -9L, -250000L)))
    assert(got("LEAF") == ((3L, 3L, 0L, -9L, -250000L)))
  }

  test("everything in one community: Q = 0 exactly") {
    val edges = Seq(("a", "b"), ("b", "c"))
    val got = run(edges, Seq("a" -> "Z", "b" -> "Z", "c" -> "Z"))
    // e = m = 2, d = 4: q_num = 4·2·2 − 16 = 0
    assert(got("Z") == ((3L, 4L, 2L, 0L, 0L)))
  }
}
