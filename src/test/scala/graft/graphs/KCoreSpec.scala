package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[KCore.kCore]] — hand-computable peel on a graph with a clique
  * core, a pendant chain, and a cascading deletion. */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(String, String)], k: Int, peels: Int) = {
    import spark.implicits._
    KCore.kCore(edges.toDF("src", "dst"), "src", "dst", k, peels)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("K4 clique survives 3-core; pendant chain peels in cascading rounds") {
    // K4 on a,b,c,d (all degree 3) + chain d-e-f: f deg 1 (round 1),
    // e drops to deg 1 after f leaves... e deg 2 < 3 already round 1;
    // d has deg 4 round 1, deg 3 after e leaves -> stays.
    val k4 = for {
      x <- Seq("a", "b", "c", "d"); y <- Seq("a", "b", "c", "d") if x < y
    } yield (x, y)
    val got = run(k4 ++ Seq(("d", "e"), ("e", "f")), k = 3, peels = 3)
    assert(got("f") == ((1L, 1L, 0L)))
    assert(got("e") == ((1L, 2L, 0L)))
    // survivors: exactly the clique, each at final degree 3
    Seq("a", "b", "c", "d").foreach { n =>
      assert(got(n) == ((4L, 3L, 1L)), s"node $n")
    }
  }

  test("cascade: a path peels one node per round at k=2") {
    // path a-b-c-d-e: endpoints (deg 1) drop round 1, then the new
    // endpoints each round; at peels=2 node c still looks safe.
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val got = run(path, k = 2, peels = 2)
    assert(got("a")._1 == 1L && got("e")._1 == 1L)
    assert(got("b") == ((2L, 1L, 0L)) && got("d") == ((2L, 1L, 0L)))
    // c survives the 2-round budget, but its END-STATE degree
    // (recomputed after round 2's deletions) is 0 < k — the
    // caller-visible signal that peels=2 undershot convergence
    assert(got("c") == ((3L, 0L, 1L)))
    // one more round finishes the cascade: c drops at degree 0
    val full = run(path, k = 2, peels = 3)
    assert(full("c") == ((3L, 0L, 0L)))
  }

  test("isolated-by-peeling node exits at degree 0, never lost") {
    // triangle a-b-c plus x connected only to y: x,y drop round 1 at
    // deg 1; triangle survives k=2.
    val got = run(Seq(("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")),
                  k = 2, peels = 2)
    assert(got("x")._1 == 1L && got("y")._1 == 1L)
    assert(Seq("a", "b", "c").forall(n => got(n) == ((3L, 2L, 1L))))
  }
}
