package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[Normalize.quantileNormalize]] — identity on one group, exact
  * percentile matching across groups, multiplicity carried. */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    Normalize.quantileNormalize(rows.toDF("grp", "v"), "grp", "v",
        bucketWidth = 2L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("single group: normalization is the identity") {
    val got = run(Seq(("g", 5L), ("g", 1L), ("g", 9L), ("g", 5L)))
    // r·n + n − 1 div n = r exactly, so every value maps to itself
    assert(got == Map(("g", 1L) -> ((1L, 1L)), ("g", 5L) -> ((2L, 5L)),
                      ("g", 9L) -> ((1L, 9L))))
  }

  test("two groups map onto the pooled distribution at matched quantiles") {
    // A {1,2}, B {10,20}; pooled {1,2,10,20}. A:1 → ceil(1/2·4)=2 →
    // pooled value at rank 2 = 2; A:2 → rank 4 → 20. B mirrors.
    val got = run(Seq(("A", 1L), ("A", 2L), ("B", 10L), ("B", 20L)))
    assert(got(("A", 1L)) == ((1L, 2L)))
    assert(got(("A", 2L)) == ((1L, 20L)))
    assert(got(("B", 10L)) == ((1L, 2L)))
    assert(got(("B", 20L)) == ((1L, 20L)))
  }

  test("multiplicity advances the rank and is carried in the output") {
    // A {1,1,2}: cum ranks 2,3 of n_g=3; pooled = A∪B sorted
    // {1,1,2,5,6,7}: n_tot=6. v=1: tr=(2·6+2) div 3 = 4 → pooled
    // rank 4 = 5. v=2: tr=(3·6+2) div 3 = 6 → 7.
    val got = run(Seq(("A", 1L), ("A", 1L), ("A", 2L),
                      ("B", 5L), ("B", 6L), ("B", 7L)))
    assert(got(("A", 1L)) == ((2L, 5L)))
    assert(got(("A", 2L)) == ((1L, 7L)))
  }
}
