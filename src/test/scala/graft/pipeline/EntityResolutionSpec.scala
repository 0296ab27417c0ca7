package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("typo pair sharing a token is found with exact distance") {
    val df = Seq(
      "acme widgets", "acme widgets", "acme wigdets", // typo in the noun
      "globex gears", "initech gears").toDF("nm")
    val got = EntityResolution.fuzzyNamePairs(df, "nm", maxLev = 4)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_a"),
                 r.getAs[Long]("n_b"), r.getAs[Long]("lev"))).toSet
    // blocked via 'acme' (df=2) even though the typo is in the rarer
    // token; levenshtein(widgets, wigdets) = 2
    assert(got.contains(("acme widgets", "acme wigdets", 2L, 1L, 2L)))
    // globex/initech gears pair via 'gears' but lev > 4 -> confirmed out
    assert(!got.exists(p => p._1.contains("gears") && p._2.contains("gears")))
  }

  test("pairs beyond maxLev are filtered") {
    val df = Seq("red widget", "red gadget", "red encyclopedia").toDF("nm")
    val got = EntityResolution.fuzzyNamePairs(df, "nm", maxLev = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("red gadget", "red widget")))
  }

  test("counts ride the distinct-name grid") {
    val df = (Seq.fill(5)("blue bolt") ++ Seq.fill(3)("blue boat"))
      .toDF("nm")
    val r = EntityResolution.fuzzyNamePairs(df, "nm", maxLev = 2)
      .collect().head
    assert((r.getAs[Long]("n_a"), r.getAs[Long]("n_b")) == ((3L, 5L)))
    assert(r.getAs[Long]("lev") == 1L)
  }
}
