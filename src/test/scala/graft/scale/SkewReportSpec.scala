package graft.scale

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[SkewReport.keySkew]] — hand-computed Gini from the grouped
  * rank-sum form, uniform and maximally-skewed edges. */
class SkewReportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("known distribution: counts [4,1,1] -> gini 1/3, top share 4/6") {
    import spark.implicits._
    val df = (Seq.fill(4)("a") ++ Seq("b", "c")).map(Tuple1(_)).toDF("k")
    val r = SkewReport.keySkew(df, Seq("k")).collect().head
    assert(r.getString(0) == "k")
    assert(r.getLong(1) == 6L && r.getLong(2) == 3L && r.getLong(3) == 4L)
    assert(r.getLong(4) == 666666L)
    assert(r.getLong(5) == 333333L) // round(1e6/3)
  }

  test("uniform keys -> gini 0; single key -> gini 0, share 1e6") {
    import spark.implicits._
    val uniform = (1 to 300).map(i => s"k${i % 10}").map(Tuple1(_)).toDF("k")
    val u = SkewReport.keySkew(uniform, Seq("k")).collect().head
    assert(u.getLong(5) == 0L, s"uniform gini ${u.getLong(5)}")
    val one = Seq.fill(50)(Tuple1("only")).toDF("k")
    val o = SkewReport.keySkew(one, Seq("k")).collect().head
    assert(o.getLong(2) == 1L && o.getLong(4) == 1000000L && o.getLong(5) == 0L)
  }
}
