package graft.graphs

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class LinkPredictSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.functions._

  test("resourceAllocation: scores and adjacency exclusion by hand") {
    import spark.implicits._
    // square 1-2-3-4-1 plus chord 1-3: open pair is only (2,4),
    // common neighbors {1, 3}, deg(1) = 3, deg(3) = 3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = LinkPredict.resourceAllocation(e, "src", "dst", minCommon = 2)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("u") == 2L && r.getAs[Long]("v") == 4L)
    assert(r.getAs[Long]("cn") == 2L)
    // ra = 1e6 div 3 + 1e6 div 3 = 333333 + 333333
    assert(r.getAs[Long]("ra_e6") == 666666L)
    // deg(2) = deg(4) = 2; jaccard = 2e6 div (2 + 2 - 2) = 1000000
    assert(r.getAs[Long]("jaccard_e6") == 1000000L)
  }

  test("resourceAllocation: adjacent pairs never appear") {
    import spark.implicits._
    // triangle: every pair shares a neighbor but all are adjacent
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(LinkPredict.resourceAllocation(e, "src", "dst", 1).count() == 0)
  }

  test("degreeAssortativity: perfect positive and negative shapes") {
    import spark.implicits._
    // star = hubs-to-leaves only: assortativity is NaN-free -1 for
    // a double star (two hubs each with 2 leaves, joined)
    // simpler hand case: path of 4 nodes 1-2-3-4: degrees 1,2,2,1;
    // directed-both-ways pairs (du,dv): (1,2),(2,1),(2,2),(2,2),(2,1),(1,2)
    // m2=6 su=sv=10 suv=16 suu=svv=18 → r=(96-100)/(sqrt(108-100)^2)=-0.5
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = LinkPredict.degreeAssortativity(e, "src", "dst").collect().head
    assert(r.getAs[Long]("m2") == 6L)
    assert(math.abs(r.getAs[Double]("assortativity") - (-0.5)) < 1e-9)
  }
}
