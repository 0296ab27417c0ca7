package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class RankCorrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("spearman: perfect monotone = 1, perfect inverse = -1") {
    val up = (1 to 20).map(i => ("g", i.toLong, (i * i).toLong))
    val dn = (1 to 20).map(i => ("h", i.toLong, (100 - i).toLong))
    val got = RankCorr.spearman((up ++ dn).toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rho")).toMap
    assert(math.abs(got("g") - 1.0) < 1e-9)
    assert(math.abs(got("h") + 1.0) < 1e-9)
  }

  test("spearman with ties matches scipy's midrank value on a hand case") {
    // x = [1,2,2,3], y = [10,20,20,40]: midranks
    // rx = [1, 2.5, 2.5, 4], ry = [1, 2.5, 2.5, 4] -> rho = 1
    val a = Seq(("a", 1L, 10L), ("a", 2L, 20L), ("a", 2L, 20L), ("a", 3L, 40L))
    val rho1 = RankCorr.spearman(a.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(math.abs(rho1 - 1.0) < 1e-9)
    // x = [1,2,2,3], y = [40,20,20,10]: rho = -1 with same tie pattern
    val b = Seq(("a", 1L, 40L), ("a", 2L, 20L), ("a", 2L, 20L), ("a", 3L, 10L))
    val rho2 = RankCorr.spearman(b.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(math.abs(rho2 + 1.0) < 1e-9)
    // mixed: x=[1,2,3,4], y=[1,3,2,4] -> d=[0,1,-1,0], rho = 1-6*2/60 = 0.8
    val c = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 2L), ("a", 4L, 4L))
    val rho3 = RankCorr.spearman(c.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head.getAs[Double]("rho")
    assert(math.abs(rho3 - 0.8) < 1e-9)
  }

  test("kendall tau-b: hand case with ties on both axes") {
    // x = [1,1,2,2], y = [1,2,1,2]:
    // pairs across x-values: (1,1)x(2,1): ya=1,yb=1 tie; (1,1)x(2,2) conc;
    // (1,2)x(2,1) disc; (1,2)x(2,2) tie -> nc=1, nd=1 -> tau_b = 0
    val d = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("a", 2L, 1L), ("a", 2L, 2L))
    val r = RankCorr.kendallTauB(d.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(r.getAs[Long]("nc") == 1L && r.getAs[Long]("nd") == 1L)
    assert(math.abs(r.getAs[Double]("tau_b")) < 1e-9)
    // perfectly concordant grid: x=y over 1..4
    val e = (1 to 4).map(i => ("a", i.toLong, i.toLong))
    val r2 = RankCorr.kendallTauB(e.toDF("g", "x", "y"), "g", "x", "y")
      .collect().head
    assert(r2.getAs[Long]("nc") == 6L && r2.getAs[Long]("nd") == 0L)
    assert(math.abs(r2.getAs[Double]("tau_b") - 1.0) < 1e-9)
  }
}
