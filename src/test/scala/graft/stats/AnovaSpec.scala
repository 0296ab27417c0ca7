package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class AnovaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("anovaOneWay: textbook two-group case") {
    // g1 = [1,2,3] (mean 2), g2 = [5,6,7] (mean 6), grand mean 4
    // SSB = 3*(2-4)^2 + 3*(6-4)^2 = 24; SSW = 2 + 2 = 4
    // F = (24/1)/(4/4) = 24
    val df = (Seq(1L, 2L, 3L).map(("a", _)) ++ Seq(5L, 6L, 7L).map(("b", _)))
      .toDF("g", "v")
    val rows = Anova.anovaOneWay(df, "g", "v").collect()
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getAs[Long]("ssb") == 24L)
    assert(r.getAs[Long]("ssw") == 4L)
    assert(math.abs(r.getAs[Double]("f") - 24.0) < 1e-6)
    val byG = rows.map(x => x.getString(0) ->
      ((x.getAs[Long]("n_g"), x.getAs[Long]("t_sum"),
        x.getAs[Long]("ssb_term")))).toMap
    assert(byG("a") == ((3L, 6L, 12L)))
    assert(byG("b") == ((3L, 18L, 12L)))
  }

  test("anovaOneWay: F is null when only one group") {
    val df = Seq(("a", 1L), ("a", 2L)).toDF("g", "v")
    val r = Anova.anovaOneWay(df, "g", "v").collect().head
    assert(r.isNullAt(r.fieldIndex("f")))
  }

  test("cramersV: perfect association = 1, independence = 0") {
    // perfect: a determines b on a 2x2 with equal counts
    val perfect = (Seq.fill(10)(("x", "p")) ++ Seq.fill(10)(("y", "q")))
      .toDF("a", "b")
    val v1 = Anova.cramersV(perfect, "a", "b").collect().head
    assert(v1.getAs[Long]("r") == 2L && v1.getAs[Long]("c") == 2L)
    assert(math.abs(v1.getAs[Double]("v") - 1.0) < 1e-6)
    // independent: uniform 2x2
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("a", "b")
    val v2 = Anova.cramersV(indep, "a", "b").collect().head
    assert(math.abs(v2.getAs[Double]("v")) < 1e-6)
  }
}
