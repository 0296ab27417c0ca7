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

  test("brownForsythe: equal spreads score F = 0 whatever the means") {
    // same |v - median| profile [1,0,1] in both groups despite a
    // 10-unit mean shift the plain ANOVA would flag
    val df = Seq(("u", 1L), ("u", 2L), ("u", 3L),
                 ("w", 11L), ("w", 12L), ("w", 13L)).toDF("g", "v")
    val rows = Anova.brownForsythe(df, "g", "v").collect()
    assert(rows.forall(_.getAs[Long]("ssb") == 0L), rows.mkString(";"))
    assert(rows.forall(_.getAs[Double]("f") == 0.0), rows.mkString(";"))
  }

  test("brownForsythe: hand-computed F on unequal spreads; exact lower median") {
    // u = [1,2,3] -> med 2, z = [1,0,1]; w = [10,30,50] -> med 30,
    // z = [20,0,20]; ssb = 120+120, ssw = 1+267 -> F = 240/67
    val df = Seq(("u", 1L), ("u", 2L), ("u", 3L),
                 ("w", 10L), ("w", 30L), ("w", 50L)).toDF("g", "v")
    val rows = Anova.brownForsythe(df, "g", "v").collect()
    val f = rows.head.getAs[Double]("f")
    assert(math.abs(f - 3.58209) < 1e-5, s"f=$f")
    // even-count group: lower median (rank (n+1) div 2)
    val even = Seq(("e", 1L), ("e", 2L), ("e", 5L), ("e", 9L),
                   ("x", 0L), ("x", 0L), ("x", 1L)).toDF("g", "v")
    // e: lower median = 2 -> z = [1,0,3,7]
    val got = Anova.brownForsythe(even, "g", "v").collect()
      .find(_.getString(0) == "e").get
    assert(got.getAs[Long]("t_sum") == 11L, s"$got")
  }
}
