package graft.stats

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(vals: Seq[Long], g: String = "a") =
    vals.zipWithIndex.map { case (v, i) => (g, v, i.toLong) }
      .toDF("g", "x", "id")

  test("CI brackets the sample mean and is ordered") {
    val data = df((1 to 500).map(i => 100L + (i % 21)))
    val r = Bootstrap.bootstrapMeanCi(data, "g", "x", "id")
      .collect().head
    val (lo, mean, hi) = (r.getAs[Long]("lo_c"),
      r.getAs[Long]("mean_c"), r.getAs[Long]("hi_c"))
    assert(lo <= mean && mean <= hi, s"$lo $mean $hi")
    assert(r.getAs[Long]("b_reps") == 40L)
    // spread of a 21-wide uniform at n=500: CI halfwidth well under 2
    assert(hi - lo <= 4L, s"width ${hi - lo}")
  }

  test("deterministic: identical runs give identical intervals") {
    val data = df((1 to 200).map(i => (i * 7 % 100).toLong))
    def run() = Bootstrap.bootstrapMeanCi(data, "g", "x", "id")
      .collect().head.toSeq
    assert(run() == run())
  }

  test("constant data: degenerate interval at the constant") {
    val r = Bootstrap.bootstrapMeanCi(df(Seq.fill(50)(42L)),
      "g", "x", "id").collect().head
    assert(r.getAs[Long]("lo_c") == 42L)
    assert(r.getAs[Long]("hi_c") == 42L)
    assert(r.getAs[Long]("mean_c") == 42L)
  }

  test("wider dispersion widens the interval") {
    val tight = df((1 to 300).map(i => 1000L + (i % 3)))
    val wide = df((1 to 300).map(i => 1000L + (i % 3) * 300), g = "b")
      .withColumnRenamed("b", "g")
    def width(d: org.apache.spark.sql.DataFrame) = {
      val r = Bootstrap.bootstrapMeanCi(d, "g", "x", "id").collect().head
      r.getAs[Long]("hi_c") - r.getAs[Long]("lo_c")
    }
    assert(width(wide) > width(tight))
  }
}
