package graft.ts

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class GrowthLedgerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = java.sql.Date.valueOf(s)

  test("momYoy: calendar joins, exact micro shares, honest nulls") {
    val df = Seq(
      ("A", d("2023-01-15"), 100L), ("A", d("2023-02-10"), 150L),
      ("A", d("2024-02-20"), 300L)) // no 2024-01: MoM null there
      .toDF("k", "dt", "v")
    val got = GrowthLedger.momYoy(df, "k", "dt", "v")
      .collect().map(r => r.getDate(1).toString ->
        ((r.getAs[Long]("rev_c"),
          Option(r.getAs[Any]("mom_e6")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("yoy_e6")).map(_.asInstanceOf[Long])))).toMap
    assert(got("2023-01-01") == ((100L, None, None)))
    assert(got("2023-02-01") == ((150L, Some(500000L), None)))
    // 2024-02 vs 2024-01 missing -> MoM null; YoY vs 2023-02: +100%
    assert(got("2024-02-01") == ((300L, None, Some(1000000L))))
  }

  test("momYoy: zero base month yields null, negative base uses abs") {
    val df = Seq(("A", d("2024-01-05"), 0L), ("A", d("2024-02-05"), 50L),
                 ("B", d("2024-01-05"), -100L), ("B", d("2024-02-05"), -50L))
      .toDF("k", "dt", "v")
    val got = GrowthLedger.momYoy(df, "k", "dt", "v")
      .collect().map(r => (r.getString(0), r.getDate(1).toString) ->
        Option(r.getAs[Any]("mom_e6")).map(_.asInstanceOf[Long])).toMap
    assert(got(("A", "2024-02-01")).isEmpty)
    // B: (-50 - -100)*1e6 div 100 = +500000
    assert(got(("B", "2024-02-01")) == Some(500000L))
  }

  test("newVsReturning: first month is new, later months returning") {
    val df = Seq(
      (1L, d("2024-01-10"), 100L), (1L, d("2024-02-10"), 60L),
      (2L, d("2024-02-05"), 40L))
      .toDF("c", "dt", "v")
    val got = GrowthLedger.newVsReturning(df, "c", "dt", "v")
      .collect().map(r => r.getDate(0).toString ->
        ((r.getAs[Long]("new_rev_c"), r.getAs[Long]("ret_rev_c"),
          r.getAs[Long]("new_custs"), r.getAs[Long]("ret_custs"),
          r.getAs[Long]("new_share_e6")))).toMap
    assert(got("2024-01-01") == ((100L, 0L, 1L, 0L, 1000000L)))
    // Feb: cust 2 new (40), cust 1 returning (60): share 400000
    assert(got("2024-02-01") == ((40L, 60L, 1L, 1L, 400000L)))
  }
}
