package graft.pipeline

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** [[TableProfile.profile]] — null counting, exact distincts, and the
  * long-format stack. */
class TableProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("profile: per-column rows/nulls/distincts in long format") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("x")), (Some(1L), None),
      (Some(2L), Some("y")), (None, Some("y")))
      .toDF("a", "b")
    val got = TableProfile.profile(df, Seq("a", "b"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "a" -> ((4L, 1L, 2L)),
      "b" -> ((4L, 1L, 2L))))
  }
}
