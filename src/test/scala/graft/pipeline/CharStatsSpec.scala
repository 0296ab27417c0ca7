package graft.pipeline

import graft.SparkTestSession
import graft.plans.CharStats
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Character-distribution stats: the native expression against a
  * brute-force reference, edge shapes, and the DataFrame wrapper. */
class CharStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(s: String): (Long, Long, Long) = {
    val cps = s.codePoints().toArray
    val n = cps.length.toLong
    val counts = cps.groupBy(identity).view.mapValues(_.length.toLong)
    val e = counts.values.map(c =>
      math.floor((c.toDouble / n) * math.log(n.toDouble / c) * 1e6 + 0.5).toLong).sum
    (n, counts.size.toLong, if (n == 0) 0L else e)
  }

  private def native(s: String): (Long, Long, Long) = {
    val r = CharStats.compute(UTF8String.fromString(s))
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("native expression equals brute-force reference") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 100) {
      val n = rnd.nextInt(80)
      val s = (1 to n).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
      if (n > 0) assert(native(s) == brute(s), s"s=$s")
    }
  }

  test("edges: empty, single char, uniform, astral code points") {
    assert(native("") == (0L, 0L, 0L))
    assert(native("aaaa") == (4L, 1L, 0L)) // zero entropy
    // uniform over 4 chars: entropy = ln 4 on the PER-TERM micro grid
    // (4 · round(¼·ln4·1e6), a few micros off round(ln4·1e6) by design)
    val (_, _, e) = native("abcd")
    assert(e == 4L * math.round(0.25 * math.log(4.0) * 1e6))
    // astral chars count as single code points
    val (n, d, _) = native("😀😀a") // 😀😀a
    assert(n == 3L && d == 2L)
  }

  test("charStats frame: columns, ratio bounds, zero-shuffle plan") {
    val df = Seq((1L, "abab"), (2L, "aaaa"), (3L, "abcdefgh"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charStats(df, "doc_id", "text")
    val rows = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(2L)._3 == 0L && rows(2L)._4 == 0.0)
    // ratio = 1 for a perfectly uniform alphabet (up to micro rounding)
    assert(math.abs(rows(1L)._4 - 1.0) < 1e-3)
    assert(math.abs(rows(3L)._4 - 1.0) < 1e-3)
    assert(rows.values.forall { case (_, _, _, r) => r >= 0.0 && r <= 1.0 })
    // pure projection: no exchange in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
