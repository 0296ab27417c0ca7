package graft.scale

import graft.SparkTestSession
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[GridPrefix.prefixSums]] — the two-level distributed prefix must
  * equal the single-window reference on every grid shape, and its
  * plan must contain NO unpartitioned window. */
class GridPrefixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def reference(vals: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    var acc = 0L
    vals.sortBy(_._1).map { case (v, c) =>
      val before = acc; acc += c; v -> ((before + c, before))
    }.toMap
  }

  private def check(vals: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val got = GridPrefix.prefixSums(vals.toDF("v", "c"), "v", "c")
      .select("v", "cum", "cum_before").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == reference(vals))
  }

  test("matches the single-window reference on a small grid") {
    check(Seq((5L, 2L), (1L, 3L), (9L, 1L), (3L, 4L)))
  }

  test("grid wider than the shuffle-partition count (multi-bucket)") {
    // 4096 distinct values over 32 shuffle partitions: every bucket
    // holds >1 value and >1 bucket is non-empty, so both levels of
    // the decomposition (in-bucket window + cross-bucket offsets)
    // are exercised
    val vals = (1L to 4096L).map(v => (v * 7 % 4099, v % 5 + 1))
    check(vals)
  }

  test("single-row and single-bucket grids") {
    check(Seq((42L, 7L)))
    check(Seq((1L, 1L), (2L, 1L)))
  }

  test("plan contains no unpartitioned WindowExec") {
    import spark.implicits._
    val grid = (1L to 1000L).map(v => (v, 1L)).toDF("v", "c")
    val out = GridPrefix.prefixSums(grid, "v", "c")
    out.collect()
    val plan = out.queryExecution.executedPlan
    val inner = plan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val bad = inner.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned window in:\n$inner")
  }
}
