package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Optimizer-shape regression tests: the physical plans the 100 TB
  * posture depends on must not silently degrade. Each assertion encodes
  * a property checked once by hand via `.explain("formatted")`
  * (ExplainAll) and pinned here:
  *   - dimension joins broadcast (no sort-merge of small sides),
  *   - scans carry pushed filters and pruned schemas,
  *   - no plan contains a cartesian product,
  *   - pair generation in dedup/ANN is a join on a key, never a cross.
  * Runs on sf0.001 — plan shape, not data volume, is under test. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString
  }

  test("TPC-H shapes broadcast their dimension sides") {
    for (q <- Seq("q14_tpch_q3_shape", "q15_tpch_q5_shape")) {
      val p = planOf(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product!\n$p")
    }
  }

  test("fact scans push filters and prune columns") {
    val p = planOf("q14_tpch_q3_shape")
    assert(p.contains("PushedFilters: ["), s"no pushed filters\n$p")
    // lineitem is ~16 columns; the query needs 4 — a full-width
    // ReadSchema would mean pruning broke
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty)
    assert(readSchemas.forall(_.split(",").length <= 8),
           s"scan reads too many columns:\n$readSchemas")
  }

  test("no registered relational query plans a cartesian product") {
    // forecast/diagnostic queries exit to flatMapGroups (no join risk);
    // check every oracle-backed query — these are pure relational plans
    for (q <- SparkEntry.all if q.oracle.isDefined) {
      val p = planOf(q.name)
      assert(!p.contains("CartesianProduct"),
             s"${q.name} plans a cartesian product")
    }
  }

  test("as-of join is one partitioned sort, not a range join explosion") {
    val p = planOf("q22_asof_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
           s"as-of degenerated to a product join:\n$p")
    assert(p.contains("Window"), s"expected running-last window\n$p")
  }

  test("LSH near-dup pair generation joins on the band key") {
    val p = planOf("q56_lsh_near_dup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
           s"pair generation must be a keyed join:\n$p")
  }
}
