package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query runs and returns rows at sf0.001; value-level
  * oracle parity is checked by the driver (and tools/selfcheck.py). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("query names are unique") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("oracle keys are a subset of query keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.all) {
    test(s"${q.name} runs and returns rows") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned no rows")
    }
  }
}
