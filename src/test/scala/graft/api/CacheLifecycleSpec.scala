package graft.api

import graft.SparkTestSession
import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Request-scoped cache lifecycle: a long-lived session serving many
  * DISTINCT analyze() requests must not accumulate CacheManager entries
  * — each call caches per-request histories/splice frames whose
  * canonicalized plans differ per input, so without an explicit release
  * path the cache grows unboundedly. `AnalyzeResult.close()` is that
  * path; `getPersistentRDDs` is the public probe (cached frames register
  * their column-buffer RDDs there once materialized, unpersist removes
  * them). */
class CacheLifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs(seed: Int) = {
    import spark.implicits._
    val df = (1 to 30).map { d =>
      (f"2024-03-$d%02dT00:00:00Z", 100.0 + seed * 7 + d * (2.0 + seed))
    }.toDF("date", "v")
    Map("m" -> df)
  }

  private val spec = CorrelationSpec(
    id = "c1", fromData = "m", fromIndex = "v", toData = "m", toIndex = "v",
    grain = Some("D"), unitsToForecast = Some(4))

  test("analyze() caches are released by close(); no growth across distinct requests") {
    // settle: other suites share the session; measure our own delta only
    val baseline = spark.sparkContext.getPersistentRDDs.size
    (1 to 3).foreach { seed =>
      val result = AnalyzePipeline.analyze(docs(seed), Seq(spec))
      // materialize everything a caller would consume
      assert(result.targetForecasts.count() > 0)
      assert(result.diagnostics.count() > 0)
      assert(result.cachedFrames.nonEmpty)
      // materialized caches are live now (registered persistent RDDs)
      assert(result.cachedFrames.forall(_.storageLevel != StorageLevel.NONE))
      result.close()
      assert(result.cachedFrames.forall(_.storageLevel == StorageLevel.NONE))
    }
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline,
      "analyze() leaked persistent RDDs across closed requests")
  }

  test("analyzeSingle() caches are released by close()") {
    val result = AnalyzePipeline.analyzeSingle(docs(9), Seq(spec))
    assert(result.targetForecasts.count() > 0)
    result.close()
    assert(result.cachedFrames.forall(_.storageLevel == StorageLevel.NONE))
  }
}
