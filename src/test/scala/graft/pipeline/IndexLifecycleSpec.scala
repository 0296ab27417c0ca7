package graft.pipeline

import graft.SparkTestSession
import graft.queries.{cachedIndexCount, releaseIndexes}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-index cache lifecycle: the LSH/IVF/shingle index frames that
  * `cacheOnce` materializes live until session end by design (reuse
  * across queries over the SAME corpus), so a long-lived service cycling
  * many DISTINCT corpora accumulates one CacheManager entry per corpus
  * forever unless it retires them. `graft.queries.releaseIndexes(corpus)`
  * is that path: it evicts by plan containment — the caller passes the
  * corpus frame it built indexes over, and every registered frame whose
  * plan derives from it is unpersisted — so no handle to the derived
  * index frames (which `ivfTopK`/`lshBucketTopK` never return) is
  * needed. Mirrors `AnalyzeResult.close()` for the request-scoped side
  * (CacheLifecycleSpec). */
class IndexLifecycleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Distinct deterministic corpus per seed → distinct canonicalized
    * plans → distinct index cache entries, the corpus-cycling shape. */
  private def corpus(seed: Int): DataFrame = {
    import spark.implicits._
    (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(8)(j => ((i * 31 + j * 17 + seed * 101) % 19 - 9.0) / 3.0))
    }.toDF("vec_id", "v")
  }

  private def firstVecs(e: DataFrame, n: Int): Seq[Seq[Double]] =
    e.filter(col("vec_id") < n).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq

  test("N distinct-corpus index builds leave zero live entries after releaseIndexes") {
    val base = cachedIndexCount
    (1 to 3).foreach { seed =>
      val e = corpus(seed)
      val planes = firstVecs(e, 3)
      val cents = firstVecs(e, 4).zipWithIndex.map { case (v, i) => i -> v }
      // one LSH-bucket index + one IVF cell index per corpus
      assert(Similarity.lshBucketTopK(e, planes, 2).count() > 0)
      assert(Similarity.ivfTopK(e, cents, 2, nprobe = 1).count() > 0)
      assert(cachedIndexCount >= base + 2, "index builds should register cache entries")
      val released = releaseIndexes(e)
      assert(released >= 2, s"both of this corpus's indexes should release, got $released")
      assert(cachedIndexCount == base,
        "a released corpus must leave no live index entries behind")
    }
  }

  test("releaseIndexes is keyed: corpus A's release leaves corpus B's index live") {
    val base = cachedIndexCount
    val a = corpus(11)
    val b = corpus(12)
    assert(Similarity.lshBucketTopK(a, firstVecs(a, 3), 2).count() > 0)
    assert(Similarity.lshBucketTopK(b, firstVecs(b, 3), 2).count() > 0)
    assert(cachedIndexCount == base + 2)
    assert(releaseIndexes(a) == 1)
    assert(cachedIndexCount == base + 1, "corpus B's index must survive A's release")
    assert(releaseIndexes(b) == 1)
    assert(cachedIndexCount == base)
  }

  test("re-querying a released corpus rebuilds (and re-registers) its index") {
    val e = corpus(21)
    val planes = firstVecs(e, 3)
    val r1 = Similarity.lshBucketTopK(e, planes, 2).count()
    assert(releaseIndexes(e) == 1)
    // correctness is unaffected by eviction; the index is simply rebuilt
    assert(Similarity.lshBucketTopK(e, planes, 2).count() == r1)
    assert(releaseIndexes(e) == 1)
  }
}
