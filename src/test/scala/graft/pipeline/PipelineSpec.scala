package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "completely different words appear in this text here")
  ).toDF("doc_id", "text")

  test("minhash+LSH finds exact and near duplicates, skips unrelated") {
    val sh = TextDedup.bigramShingles(docs, "doc_id", "text")
    val sig = TextDedup.minhashSignature(sh, 4)
    val pairs = TextDedup.candidatePairs(TextDedup.lshBands(sig, 4, 2))
    val jac = TextDedup.jaccard(sh, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((1L, 2L)) == 1.0)
    assert(jac.get((1L, 4L)).isEmpty && jac.get((2L, 4L)).isEmpty)
    // near-dup pair: 6 shared of 10 distinct bigrams = exactly 0.6
    jac.get((1L, 3L)).foreach(j => assert(j >= 0.6 && j < 1.0))
  }

  test("identical texts share simhash; different texts differ") {
    val sh = TextDedup.simhash16(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(sh(1L) != sh(4L))
    assert(sh.values.forall(v => v >= 0 && v < 65536))
  }

  test("dupClusters: min-label propagation finds components and keepers") {
    val ids = (1L to 7L).map(Tuple1(_)).toDF("doc_id")
    // components: {1,2,3} (chain 1-2, 2-3), {5,6}, singletons 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("da", "db")
    val out = TextDedup.dupClusters(ids, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (1L, 1L) && out(2L) == (1L, 0L) && out(3L) == (1L, 0L))
    assert(out(5L) == (5L, 1L) && out(6L) == (5L, 0L))
    assert(out(4L) == (4L, 1L) && out(7L) == (7L, 1L))
  }

  test("wordOccurrences counts word-boundary hits") {
    val got = docs.filter($"doc_id" === 1)
      .select(TextDedup.wordOccurrences($"text", "the").as("n"))
      .head().getDouble(0)
    assert(got == 2.0)
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (1L, Seq(1.0, 0.0, 0.0)),   // identical to 0
    (2L, Seq(0.9, 0.1, 0.0)),   // close to 0
    (3L, Seq(-1.0, 0.0, 0.0)),  // opposite
    (4L, Seq(0.0, 1.0, 0.0))    // orthogonal
  ).toDF("vec_id", "v")

  test("brute-force cosine ranks identical > close > orthogonal > opposite") {
    val out = Similarity.cosineTopK(vecs, col("vec_id") === 0, 4)
      .orderBy("rn").collect().map(_.getAs[Long]("neighbor_id"))
    assert(out.head == 1L)
    assert(out(1) == 2L)
    assert(out.last == 3L)
  }

  test("IVF cells assign by nearest centroid; search stays within cell") {
    val cents = Seq(0 -> Seq(1.0, 0.0, 0.0), 1 -> Seq(0.0, 1.0, 0.0))
    val out = Similarity.ivfTopK(vecs, cents, 3).collect()
    val cellOf = out.map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("cell")).toMap
    // 0,1,2 point along +x → cell 0; 3 (-x) and 4 (+y) prefer centroid 1
    assert(cellOf(0L) == 0L && cellOf(1L) == 0L && cellOf(2L) == 0L)
    assert(cellOf(3L) == 1L && cellOf(4L) == 1L)
    val n0 = out.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Long]("neighbor_id")).toSet
    assert(n0 == Set(1L, 2L)) // only same-cell vectors are candidates
    val n4 = out.filter(_.getAs[Long]("query_id") == 4L).map(_.getAs[Long]("neighbor_id")).toSet
    assert(n4 == Set(3L))
  }

  test("k-means-trained IVF centroids separate the two natural clusters") {
    // two tight clusters around +x and +y
    val data = (0 until 20).map { i =>
      val base = if (i % 2 == 0) Seq(1.0, 0.0, 0.0) else Seq(0.0, 1.0, 0.0)
      (i.toLong, base.map(_ + (i % 5) * 0.01))
    }.toDF("vec_id", "v")
    val cents = Similarity.trainCentroids(data, k = 2)
    assert(cents.size == 2)
    val out = Similarity.ivfTopK(data, cents, 3).collect()
    // neighbors returned from WITHIN the query's cluster only: parity of
    // ids encodes the cluster, so neighbor parity must match query parity
    assert(out.nonEmpty)
    assert(out.forall(r =>
      r.getAs[Long]("query_id") % 2 == r.getAs[Long]("neighbor_id") % 2))
  }

  test("LSH buckets separate opposite-sign vectors, keep identical together") {
    // second plane normal to z so no test vector lies ON a hyperplane
    val planes = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0))
    val out = Similarity.lshBucketTopK(vecs, planes, 3).collect()
    val n0 = out.filter(_.getAs[Long]("query_id") == 0L).map(_.getAs[Long]("neighbor_id"))
    assert(n0.contains(1L) && n0.contains(2L)) // same hemisphere
    assert(!n0.contains(3L) && !n0.contains(4L)) // different buckets
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq((1L, "abc"), (2L, "a" * 200)).toDF("doc_id", "text")

  test("byte_sum expression: codegen sum equals manual sum") {
    GraftSumCheck.check(spark)
  }

  test("media table carries byte-accurate metadata") {
    val m = Multimodal.mediaTable(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getStruct(2)).toMap
    assert(m(1L).getAs[Long]("n_bytes") == 3L)
    assert(m(1L).getAs[Long]("n_frames") == 1L)
    assert(m(2L).getAs[Long]("n_bytes") == 200L)
    assert(m(2L).getAs[Long]("n_frames") == 4L) // ceil(200/64)
  }

  test("FrameLimitRule pushes frame_idx bounds into the sequence generator") {
    graft.plans.GraftFunctions.register(spark)
    val media = Multimodal.mediaTable(docs, "doc_id", "text") // doc 2 has 4 frames
    val limited = Multimodal.frameSample(media).filter(col("frame_idx") < 2)
    // the optimized plan must bound the sequence itself, not just filter
    val optimized = limited.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least("), s"sequence bound not pushed:\n$optimized")
    // and results are identical to the unrewritten semantics
    val got = limited.select("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (2L, 0L), (2L, 1L)))
  }

  test("empty payload emits zero frames (no descending sequence)") {
    val empty = Seq((9L, "")).toDF("doc_id", "text")
    val frames = Multimodal.frameSample(Multimodal.mediaTable(empty, "doc_id", "text"))
    assert(frames.count() == 0L)
  }

  test("frame sampling covers every byte exactly once") {
    val frames = Multimodal.frameFeatures(
      Multimodal.frameSample(Multimodal.mediaTable(docs, "doc_id", "text")))
    val agg = frames.groupBy("doc_id")
      .agg(sum("frame_bytes").as("total"), sum("frame_sum").as("bytesum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(agg(1L)._1 == 3L && agg(1L)._2 == 'a'.toLong + 'b' + 'c')
    assert(agg(2L)._1 == 200L && agg(2L)._2 == 200L * 'a'.toLong)
  }

  test("decode stub is deterministic with fixed schema") {
    val a = Multimodal.decodeStub(Multimodal.mediaTable(docs, "doc_id", "text"))
      .collect().map(_.toString).sorted
    val b = Multimodal.decodeStub(Multimodal.mediaTable(docs, "doc_id", "text"))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.nonEmpty)
  }
}

object GraftSumCheck {
  def check(spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val got = Seq("hello", "", "\u0000\u00ff").toDF("s")
      .select(call_function("byte_sum", encode(col("s"), "UTF-8")).as("bs"))
      .as[Long].collect()
    val expect = Seq("hello", "", "\u0000\u00ff").map(
      _.getBytes("UTF-8").map(b => (b & 0xff).toLong).sum)
    assert(got.toSeq == expect)
  }
}
