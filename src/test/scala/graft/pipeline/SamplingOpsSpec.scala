package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-12 sampling/selection family: [[TextAnalysis.sourceQuotaCap]]
  * (two-phase sharded top-q ≡ the single-window form it replaces),
  * [[TextAnalysis.dsirResample]] (Gumbel-top-k over importance weights),
  * and [[TextAnalysis.dsirScoreServe]] (the per-row serving form of
  * dsirWeights — exact parity on the training corpus). */
class SamplingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import org.apache.spark.sql.expressions.Window

  private def corpus(n: Int) = {
    import spark.implicits._
    // skewed: source s0 owns 70% of docs; quality varies by word mix
    (0 until n).map { i =>
      val src = if (i % 10 < 7) "s0" else s"s${1 + i % 3}"
      val words = Seq.fill(3 + i % 7)(Seq("the", "alpha", "of", "beta",
        "gamma", "is")(i % 6)).mkString(" ")
      (i.toLong, src, s"$words doc $i", if (i % 4 == 0) "en" else "de")
    }.toDF("doc_id", "source", "text", "lang")
  }

  test("sourceQuotaCap equals the naive single-window rank, at any salt count") {
    val df = corpus(200)
    val naive = {
      val scored = df.select(col("doc_id"), col("source"))
        .join(TextAnalysis.qualityScore(df, "doc_id", "text")
                .select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality_score").desc, col("doc_id"))
      scored.withColumn("q_rank", row_number().over(w).cast("long"))
        .filter(col("q_rank") <= 5)
        .select("doc_id", "source", "quality_score", "q_rank")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    }
    for (salts <- Seq(1, 3, 16)) {
      val got = TextAnalysis.sourceQuotaCap(df, "doc_id", "text", "source",
          maxPerGroup = 5, salts = salts)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
      assert(got == naive, s"salts=$salts diverged from the single-window form")
    }
  }

  test("sourceQuotaCap: no group exceeds the cap; small groups keep everything") {
    val df = corpus(200)
    val got = TextAnalysis.sourceQuotaCap(df, "doc_id", "text", "source", 5)
    val perGroup = got.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perGroup.values.forall(_ <= 5))
    val inSizes = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    inSizes.foreach { case (g, n) =>
      assert(perGroup(g) == math.min(n, 5L), s"group $g: ${perGroup(g)} of $n")
    }
  }

  test("dsirResample keeps exactly the k largest Gumbel keys of the weight frame") {
    val df = corpus(120)
    val got = TextAnalysis.dsirResample(df, "doc_id", "text",
        col("lang") === "en", k = 30)
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(got.length == 30)
    // recompute every doc's key from the weight frame + the same hash
    // Gumbel; the kept set must be the global top-30 with doc_id ties
    val all = {
      val w = TextAnalysis.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      val u = (expr("pmod(conv(substring(md5(concat('dsir-gum', doc_id)), 1, 8), 16, 10), 1000000)")
                 .cast("double") + lit(0.5)) / lit(1000000.0)
      w.withColumn("key_e3",
          col("logw_e3") + round(-log(-log(u)) * 1e3).cast("long"))
        .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("key_e3")))
    }
    val want = all.sortBy { case (id, k2) => (-k2, id) }.take(30)
      .map(_._1).toSet
    assert(got.map(_._1).toSet == want)
  }

  test("dsirResample with k >= corpus returns every weighted doc") {
    val df = corpus(40)
    val n = TextAnalysis.dsirWeights(df, "doc_id", "text", col("lang") === "en").count()
    val got = TextAnalysis.dsirResample(df, "doc_id", "text",
      col("lang") === "en", k = 10000)
    assert(got.count() == n)
  }

  test("dsirScoreServe reproduces dsirWeights on the training corpus") {
    val df = corpus(150)
    val batch = TextAnalysis.dsirWeights(df, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Long]("logw_e3"),
          r.getAs[Long]("dsir_selected")))).toMap
    val scores = TextAnalysis.dsirBucketScores(df, "doc_id", "text",
        col("lang") === "en")
      .collect().map(r => r.getAs[Long]("b") -> r.getAs[Long]("d_e3")).toMap
    val table = (0L until 1024L).map(b => scores(b))
    val served = TextAnalysis.dsirScoreServe(df, "doc_id", "text", table)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_feats"), r.getAs[Long]("logw_e3"),
          r.getAs[Long]("dsir_selected")))).toMap
    assert(served == batch)
  }

  test("dsirBucketScores covers the full bucket range with non-null scores") {
    val df = corpus(60)
    val rows = TextAnalysis.dsirBucketScores(df, "doc_id", "text",
      col("lang") === "en", nBuckets = 64).collect()
    assert(rows.length == 64)
    assert(rows.forall(!_.isNullAt(1)))
  }
}
