package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary health — the growth-and-coverage statistics
  * next to [[TextAnalysis]]'s Zipf slope: how much probability mass
  * the NEXT document will spend on never-seen tokens (Good–Turing),
  * how many types the corpus is still missing (Chao1), and how the
  * vocabulary grows as the corpus does (Heaps' law) — the numbers a
  * tokenizer-budget or dedup-health decision actually reads.
  *
  * Exactness: everything through the frequency-of-frequencies table
  * is exact counting; the two richness ratios are single truncating
  * integer divisions, and the Heaps slope is the e6-quantized
  * log-log OLS (the [[graft.ts.Hurst]] device — no float sum ever
  * crosses a shuffle).
  *
  * Scale shape: one token-grid groupBy (vocabulary-sized, the
  * [[TextAnalysis.vocabulary]] shape), then frequency-of-frequency
  * aggregates that are grid-of-grid sized; the Heaps curve rides
  * [[graft.scale.GridPrefix]] over the DOC grid — no single-task
  * sort over the corpus's documents. */
object VocabStats {

  /** Good–Turing unseen mass (n₁/N) and bias-corrected Chao1
    * richness (V + n₁(n₁−1)/(2(n₂+1))).
    * @param tokens one row per token occurrence
    * @return one row: (n_tokens, v_types, n1, n2, unseen_mass_e6,
    *         chao1_e2) */
  def vocabRichness(tokens: DataFrame, tokCol: String): DataFrame = {
    val counts = tokens.select(col(tokCol).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    counts.agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("v_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(col("n_tokens"), col("v_types"), col("n1"), col("n2"),
        expr("n1 * 1000000 div n_tokens").as("unseen_mass_e6"),
        expr("v_types * 100 + CAST(CAST(n1 AS DECIMAL(38,0)) * (n1 - 1)" +
             " * 100 div (2 * (n2 + 1)) AS BIGINT)").as("chao1_e2"))
  }

  /** Heaps' law curve: vocabulary size at `nBuckets` equal-count
    * document checkpoints (docs ordered by id — the deterministic
    * corpus order), with the log-log growth exponent fitted over the
    * checkpoints.
    * @param docTokens one row per token occurrence with its doc id
    * @return per bucket: (bucket, docs_cum, tokens_cum, types_cum,
    *         beta_e6) — beta_e6 repeated (the Heaps exponent; ~0.4-0.6
    *         for natural text), null when fewer than 2 checkpoints */
  def heapsCurve(docTokens: DataFrame, docCol: String, tokCol: String,
                 nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000, "nBuckets config-bounded")
    val base = docTokens.select(col(docCol).as("doc"), col(tokCol).as("t"))
    val perDoc = base.groupBy(col("doc")).agg(count(lit(1)).as("t_c"))
    // first-seen doc per type, then how many types first appear at
    // each doc — both vocabulary-sized aggregates
    val firstDoc = base.groupBy(col("t")).agg(min(col("doc")).as("doc"))
      .groupBy(col("doc")).agg(count(lit(1)).as("v_c"))
    val grid = perDoc.join(firstDoc, Seq("doc"), "left")
      .withColumn("v_c", coalesce(col("v_c"), lit(0L)))
      .withColumn("one", lit(1L))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
      grid.withColumn("g", lit("all")), "g", "doc",
      Seq("one", "t_c", "v_c"))
    val tot = pre.agg(max(col("cum_one")).as("n_docs"))
    val bucketed = pre.crossJoin(broadcast(tot))
      .withColumn("bucket",
        expr(s"((cum_one - 1) * $nBuckets) div n_docs + 1"))
    // checkpoint = the last doc of each bucket (max position row)
    val perB = bucketed.groupBy(col("bucket"))
      .agg(max_by(struct(col("cum_one"), col("cum_t_c"), col("cum_v_c")),
                  col("cum_one")).as("s"))
      .select(col("bucket"), col("s.cum_one").as("docs_cum"),
              col("s.cum_t_c").as("tokens_cum"),
              col("s.cum_v_c").as("types_cum"))
    // e6-quantized log-log slope (the Hurst discipline)
    val pts = perB
      .withColumn("x", round(log(col("tokens_cum").cast("double")) * 1e6)
        .cast("long"))
      .withColumn("yl", round(log(col("types_cum").cast("double")) * 1e6)
        .cast("long"))
    val d38 = "decimal(38,0)"
    val sl = pts.agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
        sum(col("yl")).as("sy"),
        sum(col("x").cast(d38) * col("x")).as("sxx"),
        sum(col("x").cast(d38) * col("yl")).as("sxy"))
      .withColumn("num", col("m").cast(d38) * col("sxy") -
        col("sx").cast(d38) * col("sy"))
      .withColumn("den", col("m").cast(d38) * col("sxx") -
        col("sx").cast(d38) * col("sx"))
      .select(when(col("m") >= 2L && col("den") =!= lit(0),
          round(col("num").cast("double") / col("den").cast("double")
            * 1e6).cast("long"))
        .otherwise(lit(null).cast("long")).as("beta_e6"))
    perB.crossJoin(broadcast(sl))
      .select(col("bucket"), col("docs_cum"), col("tokens_cum"),
              col("types_cum"), col("beta_e6"))
  }
}
