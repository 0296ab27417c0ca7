package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier evaluation — the diagnostics a score-based curation
  * gate ([[graft.pipeline.Classifier]], quality scores, any ranking
  * signal) is judged by before its threshold ships: exact AUC (the
  * probability a random positive outscores a random negative, ties
  * at half credit) and the decile lift table (how concentrated the
  * positives are in the top score bands — the "do we only need to
  * human-review the top 10%" readout).
  *
  * Exactness: AUC is the Mann–Whitney identity on DOUBLED midranks
  * (2·midrank is always an integer — the [[Hypothesis.mannWhitneyU]]
  * device), so numerator and denominator are exact integers and the
  * one division truncates on the e6 grid. Lift-table buckets use the
  * exact equal-count rule ((rank0·n) div total, ties by id — the
  * RFM/exactNtile device); rates and lifts are integer-div micros.
  *
  * Scale shape: both ride [[graft.scale.GridPrefix]] — AUC over the
  * score-VALUE grid, the lift table over the (score, id) struct grid
  * — so neither sorts globally in one task, however many rows share
  * a score (the in-tie id order is range-decomposed too); the corpus
  * is touched once per statistic and everything downstream is grid-
  * or bucket-sized. */
object MlEval {

  /** @param df rows with an integer score and a 0/1 label
    * @return one row: (n_pos, n_neg, auc_e6) — null AUC when either
    *         class is empty */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df.select(col(scoreCol).cast("long").as("s"),
                      col(labelCol).cast("long").as("y"))
      .groupBy(col("s"))
      .agg(sum(col("y")).as("c_pos"),
           sum(lit(1L) - col("y")).as("c_neg"))
      .withColumn("c", col("c_pos") + col("c_neg"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
        g.withColumn("g", lit("all")), "g", "s", Seq("c"))
      .withColumn("r2", lit(2L) * col("cum_before_c") + col("c") + 1L)
    val agg = pre.agg(sum(col("c_pos")).as("n_pos"),
           sum(col("c") - col("c_pos")).as("n_neg"),
           // Σ pos·2midrank ~ n² — decimal(38), not long
           sum(col("c_pos").cast("decimal(38,0)") * col("r2")).as("r2_pos"))
    agg.select(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0L && col("n_neg") > 0L,
        expr("CAST((CAST(r2_pos AS DECIMAL(38,0))" +
             " - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000" +
             " div (CAST(n_pos AS DECIMAL(38,0)) * n_neg * 2) AS BIGINT)"))
        .otherwise(lit(null).cast("long")).as("auc_e6"))
  }

  /** Exact average precision (the sklearn step definition) — the
    * threshold-free companion to [[aucExact]]: AUC asks "does a
    * random positive outscore a random negative"; AP weights
    * precision by where the positives actually land, which is the
    * number a retrieval-style curation gate (keep the top slice)
    * is judged by. AP = Σ_thresholds (ΔR)·P =
    * Σ_v (p_v/P) · (TP_v / N_v) over distinct score values v walked
    * DESCENDING, with TP_v/N_v cumulative through v's whole tie
    * block (ties enter together — no per-row order dependence).
    *
    * Exactness: each threshold term p_v·TP_v·10⁶ div (P·N_v) is one
    * truncating integer division (decimal(38) — TP·p ~ n² passes
    * int64), the AP the order-free long sum of the terms (≤ one
    * e-6 truncation per DISTINCT score — the q306 per-cell rounding
    * discipline). Rides the same negated-score grid prefix as
    * [[aucExact]]: no single-task sort, corpus touched once.
    * @return one row: (n_pos, n_neg, ap_e6) — null when no
    *         positives */
  def averagePrecision(df: DataFrame, scoreCol: String,
                       labelCol: String): DataFrame = {
    val g = df.select(col(scoreCol).cast("long").as("s"),
                      col(labelCol).cast("long").as("y"))
      // negate so the VALUE-ascending grid walks scores DESCENDING
      .groupBy((-col("s")).as("v"))
      .agg(sum(col("y")).as("c_pos"), count(lit(1)).as("c"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
      g.withColumn("g", lit("all")), "g", "v", Seq("c", "c_pos"))
    val tot = pre.agg(max(col("cum_c_pos")).as("n_p"),
                      max(col("cum_c")).as("n_all"))
    pre.crossJoin(broadcast(tot))
      .withColumn("term", expr(
        "IF(n_p = 0, CAST(0 AS BIGINT)," + // no positives: AP nulled below
          " CAST(CAST(c_pos AS DECIMAL(38,0)) * cum_c_pos * 1000000" +
          " div (CAST(n_p AS DECIMAL(38,0)) * cum_c) AS BIGINT))"))
      .groupBy(col("n_p"), col("n_all"))
      .agg(sum(col("term")).as("ap_e6"))
      .select(col("n_p").as("n_pos"),
        (col("n_all") - col("n_p")).as("n_neg"),
        when(col("n_p") > 0L, col("ap_e6"))
          .otherwise(lit(null).cast("long")).as("ap_e6"))
  }

  /** @param df rows with an integer score, a 0/1 label, and a unique
    *        id (the deterministic tiebreak inside tied scores)
    * @param nBuckets bucket count (config; bucket 1 = HIGHEST scores)
    * @return per bucket: (bucket, n, n_pos, rate_e6, lift_e6,
    *         cum_capture_e6) — lift vs the overall positive rate,
    *         capture the cumulative share of all positives reached
    *         through this bucket */
  def liftTable(df: DataFrame, scoreCol: String, labelCol: String,
                idCol: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 1000, "nBuckets config-bounded")
    val base = df.select(col(scoreCol).cast("long").as("s"),
                         col(labelCol).cast("long").as("y"),
                         col(idCol).as("id"))
      // negate so the VALUE-ascending grid walks scores DESCENDING —
      // bucket 1 is the top band
      .withColumn("v", -col("s"))
    // rank0 = exclusive prefix count over the (score, id) STRUCT grid
    // — one grid row per corpus row, the in-tie order decomposed
    // across range buckets like the score axis itself, so a
    // coarse-score corpus (q309 scores are word counts) never lands
    // its widest tie group in one task (the r14 form ranked in-tie
    // ids with a per-score window — single-task per tie group)
    val ranked = graft.scale.GridPrefix.prefixSums(
      base.withColumn("vid", struct(col("v"), col("id")))
        .withColumn("one", lit(1L)),
      "vid", "one")
    val tot = ranked.agg(max(col("cum")).as("n_total"))
    val bucketed = ranked
      .crossJoin(broadcast(tot))
      .withColumn("bucket",
        expr(s"(cum_before * CAST($nBuckets AS BIGINT)) div n_total") + 1L)
    val perB = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
           max(col("n_total")).as("n_total"))
    val totals = perB.agg(sum(col("n_pos")).as("pos_total"))
    val wCum = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the cumulative window runs over nBuckets rows — config-sized,
    // not a corpus sort
    perB.crossJoin(broadcast(totals))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 div n").as("rate_e6"),
        when(col("pos_total") > 0L,
          expr("CAST(CAST(n_pos AS DECIMAL(38,0)) * n_total * 1000000" +
               " div (CAST(n AS DECIMAL(38,0)) * pos_total) AS BIGINT)"))
          .otherwise(lit(null).cast("long")).as("lift_e6"),
        when(col("pos_total") > 0L,
          expr("cum_pos * 1000000 div pos_total"))
          .otherwise(lit(null).cast("long")).as("cum_capture_e6"))
  }
}
