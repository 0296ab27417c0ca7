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

  /** Calibration readout — Brier score + reliability bins (the ECE
    * decomposition): [[aucExact]] and [[averagePrecision]] grade the
    * RANKING a score induces; this grades the score AS A PROBABILITY
    * — "when the gate says 0.8, is it right 80% of the time" — the
    * number that decides whether a threshold chosen offline
    * transfers to a shifted corpus.
    *
    * Input probabilities live on the e6 grid (p_e6 ∈ [0, 10⁶], the
    * engine's fixed-point probability convention). Per fixed-width
    * bin b: confidence = Σp_e6 div n_b, accuracy = 10⁶·pos_b div
    * n_b, gap = |Σp_e6 − 10⁶·pos_b| div n_b — exact integers.
    * Global ECE = Σ_b |Σp_e6(b) − 10⁶·pos_b| div N (ONE truncation,
    * not a sum of per-bin roundings); global Brier =
    * Σ(p_e6 − 10⁶y)² div (N·10⁶) (terms ≤ 10¹² — the sum needs
    * decimal(38) past ~10⁶ rows), landing Brier on the same e6
    * grid. ONE corpus aggregate into nBins groups; every window-free.
    *
    * @param df rows with an e6 probability and a 0/1 label
    * @param nBins fixed-width bin count (config; bin 0 = [0, 1/B))
    * @return per bin: (bin, n, n_pos, conf_e6, acc_e6, gap_e6,
    *         n_total, ece_e6, brier_e6) — global columns broadcast
    *         onto every bin row (the q317 convention) */
  def brierCalibration(df: DataFrame, probE6Col: String, labelCol: String,
                       nBins: Int): DataFrame = {
    require(nBins >= 2 && nBins <= 1000, "nBins config-bounded")
    val d38 = "decimal(38,0)"
    val rows = df.select(col(probE6Col).cast("long").as("p"),
                         col(labelCol).cast("long").as("y"))
    val perB = rows
      .withColumn("bin",
        least(expr(s"p * CAST($nBins AS BIGINT) div 1000000"),
          lit(nBins - 1L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
           sum(col("p")).as("sum_p"),
           sum((col("p") - lit(1000000L) * col("y")).cast(d38) *
             (col("p") - lit(1000000L) * col("y"))).as("sq"))
    val tot = perB.agg(sum(col("n")).as("n_total"),
      sum(abs(col("sum_p") - lit(1000000L) * col("n_pos"))).as("gap_sum"),
      sum(col("sq")).as("sq_sum"))
    perB.crossJoin(broadcast(tot))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("sum_p div n").as("conf_e6"),
        expr("n_pos * 1000000 div n").as("acc_e6"),
        expr("abs(sum_p - 1000000 * n_pos) div n").as("gap_e6"),
        col("n_total"),
        expr("gap_sum div n_total").as("ece_e6"),
        expr("CAST(sq_sum div (CAST(n_total AS DECIMAL(38,0)) * 1000000)" +
          " AS BIGINT)").as("brier_e6"))
  }

  /** Best-F1 threshold sweep — the operating-point chooser the rank
    * metrics above inform but don't decide: walk every distinct
    * score as the "keep s ≥ thr" threshold, score each by exact F1,
    * and return the confusion matrix at the argmax (ties broken
    * toward the HIGHER threshold — the smaller keep set). The
    * threshold a score-based curation gate actually ships with.
    *
    * Per distinct score v (descending): TP = cum_pos, FP = cum −
    * cum_pos, FN = P − TP; F1 = 2TP/(2TP+FP+FN) exact as
    * 2·TP·10⁶ div (2TP+FP+FN) (denominator > 0 at every grid
    * threshold — cum ≥ 1). The argmax is TWO exact max aggregates
    * (max F1, then max threshold among rows attaining it — no
    * struct-ordered argmax, both engines replay it verbatim).
    * Precision/recall at the winner are truncating e6; MCC is one
    * fixed double tree over the exact counts (products ~ n⁴ sit
    * well inside double range). Rides the same negated-score grid
    * prefix as [[aucExact]] — no single-task sort, corpus touched
    * once.
    * @return one row: (thr, tp, fp, fn, tn, prec_e6, rec_e6, f1_e6,
    *         mcc_e6) — f1/recall null when there are no positives;
    *         MCC null when either class is empty or its denominator
    *         vanishes */
  def bestF1Threshold(df: DataFrame, scoreCol: String,
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
    val stats = pre.crossJoin(broadcast(tot))
      .select((-col("v")).as("thr"),
        col("cum_c_pos").as("tp"),
        (col("cum_c") - col("cum_c_pos")).as("fp"),
        (col("n_p") - col("cum_c_pos")).as("fn"),
        (col("n_all") - col("n_p") - col("cum_c") + col("cum_c_pos"))
          .as("tn"),
        col("n_p"), col("n_all"))
      .withColumn("f1_e6",
        expr("2 * tp * 1000000 div (2 * tp + fp + fn)"))
    val best = stats.agg(max(col("f1_e6")).as("f1_best"))
    val win = stats.crossJoin(broadcast(best))
      .filter(col("f1_e6") === col("f1_best"))
    val thrBest = win.agg(max(col("thr")).as("thr_best"))
    val mccDen = sqrt(
      (col("tp") + col("fp")).cast("double") * (col("tp") + col("fn")) *
        (col("tn") + col("fp")) * (col("tn") + col("fn")))
    val mccNum = (col("tp").cast("decimal(38,0)") * col("tn") -
      col("fp").cast("decimal(38,0)") * col("fn")).cast("double")
    win.crossJoin(broadcast(thrBest))
      .filter(col("thr") === col("thr_best"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
        expr("tp * 1000000 div (tp + fp)").as("prec_e6"),
        when(col("n_p") > 0L, expr("tp * 1000000 div n_p"))
          .otherwise(lit(null).cast("long")).as("rec_e6"),
        when(col("n_p") > 0L, col("f1_e6"))
          .otherwise(lit(null).cast("long")).as("f1_e6"),
        when(col("n_p") > 0L && col("n_p") < col("n_all") && mccDen > 0.0,
          round(mccNum / mccDen * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")).as("mcc_e6"))
  }
}
