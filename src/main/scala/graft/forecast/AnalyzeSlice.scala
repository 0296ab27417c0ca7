package graft.forecast

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's flagship `/analyze` dataflow (§3.1,
  * `app.py:96-250`) composed as ONE batch operator over two daily
  * grids — target and covariate — per key:
  *
  *   1. covariate model state (Holt–Winters — the engine's streaming
  *      forecast state family) folds over the covariate's observed
  *      days;
  *   2. every day carries the covariate's h-step-ahead PREDICTION
  *      from the last folded state (C6 future grid: h = union-grid
  *      days since the last covariate observation, seasonal phase
  *      `(t + h − 1) mod m` — exactly the one-step fold phase at
  *      h = 1);
  *   3. J1 + J2 splice: observed covariate overrides the prediction
  *      (`cov_c = coalesce(observed, predicted)`);
  *   4. J3 alignment: output rows are the TARGET's days, each with
  *      the spliced covariate attached;
  *   5. the target's own Holt–Winters fold emits
  *      level/trend/seas/pred per target day.
  *
  * The whole composition is one fold over the per-key UNION day grid
  * (target ∪ covariate days, calendar-bounded by contract), packed to
  * one array row per key — the `ExpSmooth.tripleExpSmooth` device
  * with a second state vector and the splice bookkeeping. Exact long
  * arithmetic end to end (truncating `div`), so a recursive-CTE
  * oracle replays it bit for bit; the streaming twin
  * ([[graft.streaming.StreamAnalyze]]) runs the SAME recursion as
  * per-series state and is parity-pinned against this operator.
  *
  * Scale shape: one keyed full-outer join (the union grid) + one
  * `collect_list` shuffle; everything else is in-row. State is
  * 2·(m + 3) longs per key however long the grid runs. */
object AnalyzeSlice {

  /** @param tgtDaily per-(key, day) target grid — (keyCol, dateCol,
    *        tgtCol); one row per key-day
    * @param covDaily per-(key, day) covariate grid — (keyCol,
    *        dateCol, covCol)
    * @return one row per TARGET day: (key, date, y_c, cov_obs_c,
    *         cov_pred_c, cov_c, level_c, trend_c, seas_c, pred_c) —
    *         cov_obs_c null when the covariate skipped the day,
    *         cov_pred_c null before the covariate's first
    *         observation, cov_c their coalesce (the J1/J2 splice) */
  def analyzeSlice(tgtDaily: DataFrame, covDaily: DataFrame,
                   keyCol: String, dateCol: String,
                   tgtCol: String, covCol: String, m: Int = 7,
                   aNum: Int = 2, aDen: Int = 10,
                   bNum: Int = 1, bDen: Int = 10,
                   gNum: Int = 3, gDen: Int = 10): DataFrame = {
    require(m >= 2, "seasonal period must be >= 2")
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(gNum > 0 && gNum < gDen, "gamma in (0, 1)")
    val t0 = tgtDaily.select(col(keyCol).as("k"), col(dateCol).as("d"),
                             col(tgtCol).cast("long").as("yt"))
    val c0 = covDaily.select(col(keyCol).as("k"), col(dateCol).as("d"),
                             col(covCol).cast("long").as("yv"))
    val u = t0.join(c0, Seq("k", "d"), "full_outer")
    val packed = u.groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("yt"),
                                          col("yv")))).as("s"))
    // SQL fragments, inlined at every use site (lambdas can't bind
    // locals — the ExpSmooth pattern). Target update:
    val sOldT = s"element_at(acc.svT, CAST(acc.tT % $m AS INT) + 1)"
    val lpT = s"(($aNum * (x.yt - $sOldT)) + ${aDen - aNum} * (acc.lT + acc.bT)) div $aDen"
    val bpT = s"($bNum * (($lpT) - acc.lT) + ${bDen - bNum} * acc.bT) div $bDen"
    val spT = s"($gNum * (x.yt - ($lpT)) + ${gDen - gNum} * $sOldT) div $gDen"
    // covariate update:
    val sOldC = s"element_at(acc.svC, CAST(acc.tC % $m AS INT) + 1)"
    val lpC = s"(($aNum * (x.yv - $sOldC)) + ${aDen - aNum} * (acc.lC + acc.bC)) div $aDen"
    val bpC = s"($bNum * (($lpC) - acc.lC) + ${bDen - bNum} * acc.bC) div $bDen"
    val spC = s"($gNum * (x.yv - ($lpC)) + ${gDen - gNum} * $sOldC) div $gDen"
    // the h-step-ahead covariate prediction from the PRE-update
    // state: h = hg + 1 union days since the last covariate fold
    val cpred = s"IF(acc.tC > 0, acc.lC + (acc.hg + 1) * acc.bC + " +
      s"element_at(acc.svC, CAST((acc.tC + acc.hg) % $m AS INT) + 1), " +
      "CAST(NULL AS BIGINT))"
    val fold = s"""
      |aggregate(
      |  s,
      |  named_struct(
      |    'tT', CAST(0 AS BIGINT), 'lT', CAST(0 AS BIGINT),
      |    'bT', CAST(0 AS BIGINT),
      |    'svT', array_repeat(CAST(0 AS BIGINT), $m),
      |    'tC', CAST(0 AS BIGINT), 'lC', CAST(0 AS BIGINT),
      |    'bC', CAST(0 AS BIGINT),
      |    'svC', array_repeat(CAST(0 AS BIGINT), $m),
      |    'hg', CAST(0 AS BIGINT),
      |    'out', CAST(array() AS ARRAY<STRUCT<
      |      d: DATE, yt: BIGINT, cobs: BIGINT, cpred: BIGINT,
      |      csp: BIGINT, l: BIGINT, b: BIGINT, seas: BIGINT,
      |      pred: BIGINT>>)),
      |  (acc, x) -> named_struct(
      |    'tT', CASE WHEN x.yt IS NULL THEN acc.tT ELSE acc.tT + 1 END,
      |    'lT', CASE WHEN x.yt IS NULL THEN acc.lT
      |               WHEN acc.tT = 0 THEN x.yt ELSE $lpT END,
      |    'bT', CASE WHEN x.yt IS NULL OR acc.tT = 0 THEN acc.bT
      |               ELSE $bpT END,
      |    'svT', CASE WHEN x.yt IS NULL OR acc.tT = 0 THEN acc.svT
      |                ELSE transform(acc.svT, (e, i) ->
      |                  CASE WHEN i = CAST(acc.tT % $m AS INT)
      |                       THEN $spT ELSE e END) END,
      |    'tC', CASE WHEN x.yv IS NULL THEN acc.tC ELSE acc.tC + 1 END,
      |    'lC', CASE WHEN x.yv IS NULL THEN acc.lC
      |               WHEN acc.tC = 0 THEN x.yv ELSE $lpC END,
      |    'bC', CASE WHEN x.yv IS NULL OR acc.tC = 0 THEN acc.bC
      |               ELSE $bpC END,
      |    'svC', CASE WHEN x.yv IS NULL OR acc.tC = 0 THEN acc.svC
      |                ELSE transform(acc.svC, (e, i) ->
      |                  CASE WHEN i = CAST(acc.tC % $m AS INT)
      |                       THEN $spC ELSE e END) END,
      |    'hg', CASE WHEN x.yv IS NULL THEN acc.hg + 1
      |               ELSE CAST(0 AS BIGINT) END,
      |    'out', CASE WHEN x.yt IS NULL THEN acc.out
      |      ELSE array_append(acc.out, named_struct(
      |        'd', x.d, 'yt', x.yt, 'cobs', x.yv, 'cpred', $cpred,
      |        'csp', coalesce(x.yv, $cpred),
      |        'l', CASE WHEN acc.tT = 0 THEN x.yt ELSE $lpT END,
      |        'b', CASE WHEN acc.tT = 0 THEN CAST(0 AS BIGINT)
      |                  ELSE $bpT END,
      |        'seas', CASE WHEN acc.tT = 0 THEN CAST(0 AS BIGINT)
      |                     ELSE $spT END,
      |        'pred', CASE WHEN acc.tT = 0 THEN x.yt
      |                     ELSE acc.lT + acc.bT + $sOldT END)) END),
      |  acc -> acc.out)""".stripMargin
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.yt").as("y_c"), col("r.cobs").as("cov_obs_c"),
              col("r.cpred").as("cov_pred_c"), col("r.csp").as("cov_c"),
              col("r.l").as("level_c"), col("r.b").as("trend_c"),
              col("r.seas").as("seas_c"), col("r.pred").as("pred_c"))
  }
}
