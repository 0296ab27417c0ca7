package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Holt's double exponential smoothing (level + trend) on the integer
  * cents grid — the forecasting rung between the EWMA taps
  * ([[SeriesOps.ewmaSmooth]], a finite-memory approximation) and the
  * full structural model ([[graft.forecast.StructuralTS]]): genuinely
  * recursive state, still oracle-replayable because every update is
  * exact long arithmetic with truncating `div` (Spark `div` and
  * DuckDB `//` agree on negatives — both truncate toward zero — so a
  * falling trend replays bit-for-bit).
  *
  * Recurrence (α = aN/aD, β = bN/bD as integer rationals; init
  * l₀ = y₀, b₀ = 0, pred₀ = y₀):
  *   pred_t = l + b
  *   l'     = (aN·y_t + (aD − aN)·(l + b)) div aD
  *   b'     = (bN·(l' − l) + (bD − bN)·b) div bD
  *
  * Scale shape: the recursion is inherently sequential PER SERIES, so
  * each series' day grid is collected into ONE array row (bounded by
  * the calendar domain — a decade of days is ~3,653 elements; this is
  * the documented bounded-grid contract, like the score lattice) and
  * folded with `aggregate` — a pure codegen'd projection. The
  * PARALLEL axis is the series count: one keyed groupBy, no windows,
  * no cross-series anything. */
object ExpSmooth {

  /** @return one row per (key, date): (key, date, y_c, level_c,
    *         trend_c, pred_c) with pred_c the one-step-ahead forecast
    *         made BEFORE seeing y_c. */
  def doubleExpSmooth(daily: DataFrame, keyCol: String, dateCol: String,
                      vCol: String, aNum: Int = 2, aDen: Int = 10,
                      bNum: Int = 3, bDen: Int = 10): DataFrame = {
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    val packed = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("s"))
    val fold = s"""
      |aggregate(
      |  s,
      |  named_struct(
      |    'fst', 1,
      |    'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<d: DATE, y: BIGINT, l: BIGINT,
      |                   b: BIGINT, pred: BIGINT>>)),
      |  (acc, x) -> CASE WHEN acc.fst = 1 THEN
      |      named_struct('fst', 0, 'l', x.y, 'b', CAST(0 AS BIGINT),
      |        'out', array(named_struct('d', x.d, 'y', x.y, 'l', x.y,
      |                     'b', CAST(0 AS BIGINT), 'pred', x.y)))
      |    ELSE
      |      named_struct('fst', 0,
      |        'l', ($aNum * x.y + ${aDen - aNum} * (acc.l + acc.b)) div $aDen,
      |        'b', ($bNum * ((($aNum * x.y + ${aDen - aNum} * (acc.l + acc.b))
      |                        div $aDen) - acc.l)
      |              + ${bDen - bNum} * acc.b) div $bDen,
      |        'out', array_append(acc.out, named_struct(
      |          'd', x.d, 'y', x.y,
      |          'l', ($aNum * x.y + ${aDen - aNum} * (acc.l + acc.b)) div $aDen,
      |          'b', ($bNum * ((($aNum * x.y + ${aDen - aNum} * (acc.l + acc.b))
      |                          div $aDen) - acc.l)
      |                + ${bDen - bNum} * acc.b) div $bDen,
      |          'pred', acc.l + acc.b)))
      |    END,
      |  acc -> acc.out)""".stripMargin
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.y").as("y_c"), col("r.l").as("level_c"),
              col("r.b").as("trend_c"), col("r.pred").as("pred_c"))
  }

  /** Damped-trend Holt ([[doubleExpSmooth]] with trend damping
    * φ = pNum/pDen): the plain Holt trend extrapolates linearly
    * forever — the damped variant shrinks the carried trend each
    * step (fb = φ·b, truncating), which is the standard fix for
    * over-forecasting at long horizons (Gardner–McKenzie).
    * Recurrence (exact longs, every φ·b use the SAME truncated
    * term):
    *   pred_t = l + fb
    *   l'     = (aN·y + (aD − aN)·(l + fb)) div aD
    *   b'     = (bN·(l' − l) + (bD − bN)·fb) div bD
    * Scale shape identical to [[doubleExpSmooth]]. */
  def dampedExpSmooth(daily: DataFrame, keyCol: String, dateCol: String,
                      vCol: String, aNum: Int = 2, aDen: Int = 10,
                      bNum: Int = 3, bDen: Int = 10,
                      pNum: Int = 9, pDen: Int = 10): DataFrame = {
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(pNum > 0 && pNum <= pDen, "phi in (0, 1]")
    val packed = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("s"))
    val fb = s"(($pNum * acc.b) div $pDen)"
    val lNew = s"(($aNum * x.y + ${aDen - aNum} * (acc.l + $fb)) div $aDen)"
    val fold = s"""
      |aggregate(
      |  s,
      |  named_struct(
      |    'fst', 1,
      |    'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<d: DATE, y: BIGINT, l: BIGINT,
      |                   b: BIGINT, pred: BIGINT>>)),
      |  (acc, x) -> CASE WHEN acc.fst = 1 THEN
      |      named_struct('fst', 0, 'l', x.y, 'b', CAST(0 AS BIGINT),
      |        'out', array(named_struct('d', x.d, 'y', x.y, 'l', x.y,
      |                     'b', CAST(0 AS BIGINT), 'pred', x.y)))
      |    ELSE
      |      named_struct('fst', 0,
      |        'l', $lNew,
      |        'b', ($bNum * ($lNew - acc.l)
      |              + ${bDen - bNum} * $fb) div $bDen,
      |        'out', array_append(acc.out, named_struct(
      |          'd', x.d, 'y', x.y,
      |          'l', $lNew,
      |          'b', ($bNum * ($lNew - acc.l)
      |                + ${bDen - bNum} * $fb) div $bDen,
      |          'pred', acc.l + $fb)))
      |    END,
      |  acc -> acc.out)""".stripMargin
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.y").as("y_c"), col("r.l").as("level_c"),
              col("r.b").as("trend_c"), col("r.pred").as("pred_c"))
  }

  /** Holt–Winters triple exponential smoothing (level + trend +
    * ADDITIVE seasonality, period `m`) on the integer cents grid —
    * [[doubleExpSmooth]] plus a length-`m` seasonal state array
    * carried through the same one-array-row-per-series fold, so the
    * weekly retail rhythm stops polluting the trend estimate.
    *
    * Recurrence (α = aN/aD, β = bN/bD, γ = gN/gD; phase p = t mod m;
    * init l₀ = y₀, b₀ = 0, s = m zeros, pred₀ = y₀):
    *   pred_t = l + b + s[p]
    *   l'     = (aN·(y_t − s[p]) + (aD − aN)·(l + b)) div aD
    *   b'     = (bN·(l' − l) + (bD − bN)·b) div bD
    *   s'[p]  = (gN·(y_t − l') + (gD − gN)·s[p]) div gD
    * All-zero seasonal init keeps the first cycle identical to Holt
    * (the seasonal estimate warms up over cycles — the standard
    * tradeoff vs a first-cycle average init, chosen because it
    * replays in exact long arithmetic with no seeding pass).
    *
    * Scale shape: identical to [[doubleExpSmooth]] — sequential per
    * series over the bounded calendar grid, parallel across series;
    * the seasonal array adds m longs to the fold state. */
  def tripleExpSmooth(daily: DataFrame, keyCol: String, dateCol: String,
                      vCol: String, m: Int = 7,
                      aNum: Int = 2, aDen: Int = 10,
                      bNum: Int = 1, bDen: Int = 10,
                      gNum: Int = 3, gDen: Int = 10): DataFrame = {
    require(m >= 2, "seasonal period must be >= 2")
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(gNum > 0 && gNum < gDen, "gamma in (0, 1)")
    val packed = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("s"))
    // phase index (0-based) and the three state updates, inlined at
    // every use site (lambdas can't bind locals — the q260 pattern)
    val sOld = s"element_at(acc.sv, CAST(acc.t % $m AS INT) + 1)"
    val lp = s"(($aNum * (x.y - $sOld)) + ${aDen - aNum} * (acc.l + acc.b)) div $aDen"
    val bp = s"($bNum * (($lp) - acc.l) + ${bDen - bNum} * acc.b) div $bDen"
    val sp = s"($gNum * (x.y - ($lp)) + ${gDen - gNum} * $sOld) div $gDen"
    val fold = s"""
      |aggregate(
      |  s,
      |  named_struct(
      |    'fst', 1, 't', CAST(0 AS BIGINT),
      |    'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
      |    'sv', array_repeat(CAST(0 AS BIGINT), $m),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<d: DATE, y: BIGINT, l: BIGINT, b: BIGINT,
      |                   seas: BIGINT, pred: BIGINT>>)),
      |  (acc, x) -> CASE WHEN acc.fst = 1 THEN
      |      named_struct('fst', 0, 't', CAST(1 AS BIGINT),
      |        'l', x.y, 'b', CAST(0 AS BIGINT), 'sv', acc.sv,
      |        'out', array(named_struct('d', x.d, 'y', x.y, 'l', x.y,
      |          'b', CAST(0 AS BIGINT), 'seas', CAST(0 AS BIGINT),
      |          'pred', x.y)))
      |    ELSE
      |      named_struct('fst', 0, 't', acc.t + 1,
      |        'l', $lp,
      |        'b', $bp,
      |        'sv', transform(acc.sv, (e, i) ->
      |          CASE WHEN i = CAST(acc.t % $m AS INT) THEN $sp ELSE e END),
      |        'out', array_append(acc.out, named_struct(
      |          'd', x.d, 'y', x.y, 'l', $lp, 'b', $bp, 'seas', $sp,
      |          'pred', acc.l + acc.b + $sOld)))
      |    END,
      |  acc -> acc.out)""".stripMargin
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.y").as("y_c"), col("r.l").as("level_c"),
              col("r.b").as("trend_c"), col("r.seas").as("seas_c"),
              col("r.pred").as("pred_c"))
  }

  /** MULTIPLICATIVE Holt–Winters — [[tripleExpSmooth]] with RATIO
    * seasonality: retail/traffic rhythms scale with the level
    * (a +20% Saturday, not a +2,000¢ Saturday), so the additive
    * seasonal state chronically under-corrects growing series.
    * Seasonal factors live on the e6 ratio grid (10⁶ = flat), init
    * all-1e6 (the multiplicative analog of the additive all-zero
    * warm-up, same documented first-cycle tradeoff):
    *
    *   pred_t = (l + b)·s[p] div 10⁶
    *   l'     = (aN·(10⁶·y div s[p]) + (aD − aN)·(l + b)) div aD
    *   b'     = (bN·(l' − l) + (bD − bN)·b) div bD
    *   s'[p]  = (gN·(10⁶·y div l') + (gD − gN)·s[p]) div gD
    *
    * POSITIVE-series contract (multiplicative seasonality is
    * undefined otherwise); the two guards (s[p] ≤ 0 → deseasonalize
    * by 1; l' ≤ 0 → carry s[p]) only keep degenerate inputs from
    * dividing by zero, mirrored exactly by the oracle. 10⁶·y bounds
    * exactness at |y| ≲ 10¹² cents. Scale shape identical to
    * [[tripleExpSmooth]].
    * @return per (key, date): (key, date, y_c, level_c, trend_c,
    *         seas_e6, pred_c) */
  def tripleExpSmoothMul(daily: DataFrame, keyCol: String, dateCol: String,
                         vCol: String, m: Int = 7,
                         aNum: Int = 2, aDen: Int = 10,
                         bNum: Int = 1, bDen: Int = 10,
                         gNum: Int = 3, gDen: Int = 10): DataFrame = {
    require(m >= 2, "seasonal period must be >= 2")
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(gNum > 0 && gNum < gDen, "gamma in (0, 1)")
    val packed = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("s"))
    val sOld = s"element_at(acc.sv, CAST(acc.t % $m AS INT) + 1)"
    val ds = s"(CASE WHEN ($sOld) <= 0 THEN x.y" +
      s" ELSE (x.y * 1000000) div ($sOld) END)"
    val lp = s"(($aNum * $ds + ${aDen - aNum} * (acc.l + acc.b)) div $aDen)"
    val bp = s"(($bNum * (($lp) - acc.l) + ${bDen - bNum} * acc.b)" +
      s" div $bDen)"
    val sp = s"(CASE WHEN ($lp) <= 0 THEN $sOld" +
      s" ELSE ($gNum * ((x.y * 1000000) div ($lp))" +
      s" + ${gDen - gNum} * $sOld) div $gDen END)"
    val fold = s"""
      |aggregate(
      |  s,
      |  named_struct(
      |    'fst', 1, 't', CAST(0 AS BIGINT),
      |    'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
      |    'sv', array_repeat(CAST(1000000 AS BIGINT), $m),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<d: DATE, y: BIGINT, l: BIGINT, b: BIGINT,
      |                   seas: BIGINT, pred: BIGINT>>)),
      |  (acc, x) -> CASE WHEN acc.fst = 1 THEN
      |      named_struct('fst', 0, 't', CAST(1 AS BIGINT),
      |        'l', x.y, 'b', CAST(0 AS BIGINT), 'sv', acc.sv,
      |        'out', array(named_struct('d', x.d, 'y', x.y, 'l', x.y,
      |          'b', CAST(0 AS BIGINT), 'seas', CAST(1000000 AS BIGINT),
      |          'pred', x.y)))
      |    ELSE
      |      named_struct('fst', 0, 't', acc.t + 1,
      |        'l', $lp,
      |        'b', $bp,
      |        'sv', transform(acc.sv, (e, i) ->
      |          CASE WHEN i = CAST(acc.t % $m AS INT) THEN $sp ELSE e END),
      |        'out', array_append(acc.out, named_struct(
      |          'd', x.d, 'y', x.y, 'l', $lp, 'b', $bp, 'seas', $sp,
      |          'pred', ((acc.l + acc.b) * ($sOld)) div 1000000)))
      |    END,
      |  acc -> acc.out)""".stripMargin
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.y").as("y_c"), col("r.l").as("level_c"),
              col("r.b").as("trend_c"), col("r.seas").as("seas_e6"),
              col("r.pred").as("pred_c"))
  }

  /** SEEDED Holt–Winters — [[tripleExpSmooth]] with the textbook
    * first-cycle initialization instead of the all-zero seasonal
    * start (whose first cycle is identical to Holt while the seasonal
    * state warms up — the documented tradeoff this variant closes):
    *   l_seed = (Σ_{i<m} y_i) div m        (truncating — exact long)
    *   s_seed[p] = y_p − l_seed, b_seed = 0
    * The first m observations ARE the seed cycle: they emit
    * (level = l_seed, trend = 0, seas = their seed index,
    * pred = NULL — no forecast exists while seeding), and the
    * recursion runs the STANDARD update equations from observation
    * m + 1 with phase t mod m aligned so element m reuses seed
    * index 0. Series with fewer than m observations cannot average a
    * complete first cycle and fall back to the zero-init recursion
    * (documented; same rows as [[tripleExpSmooth]]).
    *
    * Same bounded-grid fold shape; the seed level/vector are
    * per-series expressions over the first-cycle slice. */
  def tripleExpSmoothSeeded(daily: DataFrame, keyCol: String,
                            dateCol: String, vCol: String, m: Int = 7,
                            aNum: Int = 2, aDen: Int = 10,
                            bNum: Int = 1, bDen: Int = 10,
                            gNum: Int = 3, gDen: Int = 10): DataFrame = {
    require(m >= 2, "seasonal period must be >= 2")
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(gNum > 0 && gNum < gDen, "gamma in (0, 1)")
    val packed = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("s"))
    // short series: no complete first cycle to average — zero-init
    val short = tripleExpSmooth(
      daily.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
        .filter(col("n") < m).select(col(keyCol))
        .join(daily, Seq(keyCol)),
      keyCol, dateCol, vCol, m, aNum, aDen, bNum, bDen, gNum, gDen)
    val seeded = packed.filter(size(col("s")) >= m)
      .withColumn("lseed", expr(
        s"aggregate(slice(s, 1, $m), CAST(0 AS BIGINT), (a, x) -> a + x.y) div $m"))
    val sOld = s"element_at(acc.sv, CAST(acc.t % $m AS INT) + 1)"
    val lp = s"(($aNum * (x.y - $sOld)) + ${aDen - aNum} * (acc.l + acc.b)) div $aDen"
    val bp = s"($bNum * (($lp) - acc.l) + ${bDen - bNum} * acc.b) div $bDen"
    val sp = s"($gNum * (x.y - ($lp)) + ${gDen - gNum} * $sOld) div $gDen"
    val fold = s"""
      |aggregate(
      |  slice(s, $m + 1, size(s) - $m),
      |  named_struct(
      |    't', CAST($m AS BIGINT), 'l', lseed, 'b', CAST(0 AS BIGINT),
      |    'sv', transform(slice(s, 1, $m), x -> x.y - lseed),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<d: DATE, y: BIGINT, l: BIGINT, b: BIGINT,
      |                   seas: BIGINT, pred: BIGINT>>)),
      |  (acc, x) ->
      |      named_struct('t', acc.t + 1,
      |        'l', $lp,
      |        'b', $bp,
      |        'sv', transform(acc.sv, (e, i) ->
      |          CASE WHEN i = CAST(acc.t % $m AS INT) THEN $sp ELSE e END),
      |        'out', array_append(acc.out, named_struct(
      |          'd', x.d, 'y', x.y, 'l', $lp, 'b', $bp, 'seas', $sp,
      |          'pred', acc.l + acc.b + $sOld))),
      |  acc -> acc.out)""".stripMargin
    val seedRows = seeded
      .select(col("k"), col("lseed"), explode(expr(s"slice(s, 1, $m)")).as("x"))
      .select(col("k").as(keyCol), col("x.d").as(dateCol),
              col("x.y").as("y_c"), col("lseed").as("level_c"),
              lit(0L).as("trend_c"), (col("x.y") - col("lseed")).as("seas_c"),
              lit(null).cast("long").as("pred_c"))
    val recRows = seeded
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.y").as("y_c"), col("r.l").as("level_c"),
              col("r.b").as("trend_c"), col("r.seas").as("seas_c"),
              col("r.pred").as("pred_c"))
    seedRows.unionByName(recRows).unionByName(short)
  }

  /** h-step-ahead Holt–Winters forecast — the FUTURE-GRID projection
    * from [[tripleExpSmooth]]'s final state: pred_h = l + h·b +
    * s[(t + h − 1) mod m], exact longs (the model's standard
    * out-of-sample form). Same fold, but the finish keeps only the
    * final (l, b, seasonal vector, step count, last date) per series,
    * and the horizon explodes in projection. */
  def tripleExpForecast(daily: DataFrame, keyCol: String, dateCol: String,
                        vCol: String, horizon: Int, m: Int = 7,
                        aNum: Int = 2, aDen: Int = 10,
                        bNum: Int = 1, bDen: Int = 10,
                        gNum: Int = 3, gDen: Int = 10): DataFrame = {
    require(horizon >= 1, "horizon must be >= 1")
    require(m >= 2, "seasonal period must be >= 2")
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(gNum > 0 && gNum < gDen, "gamma in (0, 1)")
    val packed = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("s"))
    val sOld = s"element_at(acc.sv, CAST(acc.t % $m AS INT) + 1)"
    val lp = s"(($aNum * (x.y - $sOld)) + ${aDen - aNum} * (acc.l + acc.b)) div $aDen"
    val bp = s"($bNum * (($lp) - acc.l) + ${bDen - bNum} * acc.b) div $bDen"
    val sp = s"($gNum * (x.y - ($lp)) + ${gDen - gNum} * $sOld) div $gDen"
    val fold = s"""
      |aggregate(
      |  s,
      |  named_struct(
      |    'fst', 1, 't', CAST(0 AS BIGINT),
      |    'l', CAST(0 AS BIGINT), 'b', CAST(0 AS BIGINT),
      |    'sv', array_repeat(CAST(0 AS BIGINT), $m),
      |    'd', CAST(NULL AS DATE)),
      |  (acc, x) -> CASE WHEN acc.fst = 1 THEN
      |      named_struct('fst', 0, 't', CAST(1 AS BIGINT),
      |        'l', x.y, 'b', CAST(0 AS BIGINT), 'sv', acc.sv, 'd', x.d)
      |    ELSE
      |      named_struct('fst', 0, 't', acc.t + 1,
      |        'l', $lp,
      |        'b', $bp,
      |        'sv', transform(acc.sv, (e, i) ->
      |          CASE WHEN i = CAST(acc.t % $m AS INT) THEN $sp ELSE e END),
      |        'd', x.d)
      |    END,
      |  acc -> acc)""".stripMargin
    packed
      .select(col("k"), expr(fold).as("st"))
      .select(col("k"), col("st"),
              explode(expr(s"sequence(1, $horizon)")).as("h"))
      .select(col("k").as(keyCol),
        expr("date_add(st.d, CAST(h AS INT))").as(dateCol),
        col("h").cast("long").as("h"),
        expr(s"""st.l + h * st.b +
          | element_at(st.sv, CAST((st.t + h - 1) % $m AS INT) + 1)"""
          .stripMargin).as("pred_c"))
  }

  /** Theta-method smoothing (Assimakopoulos–Nikolopoulos, θ = 2) —
    * the M3-winning middle ground between Holt's recursion and the
    * plain OLS trend (q-per-series trend): decompose the series into
    * the θ = 0 line (the OLS trend, pure long-run direction) and the
    * θ = 2 line z_t = 2y_t − (a + b·t) (curvature doubled), SES the
    * θ = 2 line, and forecast with the average of the two — the
    * drift the SES alone underestimates comes from the line, the
    * local level the line ignores comes from the SES.
    *
    * Exactness: the OLS coefficients are quantized ONCE to the e6
    * grid by truncating division of exact integer sums (b_e6 =
    * 10⁶·(nΣty − ΣtΣy) div D with D = n²(n²−1)/12 in closed form;
    * a_e6 = (10⁶Σy − b_e6·Σt) div n — decimal(38) guards nΣty);
    * everything after runs on exact e6 longs: z, the SES recursion
    * (l' = (aN·z + (aD−aN)·l) div aD, l₁ = z₁), and the one-step
    * forecast pred_t = (l_{t−1} + a_e6 + b_e6·t) div 2 made BEFORE
    * seeing y_t (pred₁ = 10⁶·y₁). A SQL oracle replays every step.
    *
    * Scale shape: [[doubleExpSmooth]]'s — one bounded calendar-grid
    * array per series (the e6 grid bounds |y|·n·10⁶ ≲ int64: cents
    * levels to ~10⁹ on decade grids), series count is the parallel
    * axis. @return per (key, date): (key, date, y_c, line_e6,
    * ses_e6, pred_e6) */
  def thetaSmooth(daily: DataFrame, keyCol: String, dateCol: String,
                  vCol: String, aNum: Int = 2, aDen: Int = 10): DataFrame = {
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    val d38 = "decimal(38,0)"
    val packed = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y")))).as("s"))
      .withColumn("n", size(col("s")).cast("long"))
      // Σy and Σt·y in one array pass (t = 1-based position)
      .withColumn("sums", expr(
        """aggregate(s,
          |  named_struct('t', CAST(0 AS BIGINT), 'sy', CAST(0 AS BIGINT),
          |               'sty', CAST(0 AS BIGINT)),
          |  (acc, x) -> named_struct('t', acc.t + 1,
          |    'sy', acc.sy + x.y, 'sty', acc.sty + (acc.t + 1) * x.y),
          |  acc -> acc)""".stripMargin))
      // closed forms: Σt = n(n+1)/2, D = n²(n²−1)/12 (exact — both
      // divide evenly); decimal(38) carries n·Σty past int64
      .withColumn("st", expr("n * (n + 1) div 2"))
      .withColumn("b_e6", expr(
        s"""CASE WHEN n < 2 THEN CAST(0 AS BIGINT)
           |ELSE CAST((CAST(n AS $d38) * sums.sty
           |           - CAST(st AS $d38) * sums.sy) * 1000000
           |  div (CAST(n AS $d38) * n * (CAST(n AS $d38) * n - 1)
           |       div 12) AS BIGINT) END""".stripMargin))
      .withColumn("a_e6", expr(
        s"""CAST((CAST(sums.sy AS $d38) * 1000000
           |  - CAST(b_e6 AS $d38) * st) div n AS BIGINT)""".stripMargin))
    // z_t = 2·10⁶·y − (a + b·t); SES on z; pred from the PREVIOUS
    // SES state plus the line at t, halved
    val fold =
      """aggregate(
        |  s,
        |  named_struct(
        |    't', CAST(0 AS BIGINT), 'l', CAST(0 AS BIGINT),
        |    'out', CAST(array() AS
        |      ARRAY<STRUCT<d: DATE, y: BIGINT, line: BIGINT,
        |                   ses: BIGINT, pred: BIGINT>>)),
        |  (acc, x) -> CASE WHEN acc.t = 0 THEN
        |      named_struct('t', CAST(1 AS BIGINT),
        |        'l', 2 * 1000000 * x.y - (a_e6 + b_e6),
        |        'out', array(named_struct('d', x.d, 'y', x.y,
        |          'line', a_e6 + b_e6,
        |          'ses', 2 * 1000000 * x.y - (a_e6 + b_e6),
        |          'pred', 1000000 * x.y)))
        |    ELSE
        |      named_struct('t', acc.t + 1,
        |        'l', (ANUM * (2 * 1000000 * x.y
        |                      - (a_e6 + b_e6 * (acc.t + 1)))
        |              + ADM * acc.l) div ADEN,
        |        'out', array_append(acc.out, named_struct(
        |          'd', x.d, 'y', x.y,
        |          'line', a_e6 + b_e6 * (acc.t + 1),
        |          'ses', (ANUM * (2 * 1000000 * x.y
        |                          - (a_e6 + b_e6 * (acc.t + 1)))
        |                  + ADM * acc.l) div ADEN,
        |          'pred', (acc.l + a_e6 + b_e6 * (acc.t + 1)) div 2)))
        |    END,
        |  acc -> acc.out)""".stripMargin
        .replace("ANUM", aNum.toString)
        .replace("ADM", (aDen - aNum).toString)
        .replace("ADEN", aDen.toString)
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.y").as("y_c"), col("r.line").as("line_e6"),
              col("r.ses").as("ses_e6"), col("r.pred").as("pred_e6"))
  }
}
