package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series time-series repair and diagnostics: calendar gap-fill
  * with linear interpolation, CUSUM change-point location, and robust
  * seasonal-profile outlier detection — the preprocessing a forecast
  * or monitoring pipeline runs between raw events and a model fit
  * (the reference's pandas notebooks assume a complete, clean daily
  * grid; these operators are what MAKE the grid complete and clean).
  *
  * Scale shape, shared by all three: every window is partitioned by
  * the SERIES key (or the seasonal cell), never global — the parallel
  * axis is series count, the sequential axis is one series' length,
  * which is calendar-bounded (a decade of days is ~3.7k rows per
  * partition). Grids are generated per-series with `sequence` (no
  * driver loop), aggregates are keyed, and nothing is collected.
  *
  * Determinism: values ride the exact cents grid ([[graft.queries
  * .cents]]); interpolation is a single double round over exact
  * integer inputs (identical IEEE in Spark and DuckDB); medians are
  * EXACT lower medians over a (value, id) total order, not
  * percentile approximations — every output hash-stable.
  */
object SeriesOps {

  /** Calendar gap-fill + linear interpolation. Input: one row per
    * (series, day) OBSERVATION with an exact-integer value `vCol`
    * (gaps simply absent). Output: one row per (series, day) on the
    * full per-series [min-day, max-day] grid:
    *   - `obs_c`    the observed value (null on gap days)
    *   - `filled_c` observed where present; linearly interpolated
    *                between the nearest observed neighbours
    *                (`round(prev + (next-prev)*off/span)`); clamped
    *                to the nearest anchor at the series edges (no
    *                extrapolation)
    *   - `is_gap`   1 when the day was absent from the input
    *
    * The grid is generated per-series via `sequence(d0, d1)` —
    * series length rows, no driver loop; anchors come from two
    * keyed `last/first IGNORE NULLS` running windows (one forward,
    * one reverse), each partitioned by series. */
  def gapFill(daily: DataFrame, keyCol: String, dateCol: String,
              vCol: String): DataFrame = {
    val spans = daily.groupBy(col(keyCol))
      .agg(min(col(dateCol)).as("d0"), max(col(dateCol)).as("d1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("d0"), col("d1"))).as(dateCol))
    val joined = grid.join(
      daily.select(col(keyCol), col(dateCol), col(vCol).as("obs_c")),
      Seq(keyCol, dateCol), "left")
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bwd = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val anchored = joined
      .withColumn("prev_c", last(col("obs_c"), ignoreNulls = true).over(fwd))
      .withColumn("prev_d",
        last(when(col("obs_c").isNotNull, col(dateCol)), ignoreNulls = true).over(fwd))
      .withColumn("next_c", first(col("obs_c"), ignoreNulls = true).over(bwd))
      .withColumn("next_d",
        first(when(col("obs_c").isNotNull, col(dateCol)), ignoreNulls = true).over(bwd))
    // single-expression IEEE interpolation over exact ints: both
    // engines compute round(prev + (next-prev) * off / span) on
    // identical doubles (inputs < 2^53) -> identical longs
    val interp = round(col("prev_c") +
      (col("next_c") - col("prev_c")) *
        datediff(col(dateCol), col("prev_d")) /
        datediff(col("next_d"), col("prev_d"))).cast("long")
    anchored.select(col(keyCol), col(dateCol),
      col("obs_c").cast("long").as("obs_c"),
      when(col("obs_c").isNotNull, col("obs_c"))
        .when(col("prev_c").isNull, col("next_c"))
        .when(col("next_c").isNull, col("prev_c"))
        .otherwise(interp).cast("long").as("filled_c"),
      when(col("obs_c").isNull, 1L).otherwise(0L).as("is_gap"))
  }

  /** CUSUM change-point location per series. For a per-day count
    * series, the cumulative sum of deviations from the series mean
    * peaks (in absolute value) at the most likely single change
    * point (Page 1954's CUSUM statistic, offline form). Deviations
    * are kept EXACT by scaling with the day count instead of
    * dividing: dev_k = n_days·c_k − total (so cusum is an integer
    * and the argmax is grid-free). Output: one row per series —
    * (series, change_d, max_abs_cusum, n_days, total_n) with
    * change_d the EARLIEST day attaining the max |cusum|.
    *
    * Shape: one keyed aggregate, one keyed running-sum window, one
    * keyed rank window — all partitioned by series. */
  def cusumChangepoint(daily: DataFrame, keyCol: String, dateCol: String,
                       cntCol: String): DataFrame = {
    val stats = daily.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_days"), sum(col(cntCol)).as("total_n"))
    val run = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = daily.join(stats, Seq(keyCol))
      .withColumn("dev", col(cntCol) * col("n_days") - col("total_n"))
      .withColumn("cusum", sum(col("dev")).over(run))
    val pick = Window.partitionBy(col(keyCol))
      .orderBy(abs(col("cusum")).desc, col(dateCol))
    cusum.withColumn("rk", row_number().over(pick))
      .filter(col("rk") === 1)
      .select(col(keyCol), col(dateCol).as("change_d"),
        abs(col("cusum")).cast("long").as("max_abs_cusum"),
        col("n_days").cast("long").as("n_days"),
        col("total_n").cast("long").as("total_n"))
  }

  /** Page–Hinkley drift ledger — the ONLINE complement to
    * [[cusumChangepoint]]: CUSUM locates the single most likely
    * change RETROSPECTIVELY (it needs the whole series' mean); the
    * Page–Hinkley statistic needs only the RUNNING mean, so the same
    * arithmetic can run in a stream with O(1) state per series
    * ([[graft.streaming.StreamOps.streamingPageHinkley]] — parity
    * spec-pinned against this ledger). Per day t:
    *
    *   dev_t = (t·x_t − cum_t)·10⁶ div t − δ      (x_t − mean_{≤t} − δ)
    *   U_t   = Σ_{i≤t} dev_i,  M_t = min_{i≤t} U_i,  W_t = max_{i≤t} U_i
    *   alarm_up_t   = U_t − M_t > λ   (level shifted UP since M's day)
    *   alarm_down_t = W_t − U_t > λ
    *
    * Exactness: t·x − cum is an exact long; the ·10⁶ product runs in
    * decimal(38) before ONE truncating division per day (the only
    * quantization), so U/M/W are exact longs (|x| ≤ 10⁹ cents on
    * decade grids keeps U under int64) and the oracle replays every
    * day. Shape: per-key running windows only (series-partitioned,
    * calendar-bounded) — no global sort, no aggregate pass.
    * @return per (key, day): (key, day, y_c, u_e6, alarm_up,
    *         alarm_down) */
  def pageHinkley(daily: DataFrame, keyCol: String, dateCol: String,
                  vCol: String, deltaE6: Long = 0L,
                  lambdaE6: Long = 50000000L): DataFrame = {
    val run = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seq = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    daily
      .select(col(keyCol), col(dateCol), col(vCol).cast("long").as("x"))
      .withColumn("t", row_number().over(seq).cast("long"))
      .withColumn("cum", sum(col("x")).over(run))
      .withColumn("dev", expr(
        s"CAST(CAST(t * x - cum AS DECIMAL(38,0)) * 1000000 div t" +
          s" AS BIGINT) - $deltaE6"))
      .withColumn("u_e6", sum(col("dev")).over(run))
      .withColumn("m", min(col("u_e6")).over(run))
      .withColumn("w", max(col("u_e6")).over(run))
      .select(col(keyCol), col(dateCol), col("x").as("y_c"), col("u_e6"),
        (col("u_e6") - col("m") > lambdaE6).cast("long").as("alarm_up"),
        (col("w") - col("u_e6") > lambdaE6).cast("long").as("alarm_down"))
  }

  /** Pairwise Pearson correlation across series: every unordered
    * series pair's correlation over their shared dates, from
    * closed-form sums in ONE keyed join + one keyed aggregate. The
    * date-keyed self-join generates |series|² rows per date —
    * bounded by series COUNT (the short dimension), never by corpus
    * size; for thousands of series, pre-select the pairs of
    * interest. Products go to double before combining (n·Σv² is the
    * first to overflow long — the [[linearTrend]] split); sqrt is
    * IEEE-correctly-rounded, so the single-expression result is
    * engine-identical. Pairs with zero variance on either side emit
    * null. Output: (key_a, key_b, n_days, corr_e6). */
  def pairwiseCorr(daily: DataFrame, keyCol: String, dateCol: String,
                   vCol: String): DataFrame = {
    val a = daily.select(col(dateCol).as("d"), col(keyCol).as("key_a"),
      col(vCol).as("va"))
    val b = daily.select(col(dateCol).as("d"), col(keyCol).as("key_b"),
      col(vCol).as("vb"))
    val g = a.join(b, Seq("d")).filter(col("key_a") < col("key_b"))
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("va")).as("sa"), sum(col("vb")).as("sb"),
        sum(col("va") * col("vb")).as("sab"),
        sum(col("va") * col("va")).as("saa"),
        sum(col("vb") * col("vb")).as("sbb"))
    val vaD = col("n").cast("double") * col("saa") -
      col("sa").cast("double") * col("sa")
    val vbD = col("n").cast("double") * col("sbb") -
      col("sb").cast("double") * col("sb")
    val covD = col("n").cast("double") * col("sab") -
      col("sa").cast("double") * col("sb")
    g.select(col("key_a"), col("key_b"), col("n").as("n_days"),
      when(vaD <= 0.0 || vbD <= 0.0, lit(null))
        .otherwise(round(covD * 1000000.0 / sqrt(vaD * vbD)))
        .cast("long").as("corr_e6"))
  }

  /** Per-series OLS linear trend from closed-form sums: slope,
    * intercept, and r² on the e6 grid, each derived in ONE double
    * expression from exact integer sums (the engine never iterates —
    * one keyed aggregate after a keyed min-window re-bases x to the
    * series start, keeping Σx bounded by series LENGTH, not epoch
    * magnitude). Slope/intercept denominators are exact longs (vx is
    * calendar-bounded: ≤ days³); the variance-of-y product is
    * computed in doubles (y is corpus-scaled and n·Σy² overflows
    * long first). Degenerate series (single day / zero x-variance)
    * emit null slope/intercept/r²; constant-y series emit r² null
    * (0/0). Output: (key, n_days, slope_e6 per day, intercept_e6 at
    * the series' first day, r2_e6). */
  def linearTrend(daily: DataFrame, keyCol: String, dateCol: String,
                  vCol: String): DataFrame = {
    val part = Window.partitionBy(col(keyCol))
    val g = daily
      .withColumn("di",
        datediff(col(dateCol), to_date(lit("1970-01-01"))).cast("long"))
      .withColumn("x", col("di") - min(col("di")).over(part))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col(vCol)).as("sy"),
        sum(col("x") * col(vCol)).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col(vCol) * col(vCol)).as("syy"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val cov = col("n") * col("sxy") - col("sx") * col("sy")
    val vyD = col("n").cast("double") * col("syy") -
      col("sy").cast("double") * col("sy")
    g.select(col(keyCol), col("n").as("n_days"),
      when(vx === 0, lit(null))
        .otherwise(round(cov * 1000000.0 / vx)).cast("long").as("slope_e6"),
      when(vx === 0, lit(null))
        .otherwise(round((col("sy") * col("sxx") - col("sx") * col("sxy"))
          * 1000000.0 / vx)).cast("long").as("intercept_e6"),
      when(vx === 0 || vyD === 0.0, lit(null))
        .otherwise(round(cov.cast("double") * cov * 1000000.0 /
          (vx.cast("double") * vyD))).cast("long").as("r2_e6"))
  }

  /** Truncated-EWMA smoothing (finite-impulse form): smooth_t =
    * (Σ_k w_k·x_{t−k}) div (Σ_k w_k) over the last `taps`
    * observations, w_k = round(1e6·alpha^k). The closed form keeps
    * every step integer-exact (the [[graft.ts.EventAnalytics
    * .decayedTrending]] per-term-quantize idiom): the float power
    * never crosses an aggregation boundary — weights are
    * driver-computed literals, embedded identically in the SQL
    * oracle. Early rows renormalize over the terms that exist (the
    * standard adjusted-EWMA start). Truncation error vs the infinite
    * EWMA is alpha^taps (≈ 1.7% of tail mass at 0.8^8).
    *
    * Lag semantics are OBSERVATION steps, not calendar steps — run
    * [[gapFill]] first when the series has holes. The lag window is
    * keyed by series; `taps` bounds the expression width (64 cap
    * keeps codegen happy). */
  def ewmaSmooth(daily: DataFrame, keyCol: String, dateCol: String,
                 vCol: String, alpha: Double = 0.8, taps: Int = 8): DataFrame = {
    require(taps >= 1 && taps <= 64, "taps in [1, 64]")
    require(alpha > 0 && alpha < 1, "alpha in (0, 1)")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol))
    val terms = ewmaWeights(alpha, taps).zipWithIndex.map { case (wk, k) =>
      val lagged = lag(col(vCol), k).over(w)
      (when(lagged.isNotNull, lit(wk) * lagged).otherwise(lit(0L)),
       when(lagged.isNotNull, lit(wk)).otherwise(lit(0L)))
    }
    daily
      .withColumn("num", terms.map(_._1).reduce(_ + _))
      .withColumn("den", terms.map(_._2).reduce(_ + _))
      .select(col(keyCol), col(dateCol), col(vCol),
              expr("num div den").as("smooth_c"))
  }

  /** The e6-grid EWMA tap weights — exposed so the oracle embeds the
    * IDENTICAL literals the Spark plan uses. */
  def ewmaWeights(alpha: Double, taps: Int): Seq[Long] =
    (0 until taps).map(k => math.round(1e6 * math.pow(alpha, k)))

  /** Trailing-`windowDays` rolling aggregates on a daily series — a
    * RANGE frame over the integer day index, so missing calendar
    * days genuinely shrink the window (ROWS frames silently stretch
    * across gaps). Output adds (roll_sum_c, roll_n, roll_avg) with
    * roll_avg derived once from the exact integers (the
    * [[graft.queries.meanFromCents]] discipline). Keyed window;
    * series count is the parallel axis. */
  def rollingDaily(daily: DataFrame, keyCol: String, dateCol: String,
                   vCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("di"))
      .rangeBetween(-(windowDays - 1).toLong, 0)
    daily
      .withColumn("di",
        datediff(col(dateCol), to_date(lit("1970-01-01"))).cast("long"))
      .withColumn("roll_sum_c", sum(col(vCol)).over(w))
      .withColumn("roll_n", count(lit(1)).over(w).cast("long"))
      .select(col(keyCol), col(dateCol), col(vCol),
        col("roll_sum_c"), col("roll_n"),
        round(col("roll_sum_c") / 100.0 / col("roll_n"), 6).as("roll_avg"))
  }

  /** Interval coalescing (gaps-and-islands on ranges): merge every
    * overlapping-or-touching [start, end] interval per key into its
    * maximal union interval. A new island starts where `start`
    * strictly exceeds the running max of all PREVIOUS ends (touching
    * intervals — start == previous end — therefore merge). Output:
    * (key, island_start, island_end, n_intervals).
    *
    * The island boundary rule is order-robust within equal starts
    * (an interval sharing its start with an overlapping predecessor
    * can never open an island), but the windows still order by the
    * (start, end, id) total order so the flag/cumsum replay is
    * engine-identical. Windows are keyed — per-key interval count is
    * the sequential dimension, key count the parallel axis. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String, idCol: String): DataFrame = {
    val order = Seq(col(startCol), col(endCol), col(idCol))
    val prevMax = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("prev_max_end", max(col(endCol)).over(prevMax))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
             col(startCol) > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("island_start"),
           max(col(endCol)).as("island_end"),
           count(lit(1)).as("n_intervals"))
      .drop("island")
  }

  /** EXACT sliding-window distinct count — distinct `userCol` values
    * per `keyCol` over the trailing `windowDays`-day window ending at
    * every calendar day of the series span. The naive form (window
    * self-join, COUNT(DISTINCT) per window-end) re-shuffles every
    * presence row `windowDays` times and keeps a distinct-set per
    * window; this decomposition is linear in presence rows:
    *
    *  1. presence  — distinct (key, user, day)          [one shuffle]
    *  2. islands   — per (key, user), merge the covering intervals
    *                 [day, day+w−1] with the gaps-and-islands window
    *                 (a user contributes to window-end d iff some
    *                 presence day lies in [d−w+1, d], i.e. iff d is
    *                 inside one of their merged islands)
    *  3. deltas    — +1 at island start, −1 at island end + 1,
    *                 summed per (key, day)              [tiny table]
    *  4. cum-sum   — over the per-key calendar grid (sequence(), no
    *                 driver loop), keyed window ordered by day
    *
    * Every window is keyed — per (key, user) in step 2 (user-history
    * sized), per key in step 4 (calendar-bounded) — so no global sort
    * and no per-window distinct state at any scale. The count is
    * EXACT (vs the mergeable-sketch estimate of `hllRolling`), and
    * the decomposition is result-invisible: the oracle computes the
    * naive range-join COUNT(DISTINCT) and the driver hash-compares.
    *
    * Output: (key, day, uniq) for every day in the per-key
    * [min(day), max(day)] span (0 on days whose whole trailing window
    * is empty). */
  def slidingDistinct(presence: DataFrame, keyCol: String, dateCol: String,
                      userCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays >= 1")
    val pad = (windowDays - 1).toLong
    val p = presence
      .select(col(keyCol).as("k"), col(dateCol).as("d"), col(userCol).as("u"))
      .distinct()
      .withColumn("di", datediff(col("d"), to_date(lit("1970-01-01"))).cast("long"))
    val prev = Window.partitionBy(col("k"), col("u")).orderBy(col("di"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(col("k"), col("u")).orderBy(col("di"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = p
      .withColumn("prev_max_end", max(col("di") + pad).over(prev))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
             col("di") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
      .groupBy(col("k"), col("u"), col("island"))
      .agg(min(col("di")).as("s"), (max(col("di")) + pad).as("e"))
    val deltas = islands
      .select(col("k"), col("s").as("di"), lit(1L).as("delta"))
      .unionAll(islands.select(col("k"), (col("e") + 1L).as("di"),
                               lit(-1L).as("delta")))
      .groupBy(col("k"), col("di")).agg(sum(col("delta")).as("delta"))
    val grid = p.groupBy(col("k"))
      .agg(min(col("di")).as("d0"), max(col("di")).as("d1"))
      .select(col("k"), explode(sequence(col("d0"), col("d1"))).as("di"))
    val cum = Window.partitionBy(col("k")).orderBy(col("di"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(deltas, Seq("k", "di"), "left")
      .withColumn("uniq", sum(coalesce(col("delta"), lit(0L))).over(cum))
      .select(col("k").as(keyCol),
        date_add(to_date(lit("1970-01-01")), col("di").cast("int")).as(dateCol),
        col("uniq").as(s"uniq_${windowDays}d"))
  }

  /** Robust seasonal-profile outliers: for each seasonal cell
    * (series key × ISO weekday × hour), the EXACT lower median and
    * MAD of the exact-integer value, and the count of observations
    * beyond `k`·MAD of the median. With MAD = 0 (over half the cell
    * identical) any deviation flags — deliberate: on a constant
    * profile every departure IS anomalous, and the rule stays
    * integer-exact. Output: (key, isodow, hour, n, med_c, mad_c,
    * n_outliers).
    *
    * Medians are exact lower medians (element (n+1) div 2 in the
    * (value, id) total order) — not `percentile_approx` — computed
    * with a per-cell rank window + filter + join; two passes (value
    * median, then deviation median). Cells are the parallel axis
    * (|keys|·7·24 partitions), so no global sort at any size. */
  def seasonalOutliers(events: DataFrame, keyCol: String, tsCol: String,
                       vCol: String, idCol: String, k: Int = 5): DataFrame = {
    val cells = events.select(col(keyCol).as("key"),
      (weekday(col(tsCol)) + 1).cast("long").as("isodow"),
      hour(col(tsCol)).cast("long").as("hour"),
      col(vCol).as("v"), col(idCol).as("eid"))
    def lowerMedian(df: DataFrame, valName: String, outName: String): DataFrame = {
      val part = Window.partitionBy(col("key"), col("isodow"), col("hour"))
      val w = part.orderBy(col(valName), col("eid"))
      df.withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(part))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("key"), col("isodow"), col("hour"),
                col(valName).as(outName))
    }
    val med = lowerMedian(cells, "v", "med_c")
    val withMed = cells.join(med, Seq("key", "isodow", "hour"))
      .withColumn("dev", abs(col("v") - col("med_c")))
    val mad = lowerMedian(withMed, "dev", "mad_c")
    withMed.join(mad, Seq("key", "isodow", "hour"))
      .groupBy(col("key"), col("isodow"), col("hour"))
      .agg(count(lit(1)).as("n"),
        max(col("med_c")).as("med_c"),
        max(col("mad_c")).as("mad_c"),
        sum(when(col("dev") > lit(k) * col("mad_c"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumnRenamed("key", keyCol)
  }

  /** ROLLING-ORIGIN BACKTEST of the seasonal-naive forecaster — the
    * evaluation harness every production forecast deployment runs
    * BEFORE trusting a model: slide the forecast origin backwards
    * through history, forecast `horizons` days ahead from each
    * origin with the season-lag baseline ŷ(o+h) = y(o+h−season), and
    * score per horizon. Seasonal-naive is the canonical yardstick
    * (a model that can't beat it shouldn't ship — the M-competitions'
    * standing rule), and because it is a pure lag it is exactly
    * SQL-replayable where the structural fitter is not — this is the
    * oracle-checkable half of the forecast-evaluation story (the
    * fitter's own backtests live in the golden specs).
    *
    * Per (key, horizon): n_pairs (origins where both the target and
    * the lagged base exist in the series), mae_c = round'd mean
    * absolute error in cents, and smape = round(mean of
    * 2|e|/(|y|+|ŷ|), 6) with the 0/0 term defined as 0 (both sides
    * zero = perfect). All inputs ride the exact cents grid, so the
    * doubles are IEEE-identical across engines.
    *
    * Scale shape: the origin×horizon grid is generated PER KEY in
    * projection (`sequence` + explode — `nOrigins`·H rows per key,
    * hyperparameter-sized), then two keyed joins against the daily
    * series on (key, date) and one keyed aggregate. No window at
    * all, nothing global; series count is the parallel axis.
    *
    * @param horizons forecast lead times to score, each ≤ `season`
    *                 (longer leads need the recursive seasonal chain,
    *                 whose error compounding belongs to the model
    *                 tier, not the yardstick) */
  def seasonalNaiveBacktest(daily: DataFrame, keyCol: String,
                            dateCol: String, vCol: String,
                            season: Int = 7, nOrigins: Int = 8,
                            horizons: Seq[Int] = 1 to 7): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    require(nOrigins >= 1 && nOrigins <= 1024,
            s"nOrigins in [1, 1024], got $nOrigins")
    require(horizons.nonEmpty && horizons.forall(h => h >= 1 && h <= season),
            s"horizons must be in [1, season], got $horizons")
    backtestResiduals(daily, keyCol, dateCol, vCol, season, nOrigins, horizons)
      .withColumn("t", when(abs(col("y_c")) + abs(col("p_c")) === 0, lit(0.0))
        .otherwise(lit(2.0) * col("e") / (abs(col("y_c")) + abs(col("p_c")))))
      .groupBy(col("key"), col("h"))
      .agg(count(lit(1)).as("n_pairs"),
           round(avg(col("e"))).cast("long").as("mae_c"),
           round(avg(col("t")), 6).as("smape"))
      .withColumnRenamed("key", keyCol)
  }

  /** The rolling-origin residual grid shared by
    * [[seasonalNaiveBacktest]] and [[conformalWidth]]: per (key,
    * origin, horizon), the seasonal-naive prediction p_c aligned with
    * the realized y_c and the absolute residual e — two keyed
    * alignment joins over a projection-built origin grid. */
  private def backtestResiduals(daily: DataFrame, keyCol: String,
                                dateCol: String, vCol: String, season: Int,
                                nOrigins: Int, horizons: Seq[Int]): DataFrame = {
    require(season >= 1, s"season must be >= 1, got $season")
    require(nOrigins >= 1 && nOrigins <= 1024,
            s"nOrigins in [1, 1024], got $nOrigins")
    require(horizons.nonEmpty && horizons.forall(h => h >= 1 && h <= season),
            s"horizons must be in [1, season], got $horizons")
    val hMax = horizons.max
    val d = daily.select(col(keyCol).as("key"), col(dateCol).as("d"),
                         col(vCol).as("v"))
    // newest origin leaves every (origin + h) target inside history
    val origins = d.groupBy(col("key")).agg(max(col("d")).as("dmax"))
      .select(col("key"), col("dmax"),
        explode(sequence(lit(0), lit(nOrigins - 1))).as("j"))
      .select(col("key"), date_add(col("dmax"), -lit(hMax) - col("j")).as("o"))
    val grid = origins
      .select(col("key"), col("o"),
        explode(typedLit(horizons.map(_.toLong))).as("h"))
      .select(col("key"), col("h"),
        date_add(col("o"), col("h").cast("int")).as("target_d"),
        date_add(col("o"), (col("h") - season).cast("int")).as("base_d"))
    grid
      .join(d.select(col("key"), col("d").as("target_d"), col("v").as("y_c")),
            Seq("key", "target_d"))
      .join(d.select(col("key"), col("d").as("base_d"), col("v").as("p_c")),
            Seq("key", "base_d"))
      .withColumn("e", abs(col("y_c") - col("p_c")))
  }

  /** Theil–Sen robust trend per series: the LOWER MEDIAN of all
    * pairwise slopes (y_j − y_i)/(x_j − x_i), i < j — the slope
    * estimator with a 29% breakdown point that shrugs off the
    * outliers that drag OLS (the robust twin of
    * [[linearTrend]]/q205). Slopes land on the e6 micro grid (one
    * deterministic double division + round per pair), and the median
    * rides the value-grid cover rule (2·cum ≥ n on exact longs), so
    * an oracle replays pair generation, slope rounding, and the
    * median bit-for-bit.
    *
    * Scale shape: the pair join is keyed per series and |series|²/2
    * bounded — the per-key history cap is the caller's contract
    * (daily grains: 365 points → 66k pairs per key, map-side only).
    * The median window sees the per-key DISTINCT-slope grid.
    *
    * @param df (key, x, y) rows, x strictly increasing within a key
    *           (duplicate x would divide by zero — pre-aggregate)
    * @return (key, n_points, n_pairs, slope_e6) */
  def theilSen(df: DataFrame, keyCol: String, xCol: String,
               yCol: String): DataFrame = {
    val d = df.select(col(keyCol).as("key"), col(xCol).cast("long").as("x"),
                      col(yCol).cast("long").as("y"))
    val pairs = d.as("a").join(d.as("b"),
        col("a.key") === col("b.key") && col("a.x") < col("b.x"))
      .select(col("a.key").as("key"),
        round((col("b.y") - col("a.y")).cast("double")
          / (col("b.x") - col("a.x")) * 1000000.0).cast("long").as("s"))
    val g = pairs.groupBy(col("key"), col("s")).agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("key")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("key"))
    val nPts = d.groupBy(col("key")).agg(count(lit(1)).as("n_points"))
    g.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_pairs", sum(col("c")).over(wAll))
      .filter(col("cum") * 2L >= col("n_pairs") &&
              (col("cum") - col("c")) * 2L < col("n_pairs"))
      .join(nPts, Seq("key"))
      .select(col("key").as(keyCol), col("n_points"), col("n_pairs"),
              col("s").as("slope_e6"))
  }

  /** Robust line-fit outliers: fit the [[theilSen]] line with a
    * MEDIAN intercept, then flag points whose residual exceeds
    * 3×MAD — the fully robust "which days broke trend" detector
    * (both the line and the spread estimate shrug off the outliers
    * being hunted; OLS+σ is dragged by them). Exact integers end to
    * end: x is rebased to days-since-series-start (bounds
    * slope_e6·x), residuals live on the e6 grid, the intercept is
    * the lower median of y·1e6 − slope_e6·x (which centers the
    * median residual at ≤ 0 by construction), and MAD is the lower
    * median of |residual| — both medians ride the 2·cum ≥ n grid
    * cover rule per key. Degenerate spread (MAD = 0, e.g. a perfect
    * line) flags any nonzero residual.
    *
    * @return (key, x, y, res_e6, mad_e6, is_outlier) */
  def robustLineOutliers(df: DataFrame, keyCol: String, xCol: String,
                         yCol: String): DataFrame = {
    val d0 = df.select(col(keyCol).as("key"), col(xCol).cast("long").as("x0"),
                       col(yCol).cast("long").as("y"))
    val base = d0.groupBy(col("key")).agg(min(col("x0")).as("xmin"))
    val d = d0.join(base, Seq("key"))
      .select(col("key"), (col("x0") - col("xmin")).as("x"), col("y"),
              col("x0"))
    val slope = theilSen(d, "key", "x", "y")
      .select(col("key"), col("slope_e6"))
    val res0 = d.join(slope, Seq("key"))
      .withColumn("r0", col("y") * 1000000L - col("slope_e6") * col("x"))
    def lowerMedian(in: DataFrame, vCol: String, out: String): DataFrame = {
      val g = in.groupBy(col("key"), col(vCol)).agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy(col("key")).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("key"))
      g.withColumn("cum", sum(col("c")).over(wCum))
        .withColumn("n", sum(col("c")).over(wAll))
        .filter(col("cum") * 2L >= col("n") &&
                (col("cum") - col("c")) * 2L < col("n"))
        .select(col("key"), col(vCol).as(out))
    }
    val withIc = res0.join(lowerMedian(res0, "r0", "intercept_e6"), Seq("key"))
      .withColumn("res_e6", col("r0") - col("intercept_e6"))
      .withColumn("ares", abs(col("res_e6")))
    withIc.join(lowerMedian(withIc, "ares", "mad_e6"), Seq("key"))
      .select(col("key").as(keyCol), col("x0").as(xCol), col("y").as(yCol),
        col("res_e6"), col("mad_e6"),
        when(abs(col("res_e6")) > lit(3L) * col("mad_e6"), 1L)
          .otherwise(0L).as("is_outlier"))
  }

  /** Split-conformal interval calibration on the rolling-origin
    * residuals: per (key, horizon), the width that covers covPct% of
    * future absolute errors under exchangeability — the k-th smallest
    * |residual| with k = ⌈(n+1)·covPct/100⌉ clamped to n (the
    * standard finite-sample-valid conformal rank; Vovk et al., and
    * the calibration layer every point forecaster needs before
    * shipping intervals). Rank selection rides the value-grid cover
    * rule (the exactPercentiles discipline): one keyed residual-grid
    * aggregate + one grid-sized keyed window — residual ROWS are
    * never sorted.
    *
    * @return (key, h, n_pairs, k, width_c) */
  def conformalWidth(daily: DataFrame, keyCol: String, dateCol: String,
                     vCol: String, season: Int = 7, nOrigins: Int = 8,
                     horizons: Seq[Int] = 1 to 7, covPct: Int = 90): DataFrame = {
    require(covPct >= 1 && covPct <= 99, s"covPct in [1, 99], got $covPct")
    val res = backtestResiduals(daily, keyCol, dateCol, vCol, season,
                                nOrigins, horizons)
    val g = res.groupBy(col("key"), col("h"), col("e"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("key"), col("h")).orderBy(col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("key"), col("h"))
    g.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("n_pairs", sum(col("c")).over(wAll))
      .withColumn("k",
        least(expr("((n_pairs + 1) * " + covPct + " + 99) div 100"),
              col("n_pairs")))
      .filter(col("cum") - col("c") < col("k") && col("k") <= col("cum"))
      .select(col("key").as(keyCol), col("h"), col("n_pairs"), col("k"),
              col("e").as("width_c"))
  }
}
