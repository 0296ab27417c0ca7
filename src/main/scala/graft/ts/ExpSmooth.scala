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
}
