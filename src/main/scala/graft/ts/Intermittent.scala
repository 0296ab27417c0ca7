package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Croston's method for INTERMITTENT demand — the forecasting rung
  * standard smoothers get wrong: when most periods have zero demand
  * (spare parts, long-tail SKUs), SES over the raw series decays
  * toward zero between demands and spikes on each one. Croston
  * smooths two series over the DEMAND EVENTS only — demand size `z`
  * and inter-demand interval `p` — and forecasts the per-period rate
  * z/p (Croston 1972; the standard intermittent-demand baseline).
  *
  * Recurrence (α = aN/aD, both states; event j has size y_j and gap
  * g_j periods since the previous event, g_1 = 1 by convention):
  *   init:  z = y_1, p = g_1
  *   j ≥ 2: z' = (aN·y_j + (aD − aN)·z) div aD
  *          p' = (aN·g_j + (aD − aN)·p) div aD
  *   rate_e6 = (z' · 1e6) div p'   (exact longs end to end)
  *
  * Scale shape: zeros never materialize — the working set is the
  * demand-EVENT rows (the sparsity that motivates the method bounds
  * the state), gaps come from a KEYED lag window, and the recursion
  * folds one bounded array row per series exactly like
  * [[ExpSmooth.doubleExpSmooth]]; parallel across series. */
object Intermittent {

  /** @param events rows with (key, date, demand); zero/negative
    *               demand rows are ignored (non-events)
    * @return one row per demand event: (key, date, y, gap, size_s,
    *         interval_s, rate_e6) where rate_e6 is the post-update
    *         per-period demand forecast ×1e6 */
  def croston(events: DataFrame, keyCol: String, dateCol: String,
              vCol: String, aNum: Int = 2, aDen: Int = 10): DataFrame = {
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    val wk = Window.partitionBy(col("k")).orderBy(col("d"))
    val ev = events
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .filter(col("y") > 0L)
      .withColumn("g",
        coalesce(datediff(col("d"), lag(col("d"), 1).over(wk))
          .cast("long"), lit(1L)))
    val packed = ev
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("y"), col("g"))))
        .as("s"))
    val zp = s"($aNum * x.y + ${aDen - aNum} * acc.z) div $aDen"
    val pp = s"($aNum * x.g + ${aDen - aNum} * acc.p) div $aDen"
    val fold = s"""
      |aggregate(
      |  s,
      |  named_struct(
      |    'fst', 1, 'z', CAST(0 AS BIGINT), 'p', CAST(0 AS BIGINT),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<d: DATE, y: BIGINT, g: BIGINT, z: BIGINT,
      |                   p: BIGINT, rate: BIGINT>>)),
      |  (acc, x) -> CASE WHEN acc.fst = 1 THEN
      |      named_struct('fst', 0, 'z', x.y, 'p', x.g,
      |        'out', array(named_struct('d', x.d, 'y', x.y, 'g', x.g,
      |          'z', x.y, 'p', x.g,
      |          'rate', (x.y * 1000000) div x.g)))
      |    ELSE
      |      named_struct('fst', 0, 'z', $zp, 'p', $pp,
      |        'out', array_append(acc.out, named_struct(
      |          'd', x.d, 'y', x.y, 'g', x.g, 'z', $zp, 'p', $pp,
      |          'rate', (($zp) * 1000000) div ($pp))))
      |    END,
      |  acc -> acc.out)""".stripMargin
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.y").as("y_q"), col("r.g").as("gap_d"),
              col("r.z").as("size_s"), col("r.p").as("interval_s"),
              col("r.rate").as("rate_e6"))
  }
}
