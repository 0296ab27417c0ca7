package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Clamped running balance — the inventory/credit-ledger recurrence
  * `bal' = max(0, bal + delta)` that a plain window SUM cannot
  * express (the clamp makes every step depend on the clamped previous
  * step, not on the prefix sum: once a stockout floors the balance at
  * zero, later arrivals rebuild from zero, not from the fictitious
  * negative). The operational twin of [[ExpSmooth]]'s recursive
  * state, same machinery: per-key fold over the bounded time grid,
  * exact long arithmetic, recursive-CTE oracle.
  *
  * Emits the clamp as data: stockout_c is the shortfall swallowed by
  * the clamp at each step (demand that went unserved — the number the
  * replenishment planner actually wants). */
object Inventory {

  /** @param deltas one row per (key, date) NET movement (positive =
    *               arrival, negative = demand), integer units
    * @return one row per (key, date): (key, date, delta_c, balance_c,
    *         stockout_c) with balance_c = max(0, prev + delta) and
    *         stockout_c = max(0, −(prev + delta)). */
  def clampedBalance(deltas: DataFrame, keyCol: String, dateCol: String,
                     deltaCol: String): DataFrame = {
    val packed = deltas
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(deltaCol).cast("long").as("x"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("d"), col("x")))).as("s"))
    val fold = """
      |aggregate(
      |  s,
      |  named_struct(
      |    'bal', CAST(0 AS BIGINT),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<d: DATE, x: BIGINT, bal: BIGINT, short: BIGINT>>)),
      |  (acc, e) -> named_struct(
      |    'bal', greatest(CAST(0 AS BIGINT), acc.bal + e.x),
      |    'out', array_append(acc.out, named_struct(
      |      'd', e.d, 'x', e.x,
      |      'bal', greatest(CAST(0 AS BIGINT), acc.bal + e.x),
      |      'short', greatest(CAST(0 AS BIGINT), -(acc.bal + e.x))))),
      |  acc -> acc.out)""".stripMargin
    packed
      .select(col("k"), explode(expr(fold)).as("r"))
      .select(col("k").as(keyCol), col("r.d").as(dateCol),
              col("r.x").as("delta_c"), col("r.bal").as("balance_c"),
              col("r.short").as("stockout_c"))
  }
}
