package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (STL-lite) on the
  * integer grid — y = trend + weekly seasonal + residual, the
  * anomaly-triage readout ([[graft.queries]] q191's seasonal-outlier
  * machinery generalized to a full three-component split).
  *
  * Exactness discipline: the centered 7-day moving average would be a
  * float per row, so the DETRENDED series is kept exact instead —
  * detr_c7 = 7·y − Σ₇y (integer cents ×7). Per weekday the seasonal
  * index is ONE double expression over exact longs (Σ detr_c7 / n / 7)
  * e6-rounded BEFORE the 7-value normalization (which is then pure
  * integer arithmetic on the e6 grid). trend_e6 is a per-row single
  * expression over the exact window sum. No float ever crosses an
  * aggregation boundary.
  *
  * Scale shape: one keyed ROWS window (±3 per series), one
  * weekday-grid aggregate (7 rows per series), one broadcast-back
  * join. Edge days (incomplete window) emit null trend/residual —
  * honest nulls, not padded estimates. */
object Decompose {

  /** @return one row per (key, date): (key, date, y_c, trend_e6,
    *         seasonal_e6, resid_e6) — trend/resid null on the first
    *         and last 3 days of each series. */
  def stlWeekly(daily: DataFrame, keyCol: String, dateCol: String,
                vCol: String): DataFrame = {
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
      .rowsBetween(-3, 3)
    val base = daily.select(col(keyCol).as("k"), col(dateCol).as("d"),
                            col(vCol).cast("long").as("y"))
      .withColumn("s7", sum(col("y")).over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .withColumn("detr_c7",
        when(col("n7") === 7, lit(7L) * col("y") - col("s7")))
      .withColumn("dow", dayofweek(col("d")).cast("long"))
    val seas = base.filter(col("detr_c7").isNotNull)
      .groupBy(col("k"), col("dow"))
      .agg(sum(col("detr_c7")).as("sd"), count(lit(1)).as("nd"))
      .withColumn("s_e6",
        round(col("sd").cast("double") / col("nd") / 7.0 * 1000000.0)
          .cast("long"))
    val norm = seas.groupBy(col("k"))
      .agg(sum(col("s_e6")).as("s_sum"), count(lit(1)).as("s_n"))
    val seasAdj = seas.join(norm, Seq("k"))
      .select(col("k"), col("dow"),
              (col("s_e6") - expr("s_sum div s_n")).as("seasonal_e6"))
    base.join(seasAdj, Seq("k", "dow"), "left")
      .select(col("k").as(keyCol), col("d").as(dateCol), col("y").as("y_c"),
        when(col("n7") === 7,
          round(col("s7").cast("double") / 7.0 * 1000000.0).cast("long"))
          .as("trend_e6"),
        col("seasonal_e6"),
        when(col("n7") === 7,
          col("y") * 1000000L -
            round(col("s7").cast("double") / 7.0 * 1000000.0).cast("long") -
            col("seasonal_e6")).as("resid_e6"))
  }

  /** Trend / seasonality STRENGTH indices over an [[stlWeekly]]
    * decomposition — the tsfeatures/M4 forecastability diagnostics:
    * F_T = max(0, 1 − Var(R)/Var(T+R)), F_S = max(0, 1 −
    * Var(R)/Var(S+R)) ∈ [0, 1] per series ("is there anything here
    * for a model to learn?"). Moment sums are exact DECIMAL(38)
    * (e6-component squares exceed int64; DuckDB's HUGEINT promotion
    * is the same exact arithmetic), the variance ratios single
    * rounded doubles; a degenerate Var(T+R)/Var(S+R) yields null. */
  def strengths(stl: DataFrame, keyCol: String): DataFrame = {
    val rows = stl.select(col(keyCol).as("k"),
        col("trend_e6").as("t"), col("seasonal_e6").as("s"),
        col("resid_e6").as("r"))
      .filter(col("t").isNotNull && col("s").isNotNull &&
              col("r").isNotNull)
      .withColumn("tr", col("t") + col("r"))
      .withColumn("sr", col("s") + col("r"))
    def dc(c: String) = col(c).cast("decimal(38,0)")
    val a = rows.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(dc("r")).as("r1"), sum(dc("r") * dc("r")).as("r2"),
      sum(dc("tr")).as("t1"), sum(dc("tr") * dc("tr")).as("t2"),
      sum(dc("sr")).as("s1"), sum(dc("sr") * dc("sr")).as("s2"))
    def vr(q: String, s1: String) =
      (col(q).cast("double") -
       col(s1).cast("double") * col(s1).cast("double") / col("n")) / col("n")
    a.select(col("k").as(keyCol), col("n"),
      when(vr("t2", "t1") <= 0.0, lit(null))
        .otherwise(round(greatest(lit(0.0),
          lit(1.0) - vr("r2", "r1") / vr("t2", "t1")), 6))
        .as("trend_strength"),
      when(vr("s2", "s1") <= 0.0, lit(null))
        .otherwise(round(greatest(lit(0.0),
          lit(1.0) - vr("r2", "r1") / vr("s2", "s1")), 6))
        .as("seasonal_strength"))
  }
}
