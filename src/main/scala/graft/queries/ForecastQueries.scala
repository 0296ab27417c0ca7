package graft.queries

import graft.QueryDef
import graft.api.{AnalyzePipeline, CorrelationSpec}
import graft.forecast.{Forecaster, StructuralTS}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Forecast operators C3-C8 over the driver tables. Not SQL-expressible
  * (no DuckDB Prophet) → registered without oracles; the driver records
  * rows-only checks, and ForecasterSpec property-tests cover semantics.
  * Outputs are fully deterministic (seeded uncertainty sampling). */
object ForecastQueries {

  // series comes from the DATA column (not a literal): a lit() key would
  // be constant-folded out of window PARTITION BY clauses downstream,
  // collapsing them to single-partition global windows
  private def purchasesDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").filter(col("event_type") === "purchase")
      .groupBy(col("event_type").as("series"),
               dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg((sum(cents(col("value"))) / 100.0).as("y"))
      .select(col("series"), col("ds"), col("y"))

  /** q40 — C3 univariate forecast, 14 days ahead, 13-column frame. */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val hist = purchasesDaily(s, dir)
    val fut = Forecaster.futureGrid(hist, "D", 14)
    Forecaster.forecast(hist, fut,
        StructuralTS.FitSpec(uncertaintySamples = 200))
      .select(col("series"), col("ds"), col("segment"),
              round(col("yhat"), 6).as("yhat"),
              round(col("yhat_lower"), 6).as("yhat_lower"),
              round(col("yhat_upper"), 6).as("yhat_upper"),
              round(col("trend"), 6).as("trend"),
              round(col("additive_terms"), 6).as("additive_terms"))
  }

  /** q41 — the full §3.1 analyze pipeline: error-rate covariate →
    * purchase-revenue target, Prophet-with-regressor, diagnostics. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val docs = Map(
      "errors" -> events.filter(col("event_type") === "error")
        .select(col("ts").as("date"), lit(1.0).as("n_errors")),
      "purchases" -> events.filter(col("event_type") === "purchase")
        .select(col("ts").as("date"), col("value")))
    val specs = Seq(CorrelationSpec(
      id = "x1", fromData = "errors", fromIndex = "n_errors",
      toData = "purchases", toIndex = "value",
      grain = Some("D"), aggregation = "sum", unitsToForecast = Some(14),
      uncertaintySamples = 200))
    AnalyzePipeline.analyze(docs, specs).targetForecasts
      .select(col("series"), col("ds"), col("segment"),
              round(col("yhat"), 6).as("yhat"),
              round(col("trend"), 6).as("trend"),
              round(col("additive_terms"), 6).as("additive_terms"))
  }

  /** q42 — C5 logistic (saturating) growth on the cumulative purchase
    * total; floor/cap resolved by the A3/A4 defaults. */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    // the cumsum runs AFTER daily aggregation (~10² rows per series) and
    // partitions by the data-derived series key, so each series sorts
    // independently — no single-partition global window
    val w = Window.partitionBy(col("series")).orderBy(col("ds"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val daily = purchasesDaily(s, dir)
    val cum = daily.withColumn("y", sum(col("y")).over(w))
    val mx = cum.agg(max("y")).head().getDouble(0)
    val hist = cum.select(col("series"), col("ds"), col("y"))
    val fut = Forecaster.futureGrid(hist, "D", 30)
    Forecaster.forecast(hist, fut,
        StructuralTS.FitSpec(growth = "logistic", floor = 0.0, cap = mx * 1.5,
                             uncertaintySamples = 200))
      .select(col("series"), col("ds"), col("segment"),
              round(col("yhat"), 6).as("yhat"),
              round(col("yhat_lower"), 6).as("yhat_lower"),
              round(col("yhat_upper"), 6).as("yhat_upper"))
  }

  /** q43 — C7 regressor coefficients from the q41 pipeline. */
  private def q43(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val errors = events.filter(col("event_type") === "error")
      .groupBy(dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg(count(lit(1)).cast("double").as("x"))
    val target = events.filter(col("event_type") === "purchase")
      .groupBy(dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg((sum(cents(col("value"))) / 100.0).as("y"))
    val hist = target.join(errors, Seq("ds"), "left").na.fill(0.0, Seq("x"))
      .select(lit("x1").as("series"), col("ds"), col("y"), col("x"))
    Forecaster.regressorCoefficients(hist, StructuralTS.FitSpec())
      .select(col("series"), col("regressor_mode"),
              round(col("center"), 6).as("center"),
              round(col("coef"), 6).as("coef"))
  }

  /** q44 — C9 Granger causality (error count → purchase revenue), per-
    * lag ssr F-tests. Not DuckDB-expressible (F CDF) → rows-only. */
  private def q44(s: SparkSession, dir: String): DataFrame = {
    val events = t(s, dir, "events")
    val errors = events.filter(col("event_type") === "error")
      .groupBy(dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg(count(lit(1)).cast("double").as("x"))
    val target = events.filter(col("event_type") === "purchase")
      .groupBy(dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg((sum(cents(col("value"))) / 100.0).as("y"))
    val hist = target.join(errors, Seq("ds"), "left").na.fill(0.0, Seq("x"))
      .select(lit("x1").as("series"), col("ds"), col("y"), col("x"))
    graft.stats.Granger.causality(hist, 5)
      .select(col("series"), col("lag").cast("long").as("lag"),
              round(col("f_stat"), 6).as("f_stat"),
              round(col("p_value"), 6).as("p_value"),
              col("df_num").cast("long").as("df_num"),
              col("df_denom").cast("long").as("df_denom"),
              round(col("ssr_chi2"), 6).as("ssr_chi2"),
              round(col("p_chi2"), 6).as("p_chi2"),
              round(col("lr_stat"), 6).as("lr_stat"),
              round(col("p_lr"), 6).as("p_lr"),
              round(col("params_f"), 6).as("params_f"),
              round(col("p_params_f"), 6).as("p_params_f"))
  }

  /** q45 — C10 quantile forecast: per-row prediction quantiles from the
    * seeded predictive samples (notebook `np.quantile` capability). */
  private def q45(s: SparkSession, dir: String): DataFrame = {
    val hist = purchasesDaily(s, dir)
    val fut = Forecaster.futureGrid(hist, "D", 14)
    val qs = Seq(0.05, 0.25, 0.5, 0.75, 0.95)
    Forecaster.forecast(hist, fut,
        StructuralTS.FitSpec(uncertaintySamples = 200, quantiles = qs))
      .select(col("series"), col("ds"), col("segment"),
              round(col("yhat"), 6).as("yhat"),
              round(element_at(col("quantile_values"), 1), 6).as("q05"),
              round(element_at(col("quantile_values"), 3), 6).as("q50"),
              round(element_at(col("quantile_values"), 5), 6).as("q95"))
  }

  /** q68 — C6 `make_future_dataframe` alone, oracle-checked: per
    * event-type series, 7 daily periods after max(ds), generated
    * distributively (sequence + timestampadd — no driver loop). */
  private def q68(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "events")
      .groupBy(col("event_type").as("series"),
               dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg(count(lit(1)).as("n"))
    Forecaster.futureGrid(hist, "D", 7)
  }

  private val q68Sql =
    """WITH h AS (
      |  SELECT event_type AS series,
      |         max(CAST(CAST(date_trunc('day', ts) AS DATE) AS TIMESTAMP)) AS mx
      |  FROM events GROUP BY 1)
      |SELECT series, mx + s * INTERVAL 1 DAY AS ds
      |FROM h CROSS JOIN range(1, 8) t(s)""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q40_forecast_linear", q40, None),
    QueryDef("q41_analyze_pipeline", q41, None),
    QueryDef("q42_forecast_logistic", q42, None),
    QueryDef("q43_regressor_coef", q43, None),
    QueryDef("q44_granger_causality", q44, None),
    QueryDef("q45_quantile_forecast", q45, None),
    QueryDef("q46_forecast_multiseries", q46, None),
    QueryDef("q68_future_grid", q68, Some(q68Sql))
  )

  /** q46 — series-parallel forecasting: all five event-type daily series
    * fitted in ONE flatMapGroups pass (the reference fits one Prophet at
    * a time in a serial loop; here series count is just row count). */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "events")
      .groupBy(col("event_type").as("series"), dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg((sum(cents(col("value"))) / 100.0).as("y"))
    val fut = Forecaster.futureGrid(hist, "D", 14)
    Forecaster.forecast(hist, fut, StructuralTS.FitSpec(uncertaintySamples = 200))
      .select(col("series"), col("ds"), col("segment"),
              round(col("yhat"), 6).as("yhat"),
              round(col("yhat_lower"), 6).as("yhat_lower"),
              round(col("yhat_upper"), 6).as("yhat_upper"))
  }
}
