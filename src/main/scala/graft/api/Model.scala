package graft.api

import graft.forecast.StructuralTS.FitSpec

/** Request model (SURVEY §1, FIXTURES.md §1).
  *
  * Mirrors the reference's pydantic `Correlation` (`app.py:31-58`) and
  * `ForecastingOptions` (`app.py:253-272`) with the §2.9 fidelity fixes:
  * grain "min"/"m" both accepted, "meadian" mapped to median, and the
  * first-correlation-only bug NOT reproduced (all correlations run).
  */
/** One side's saturating-growth options (`ForecastingOption`,
  * `app.py:263-267`): the §3.2 endpoint fits the covariate with the
  * `fromIndex` block and the target with the `toIndex` block. */
case class SideOptions(
    growth: String = "logistic",            // pydantic default (app.py:266)
    changepointPriorScale: Double = 0.5,    // app.py:265
    uncertaintySamples: Int = 1000,
    floor: Double = 0.0,
    ceiling: Option[Double] = None) {
  require(growth == "linear" || growth == "logistic",
          s"unsupported growth: $growth (expected linear|logistic)")

  def fitSpec(resolvedFloor: Double, resolvedCap: Double): FitSpec =
    FitSpec(growth = growth,
            changepointPriorScale = changepointPriorScale,
            uncertaintySamples = uncertaintySamples,
            floor = resolvedFloor, cap = resolvedCap)
}

case class CorrelationSpec(
    id: String,
    fromData: String,                    // covariate document name
    fromIndex: String,                   // dotted path into the record
    toData: String,                      // target document name
    toIndex: String,
    grain: Option[String] = None,        // "D"|"W"|"M"|"H"|"min"/"m"
    aggregation: String = "sum",
    unitsToForecast: Option[Int] = None, // default = series length (A5)
    changePointPriorScale: Double = 0.8, // app.py:38 default
    growth: String = "linear",
    floor: Double = 0.0,
    ceiling: Option[Double] = None,
    uncertaintySamples: Int = 1000,
    covOptions: Option[SideOptions] = None, // §3.2 fromIndex-side options
    dateColumn: String = "date",
    /** `type` (app.py:33): the reference declares the Literal but never
      * dispatches on it (every correlation runs the prophet path). Here
      * "granger" additionally runs C9 on the aligned pair — closing the
      * declared-but-unshipped loop the way C10/C12 are — and
      * "univariateStatistics" is accepted and echoed. */
    corrType: String = "prophet") {

  // the reference's pydantic Literal rejects unknown growth values with
  // a 422; silently falling back to linear would mis-forecast
  require(growth == "linear" || growth == "logistic",
          s"unsupported growth: $growth (expected linear|logistic)")
  // Literal["prophet", "granger", "univariateStatistics"], app.py:33
  require(Set("prophet", "granger", "univariateStatistics")(corrType),
          s"unsupported type: $corrType (expected prophet|granger|univariateStatistics)")
  require(unitsToForecast.forall(_ >= 1), // conint(ge=1), app.py:49
          s"unitsToForecast must be >= 1, got $unitsToForecast")

  def fitSpec(resolvedFloor: Double, resolvedCap: Double): FitSpec =
    FitSpec(growth = growth,
            changepointPriorScale = changePointPriorScale,
            uncertaintySamples = uncertaintySamples,
            floor = resolvedFloor, cap = resolvedCap)
}

/** Static "LLM context" explanation strings — the reference's exact
  * response texts (R2, `app.py:230` and `app.py:236`). */
object Explanations {
  val autocorrelation: String =
    "Autocorrelation measures the correlation between a time series and " +
    "its lagged values. It shows the degree of similarity between a time " +
    "series and a lagged version of itself over successive time " +
    "intervals. The autocorrelation coefficient ranges from -1 to +1, " +
    "with values close to +1 indicating a strong positive correlation " +
    "and values close to -1 indicating a strong negative correlation. " +
    "However, autocorrelation does not distinguish between direct and " +
    "indirect dependencies. It can be influenced by intermediate lags."
  val partialAutocorrelation: String =
    "Partial autocorrelation measures the correlation between a time " +
    "series and its lagged values, while removing the effect of the " +
    "intermediate lags. It shows the direct relationship between a time " +
    "series and a specific lagged value, excluding the influence of " +
    "other lags in between. Partial autocorrelation helps identify the " +
    "direct influence of a lagged value on the current value of the " +
    "series."
  val predictions: String =
    "Model predictions with uncertainty bounds; historical rows cover " +
    "observed dates, future rows extend unitsToForecast periods ahead."
}
