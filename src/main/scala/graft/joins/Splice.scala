package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join / splice / filter ops J1-J5, F1-F3 (SURVEY §2.5, §2.2).
  *
  * All reference joins are equi-joins on the single time key `ds`
  * (`app.py:144-146`, `app.py:169`, `app.py:188`, `app.py:456-468`).
  * Post-aggregation both sides are one row per time bucket — small — so
  * every join here broadcasts the right side by default: zero shuffle at
  * any scale where the bucketed series fits an executor (a year of
  * minutes is ~526k rows; far under broadcast limits). For multi-series
  * frames the join key is (series_id, ds) and Catalyst falls back to
  * shuffled hash / sort-merge automatically when the side is large.
  */
object Splice {

  private def keyed(seriesCols: Seq[String]) = seriesCols :+ "ds"

  /** J1 + J2: splice observed values over a forecast — left-join actuals
    * onto predictions, observed wins, forecast fills gaps
    * (`app.py:144-151`: `merge(how="left")` + `combine_first`). */
  def spliceObserved(predictions: DataFrame, actuals: DataFrame, outName: String,
                     seriesCols: Seq[String] = Nil, hint: Boolean = true): DataFrame = {
    val rhs = if (hint) broadcast(actuals) else actuals
    predictions.join(rhs, keyed(seriesCols), "left")
      .withColumn(outName, coalesce(col("y"), col("yhat")))
      .drop("y")
  }

  /** J3: align a covariate series onto the target timeline
    * (`app.py:169`: `targets.merge(covariate_predictions, how="left")`). */
  def alignCovariate(target: DataFrame, covariate: DataFrame,
                     seriesCols: Seq[String] = Nil, hint: Boolean = true): DataFrame = {
    val rhs = if (hint) broadcast(covariate) else covariate
    target.join(rhs, keyed(seriesCols), "left")
  }

  /** J4 / F3: future grid ⋈ covariates. The reference writes
    * `merge(how="left").dropna()` (`app.py:188`) — semantically an inner
    * join; we plan it as one (no null-scan pass). */
  def futureWithCovariates(futureGrid: DataFrame, covariate: DataFrame,
                           seriesCols: Seq[String] = Nil, hint: Boolean = true): DataFrame = {
    val rhs = if (hint) broadcast(covariate) else covariate
    futureGrid.join(rhs, keyed(seriesCols), "inner")
  }

  /** F1: historical/future split by the max observed date
    * (`app.py:397-415`). Returns both halves as lazy frames sharing one
    * scan (Catalyst reuses the exchange under AQE). */
  def splitAt(predictions: DataFrame, maxHistDs: Column): (DataFrame, DataFrame) =
    (predictions.filter(col("ds") <= maxHistDs),
     predictions.filter(col("ds") > maxHistDs))
}
