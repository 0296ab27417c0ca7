package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DataFrame-facing ACF/PACF (SURVEY §2.7 C1/C2).
  *
  * The reference computes diagnostics on one pandas series at a time
  * (`app.py:229-239`); here every series is one group key, so an
  * arbitrary number of series (correlations, event types, tenants) fit
  * one shuffle-and-compute pass. Each group materializes only its own
  * series in a task — at 100 TB total data the per-series cardinality
  * (post grain-aggregation: e.g. years of hourly points ≈ 10^4 rows)
  * is what bounds task memory, not table size.
  */
object Diagnostics {

  /** Per-series ACF + PACF. Input needs columns (`seriesCol`, `ds`, `y`);
    * output (`seriesCol`, lag, acf, pacf), lags 0..nlags (statsmodels
    * default nlags when None). */
  def acfPacf(df: DataFrame, seriesCol: String, nlags: Option[Int] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ds may be DATE or TIMESTAMP; epoch seconds are only used for ordering
    df.select(col(seriesCol).cast("string"),
              col("ds").cast("timestamp").cast("long"), col("y").cast("double"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val ys = it.toArray.sortBy(_._2).map(_._3)
        val nl = nlags.getOrElse(AutoCorr.defaultNlags(ys.length))
        val a = AutoCorr.acf(ys, nl)
        val p = AutoCorr.pacfYWAdjusted(ys, nl)
        Iterator.tabulate(nl + 1)(i => (key, i, a(i), p(i)))
      }
      .toDF(seriesCol, "lag", "acf", "pacf")
  }
}
