package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Aggregation ops A1-A5 (SURVEY §2.4).
  *
  * Reference: `prepare_dataset` dedupes the time index with
  * `df.groupby("ds").agg({"y": agg})` (`app.py:89`, two-column variant
  * `app.py:390-395`); date bounds (`app.py:366-370`); logistic floor/cap
  * defaults (`app.py:354-364`).
  *
  * Scale posture: [[groupByTime]] is a single hash-aggregate with map-side
  * partial aggregation — the only shuffle in the normalization pipeline,
  * keyed by (series, bucket) so it parallelizes over both series and time.
  */
object Aggregations {

  /** Aggregation spellings: the reference enum contains the typo
    * "meadian" (`app.py:44`) which would crash pandas; we map it to
    * median (documented divergence, SURVEY §2.9). */
  def normalizeAgg(agg: String): String = agg match {
    case "sum" | "min" | "max" | "mean" | "median" => agg
    case "meadian" => "median"
    case "avg" => "mean"
    case a => throw new IllegalArgumentException(s"Unsupported aggregation: $a")
  }

  /** A1: the aggregation expression for a y column. */
  def aggExpr(agg: String, c: Column): Column = normalizeAgg(agg) match {
    case "sum"    => sum(c)
    case "min"    => min(c)
    case "max"    => max(c)
    case "mean"   => avg(c)
    case "median" => median(c)
  }

  /** A1 + T3: bucket `ds` to `grain` and aggregate duplicate buckets.
    * Expects columns `ds` (timestamp) and `y`; preserves any extra
    * grouping columns passed in `seriesCols` (the idiomatic-Spark
    * generalization of the reference's serial per-correlation loop:
    * every series is one group, processed in parallel). */
  def groupByTime(df: DataFrame, grain: Option[String], agg: String,
                  seriesCols: Seq[String] = Nil): DataFrame = {
    val keys = seriesCols.map(col) :+ TimeOps.bucket(col("ds"), grain).as("ds")
    df.groupBy(keys: _*).agg(aggExpr(agg, col("y")).as("y"))
  }

  /** A2: min/max of the time index, collected to the driver (two scalars —
    * the only intentional driver materialization in the pipeline). */
  def dateBounds(df: DataFrame, dsCol: String = "ds"): (java.sql.Timestamp, java.sql.Timestamp) = {
    val r = df.agg(min(col(dsCol)).as("lo"), max(col(dsCol)).as("hi")).head()
    (r.getTimestamp(0), r.getTimestamp(1))
  }

  /** A3: logistic-growth ceiling default:
    * `max(userCap getOrElse max(y) + 3*stddev_samp(y), max(y))`
    * (`app.py:358-364`; pandas `.std()` is sample stddev, ddof=1). */
  def ceilingExpr(y: Column, userCap: Option[Double]): Column = {
    val default = userCap.map(lit).getOrElse(max(y) + lit(3.0) * stddev_samp(y))
    greatest(default, max(y))
  }

  /** A4: logistic-growth floor default: `min(userFloor, min(y))`
    * (`app.py:354-356`; user floor defaults to 0 via `Cap`,
    * `app.py:253-255`). */
  def floorExpr(y: Column, userFloor: Double = 0.0): Column =
    least(lit(userFloor), min(y))

  /** A5: horizon default = post-aggregation series length (`app.py:91`;
    * the bundle's raw-length variant at `app.py:333` is a documented
    * divergence — we standardize on post-aggregation count). */
  def defaultHorizon(df: DataFrame, horizon: Option[Int]): Long =
    horizon.map(_.toLong).getOrElse(df.count())
}
