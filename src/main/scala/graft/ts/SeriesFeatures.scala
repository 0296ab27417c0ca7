package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-series feature vector — the "tsfresh-lite" featurization that
  * turns a corpus of raw series into one row per series for
  * clustering, anomaly triage, or model routing: moments, extremes,
  * lag-1 autocorrelation, OLS trend slope, and mean-crossing count.
  *
  * Integer discipline: every aggregate is an exact long sum over the
  * caller's integer grid (pass whole-currency units for cents-scale
  * metrics — Σy² must fit int64); the derived statistics are single
  * deterministic double expressions rounded to 6 places, so a SQL
  * oracle replays them bit-for-bit. Mean crossings stay in pure
  * integers via cross-multiplication (y·n > S avoids the rational
  * mean entirely).
  *
  * Scale shape: one keyed lead/row_number window + one keyed
  * aggregate + one keyed self-join (for the mean-dependent crossing
  * flags) — nothing corpus-global, parallel across series. */
object SeriesFeatures {

  /** @return per key: (key, n, min_v, max_v, mean_v, std_v, acf1,
    *         slope, crossings) — std biased (÷n), acf1 the standard
    *         biased sample autocorrelation, slope per unit index. */
  def extract(daily: DataFrame, keyCol: String, dateCol: String,
              vCol: String): DataFrame = {
    val wk = Window.partitionBy(col("k")).orderBy(col("d"))
    val rows = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(vCol).cast("long").as("y"))
      .withColumn("t", row_number().over(wk).cast("long"))
      .withColumn("yn", lead(col("y"), 1).over(wk))
    val aggd = rows.groupBy(col("k")).agg(
      count(lit(1)).as("n"), sum(col("y")).as("s"),
      sum(col("y") * col("y")).as("q"),
      min(col("y")).as("min_v"), max(col("y")).as("max_v"),
      sum(col("y") * col("yn")).as("p"),
      sum(when(col("yn").isNotNull, col("y"))).as("sh"),
      sum(col("yn")).as("st"),
      sum(col("t")).as("tt"), sum(col("t") * col("t")).as("t2"),
      sum(col("t") * col("y")).as("ty"))
    // mean crossings need the per-series total first: join S back and
    // compare y·n vs S in exact longs (no rational mean anywhere)
    val crossings = rows
      .join(aggd.select(col("k"), col("n"), col("s")), Seq("k"))
      .withColumn("abv", (col("y") * col("n") > col("s")).cast("int"))
      .withColumn("prv", lag(col("abv"), 1).over(wk))
      .filter(col("prv").isNotNull && col("prv") =!= col("abv"))
      .groupBy(col("k")).agg(count(lit(1)).as("crossings"))
    aggd.join(crossings, Seq("k"), "left")
      .select(col("k").as(keyCol), col("n"), col("min_v"), col("max_v"),
        round(col("s").cast("double") / col("n"), 6).as("mean_v"),
        round(sqrt((col("q") - col("s").cast("double") * col("s") / col("n"))
          / col("n")), 6).as("std_v"),
        when(col("q").cast("double") - col("s").cast("double") * col("s")
               / col("n") <= 0.0, lit(null))
          .otherwise(round(
            (col("p") - (col("s").cast("double") / col("n"))
               * (col("sh") + col("st"))
             + (col("n") - 1L) * (col("s").cast("double") / col("n"))
               * (col("s").cast("double") / col("n")))
            / (col("q") - col("s").cast("double") * col("s") / col("n")), 6))
          .as("acf1"),
        when(col("n") <= 1L, lit(null)).otherwise(round(
          (col("n").cast("double") * col("ty") -
             col("tt").cast("double") * col("s")) /
          (col("n").cast("double") * col("t2") -
             col("tt").cast("double") * col("tt")), 6)).as("slope"),
        coalesce(col("crossings"), lit(0L)).as("crossings"))
  }
}
