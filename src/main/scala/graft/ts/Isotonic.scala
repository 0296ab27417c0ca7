package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic regression by pool-adjacent-violators (PAVA; Ayer et al.
  * 1955) — the best monotone-nondecreasing fit under squared loss:
  * the standard calibration/monotone-trend primitive (reliability
  * curves for classifier scores, monotone dose-response, trend
  * extraction without a linearity assumption).
  *
  * Exactness: blocks carry exact (Σy, count) longs and merge while
  * the previous block's mean EXCEEDS the next's, compared as
  * s_prev·c_next > s_next·c_prev (no division); the emitted fit is
  * the winning block's mean as ONE double division s/c, e6-rounded
  * HALF_UP. The oracle replays it through the minimax
  * characterization fit_i = max_{j≤i} min_{l≥i} avg(y[j..l]) — the
  * selected value IS the pooled block's mean, i.e. the same two
  * integers divided, so the doubles agree bit-for-bit.
  *
  * Scale shape: one bounded calendar-grid series per task (the
  * [[graft.stats.Diagnostics.acfPacf]] contract); any number of
  * series per pass. The oracle's O(n³) interval scan is
  * oracle-side only. */
object Isotonic {

  /** @param df (seriesCol, ds, y) rows; y exact integer (cents)
    * @return one row per input day: (series, ds_sec, y_c, fit_e6),
    *         fit monotone nondecreasing within each series */
  def pava(df: DataFrame, seriesCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("string"),
              col("ds").cast("timestamp").cast("long"),
              col("y").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        // blocks as (sum, count) — merge while mean decreases
        val s = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        rows.foreach { case (_, _, y) =>
          var cur = (y, 1L)
          while (s.nonEmpty &&
                 // prev mean > cur mean ⟺ s_p·c_c > s_c·c_p (counts
                 // positive; products bounded by Σ|y|·n — the
                 // calendar-grid envelope)
                 s.last._1 * cur._2 > cur._1 * s.last._2) {
            val p = s.remove(s.length - 1)
            cur = (p._1 + cur._1, p._2 + cur._2)
          }
          s += cur
        }
        val fits = s.iterator.flatMap { case (sum, c) =>
          val f = BigDecimal(sum.toDouble / c.toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          Iterator.fill(c.toInt)(f)
        }.toArray
        rows.iterator.zip(fits.iterator).map { case ((_, d, y), f) =>
          (key, d, y, f)
        }
      }
      .toDF(seriesCol, "ds_sec", "y_c", "fit_e6")
  }
}
