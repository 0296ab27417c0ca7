package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EWMA control chart (Roberts 1959; the SPC standard for detecting
  * SMALL sustained shifts that a Shewhart ±3σ chart misses): each
  * series calibrates an in-control mean/σ on its first W closed
  * days, then charts the exponentially weighted statistic
  * z_i = λ·x_i + (1−λ)·z_{i−1} against the steady-state limits
  * μ ± L·σ·√(λ/(2−λ)), flagging the first day the smoothed level
  * leaves the band.
  *
  * Where [[SeriesOps.pageHinkley]] tests a cumulative deviation and
  * [[Sprt]] stops a hypothesis, the EWMA chart is the MONITORING
  * view: a per-day in/out-of-control flag with a tunable memory λ.
  *
  * Exactness contract: the recursion runs in exact longs with
  * FLOOR division — z_i = floorDiv(a·x_i + (b−a)·z_{i−1}, b),
  * λ = a/b — because the oracle's recursive CTE replays it with
  * DuckDB's `//` (floor, not truncate-toward-zero; Math.floorDiv is
  * the JVM twin for every sign). Calibration moments are exact
  * integer sums; the limits are ONE double tree over them, and the
  * alarm compare casts the exact z to double against that tree —
  * identical IEEE in both engines. Same per-series bounded-array
  * shape as [[graft.stats.Diagnostics.acfPacf]].
  */
object ControlChart {

  /** @param df (seriesCol, ds, y) rows, y exact integer (cents)
    * @param calDays in-control calibration window W (closed days)
    * @param aNum/aDen λ = aNum/aDen in (0, 1)
    * @param lTimes10 L in tenths (30 = the classic 3σ)
    * @return one row per POST-calibration day: (series, ds, y_c,
    *         z_c, mu_c, lim_lo_e6, lim_hi_e6, alarm) — alarm 1 when
    *         z leaves [lo, hi]; series shorter than calDays + 1 (or
    *         with zero calibration variance) emit nothing */
  def ewmaChart(df: DataFrame, seriesCol: String, calDays: Int = 14,
                aNum: Int = 2, aDen: Int = 10, lTimes10: Int = 30)
      : DataFrame = {
    require(aNum > 0 && aNum < aDen, "lambda in (0, 1)")
    require(calDays >= 2, "calibration needs >= 2 days")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(seriesCol).cast("string"),
              col("ds").cast("timestamp").cast("long"),
              col("y").cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val rows = it.toArray.sortBy(_._2)
        if (rows.length <= calDays) Iterator.empty
        else {
          val cal = rows.take(calDays)
          var s = 0L
          var q = BigInt(0)
          cal.foreach { case (_, _, y) => s += y; q += BigInt(y) * y }
          val w = calDays.toDouble
          val va = (q.toDouble - s.toDouble * s.toDouble / w) / (w - 1.0)
          if (va <= 0.0) Iterator.empty
          else {
            // limits: ONE double tree, replayed verbatim by the oracle
            val lam = aNum.toDouble / aDen.toDouble
            val half = (lTimes10.toDouble / 10.0) * math.sqrt(va) *
              math.sqrt(lam / (2.0 - lam))
            val muD = s.toDouble / w
            val lo = BigDecimal((muD - half) * 1e6)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val hi = BigDecimal((muD + half) * 1e6)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
            val muC = Math.floorDiv(s, calDays.toLong)
            var z = muC // chart restarts at the calibrated level
            rows.drop(calDays).iterator.map { case (_, d, y) =>
              z = Math.floorDiv(aNum * y + (aDen - aNum) * z, aDen.toLong)
              // integer compare on the shared e6 grid (|z| ≤ 10⁹
              // cents keeps z·10⁶ inside int64 — the house envelope)
              val alarm =
                if (z * 1000000L < lo || z * 1000000L > hi) 1L else 0L
              (key, d, y, z, muC, lo, hi, alarm)
            }
          }
        }
      }
      .toDF(seriesCol, "ds_sec", "y_c", "z_c", "mu_c", "lim_lo_e6",
            "lim_hi_e6", "alarm")
  }
}
