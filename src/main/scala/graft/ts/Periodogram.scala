package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-period periodogram — "WHICH cycle length does this series
  * actually have": the DFT power of the mean-removed series at a
  * config set of candidate periods (7/30/91/…), the detector that
  * justifies the seasonal machinery ([[Decompose]], the Holt–Winters
  * cycle length) instead of assuming weekly because it's retail.
  *
  * Exactness: the trig basis is a DRIVER-COMPUTED literal table —
  * cos/sin e6-rounded once per (period, phase), embedded identically
  * in the oracle (the `ewmaWeights` discipline), so the projection
  * sums a = Σ z·cos, b = Σ z·sin are exact decimal(38) integer
  * aggregates of the n-scaled deviations z = n·y − Σy (mean removal
  * without a float mean). One fixed double tree per output row turns
  * (a, b) into the amplitude.
  *
  * Scale shape: per-key windows for n/Σy (the calendar-bounded grid
  * contract), an explode ×|periods| (config), one keyed aggregate;
  * the phase table is config-sized (Σ periods rows) and broadcast
  * deliberately. Corpus rows are touched once. */
object Periodogram {

  /** @param daily per-key observations, one row per (key, date)
    * @param periods candidate cycle lengths in days (config, each
    *        2..1000)
    * @return per (key, period): (key, period, n_obs, amp_v,
    *         dominant) — amp_v the fitted cosine amplitude in value
    *         units (2/n·|Σ(y−ȳ)e^{iωt}|), dominant = 1 on the
    *         argmax period per key (ties all flagged) */
  def periodogram(daily: DataFrame, keyCol: String, dateCol: String,
                  vCol: String, periods: Seq[Int]): DataFrame = {
    require(periods.nonEmpty && periods.distinct.size == periods.size &&
            periods.forall(p => p >= 2 && p <= 1000),
            "periods are config-bounded (2..1000, distinct)")
    val spark = daily.sparkSession
    import spark.implicits._
    val tab = periods.flatMap { p =>
      (0 until p).map { b =>
        val ang = 2.0 * math.Pi * b / p
        (p.toLong, b.toLong, math.round(math.cos(ang) * 1e6),
         math.round(math.sin(ang) * 1e6))
      }
    }.toDF("period", "phase", "cos_e6", "sin_e6")
    val wAll = Window.partitionBy(col("k"))
    val obs = daily.select(col(keyCol).as("k"), col(dateCol).as("d"),
        col(vCol).cast("long").as("y"))
      .withColumn("t",
        datediff(col("d"), lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("y")).over(wAll))
      .withColumn("z", col("n") * col("y") - col("total"))
    val withP = obs.select(col("k"), col("n"), col("z"), col("t"),
        explode(typedlit(periods.map(_.toLong))).as("period"))
      .withColumn("phase", pmod(col("t"), col("period")))
      .join(broadcast(tab), Seq("period", "phase"))
    val agg = withP.groupBy(col("k"), col("period"), col("n"))
      .agg(sum(col("z").cast("decimal(38,0)") * col("cos_e6")).as("az"),
           sum(col("z").cast("decimal(38,0)") * col("sin_e6")).as("bz"))
    val nD = col("n").cast("double")
    val amp = round(
      sqrt(col("az").cast("double") * col("az").cast("double")
        + col("bz").cast("double") * col("bz").cast("double"))
      / nD / nD / 1e6 * 2.0).cast("long")
    agg.withColumn("amp_v", amp)
      .withColumn("dominant",
        when(col("amp_v") ===
               max(col("amp_v")).over(Window.partitionBy(col("k"))), 1L)
          .otherwise(0L))
      .select(col("k").as(keyCol), col("period"), col("n").as("n_obs"),
              col("amp_v"), col("dominant"))
  }

  /** The literal trig table as SQL VALUES rows — embedded in oracles
    * so both engines share the identical e6 basis. */
  def phaseTableSql(periods: Seq[Int]): String =
    periods.flatMap { p =>
      (0 until p).map { b =>
        val ang = 2.0 * math.Pi * b / p
        s"($p, $b, ${math.round(math.cos(ang) * 1e6)}, " +
          s"${math.round(math.sin(ang) * 1e6)})"
      }
    }.mkString(", ")
}
