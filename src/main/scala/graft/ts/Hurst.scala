package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hurst exponent by rescaled-range (R/S) analysis — the long-memory
  * diagnostic: H ≈ 0.5 for a memoryless walk, H &gt; 0.5 for
  * trending/persistent series, H &lt; 0.5 for mean-reverting ones —
  * the one-number complement to q20's lag-by-lag ACF and q302's
  * unit-root t.
  *
  * Exactness: within each size-w chunk the cumulative deviation is
  * kept exact by w-scaling (w·Z_t = w·cum_t − t·total — no float
  * mean), the chunk's R/S is ONE fixed double tree e6-rounded, the
  * per-window mean is an exact integer division, and the final
  * log-log slope uses DRIVER-EMITTED ln(w) literals shared verbatim
  * with the oracle (the ewmaWeights discipline) — so every number is
  * hash-replayable.
  *
  * Scale shape: per-(key, w, chunk) windows are w-bounded by
  * construction; the explode is ×|windows| (config ≤ 16); the slope
  * aggregate runs over ≤ |windows| rows per key. Corpus rows are
  * touched once. Zero-variance chunks are excluded by an exact
  * integer test (S = 0 would divide by zero) — standard R/S
  * practice, deterministic in both engines. */
object Hurst {

  /** ln(w) literals with round-trip-exact rendering for oracle
    * embedding. */
  def lnLiteral(w: Int): String = java.lang.Double.toString(math.log(w))

  /** @param daily per-key observations, one row per (key, date)
    * @param windows chunk sizes (config, each ≥ 4, 2..16 of them)
    * @return per (key, w): (key, w, n_chunks, rs_mean_e6, h_e6) —
    *         h_e6 repeated per key (the log-log slope over its
    *         windows); windows with zero usable chunks are absent,
    *         and keys with &lt; 2 usable windows emit null h_e6 */
  def hurstRS(daily: DataFrame, keyCol: String, dateCol: String,
              vCol: String, windows: Seq[Int]): DataFrame = {
    require(windows.nonEmpty && windows.distinct.size == windows.size &&
            windows.size >= 2 && windows.size <= 16 &&
            windows.forall(_ >= 4), "windows config-bounded, each >= 4")
    val wOrd = Window.partitionBy(col("k")).orderBy(col("d"))
    val obs = daily.select(col(keyCol).as("k"), col(dateCol).as("d"),
        col(vCol).cast("long").as("y"))
      .withColumn("idx", row_number().over(wOrd).cast("long"))
    val ex = obs.select(col("k"), col("idx"), col("y"),
        explode(typedlit(windows.map(_.toLong))).as("w"))
      .withColumn("chunk", expr("(idx - 1) div w"))
      .withColumn("pos", expr("(idx - 1) % w + 1"))
    val wc = Window.partitionBy(col("k"), col("w"), col("chunk"))
    val wcum = wc.orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = ex
      .withColumn("total", sum(col("y")).over(wc))
      .withColumn("n_c", count(lit(1)).over(wc))
      .withColumn("cum", sum(col("y")).over(wcum))
      .withColumn("wz", col("w") * col("cum") - col("pos") * col("total"))
    val chunks = dev.filter(col("n_c") === col("w"))
      .groupBy(col("k"), col("w"), col("chunk"))
      .agg(max(col("wz")).as("wz_max"), min(col("wz")).as("wz_min"),
           max(col("total")).as("total"),
           sum(col("y").cast("decimal(38,0)") * col("y")).as("s2"))
      // exact zero-variance gate: S = 0 iff w·Σy² = (Σy)²
      .filter(col("w").cast("decimal(38,0)") * col("s2") =!=
              col("total").cast("decimal(38,0)") * col("total"))
    val wD = col("w").cast("double")
    val r = (greatest(col("wz_max"), lit(0L)) -
             least(col("wz_min"), lit(0L))).cast("double") / wD
    val sDev = sqrt((col("s2").cast("double") -
      col("total").cast("double") * col("total").cast("double") / wD) / wD)
    val perW = chunks
      .withColumn("rs_e6", round(r / sDev * 1e6).cast("long"))
      .groupBy(col("k"), col("w"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("rs_e6")).as("rs_sum"))
      .withColumn("rs_mean_e6", expr("rs_sum div n_chunks"))
    // regression inputs e6-QUANTIZED before any sum (the q230
    // float-sum discipline): double sums over shuffled partials are
    // combine-order-dependent, integer sums are not
    val lnW = windows.map(w => w.toLong -> math.round(math.log(w) * 1e6))
      .foldLeft(lit(null).cast("long")) { case (acc, (w, l)) =>
        when(col("w") === w, lit(l)).otherwise(acc)
      }
    val pts = perW
      .withColumn("x", lnW)
      .withColumn("yl",
        round(log(col("rs_mean_e6").cast("double") / 1e6) * 1e6)
          .cast("long"))
    val d38 = "decimal(38,0)"
    val sl = pts.groupBy(col("k"))
      .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
           sum(col("yl")).as("sy"),
           sum(col("x").cast(d38) * col("x")).as("sxx"),
           sum(col("x").cast(d38) * col("yl")).as("sxy"))
      .withColumn("num", col("m").cast(d38) * col("sxy") -
        col("sx").cast(d38) * col("sy"))
      .withColumn("den", col("m").cast(d38) * col("sxx") -
        col("sx").cast(d38) * col("sx"))
      .withColumn("h_e6",
        when(col("m") >= 2L && col("den") =!= lit(0),
          round(col("num").cast("double") / col("den").cast("double")
            * 1e6).cast("long"))
          .otherwise(lit(null).cast("long")))
      .select(col("k"), col("h_e6"))
    perW.join(sl, Seq("k"))
      .select(col("k").as(keyCol), col("w"), col("n_chunks"),
              col("rs_mean_e6"), col("h_e6"))
  }
}
