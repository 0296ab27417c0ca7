package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Wald's Sequential Probability Ratio Test — the experiment STOPPER
  * the fixed-horizon tests (q214's z, Welch, MWU) can't be: those
  * answer "is there an effect" after a pre-committed sample; SPRT
  * answers "can we stop TODAY", with guaranteed error rates, by
  * walking the cumulative Bernoulli log-likelihood ratio against two
  * boundaries. The natural streaming member (state = two counters) —
  * [[graft.streaming.StreamOps.streamingSprt]] is the live twin,
  * parity-pinned against this ledger.
  *
  * Cross-engine determinism without cross-engine logs: the four log
  * terms (per-success and per-failure LLR increments, both decision
  * boundaries) are quantized to e6 integers ONCE, on the DRIVER
  * (`math.log`), and embedded as literals in both the Spark plan and
  * the SQL oracle — the engines never evaluate a transcendental, so
  * the ledger is exact integer arithmetic end to end:
  *
  *   llr_e6(t) = s_cum·round(10⁶·ln(p1/p0))
  *             + f_cum·round(10⁶·ln((1−p1)/(1−p0)))
  *   stop when llr ≥ round(10⁶·ln((1−β)/α))  → decision +1 (H1)
  *          or llr ≤ round(10⁶·ln(β/(1−α)))  → decision −1 (H0)
  *
  * The SEQUENTIAL contract: the first boundary crossing freezes the
  * test — later days cannot un-decide it (that is what makes the
  * error rates hold). The ledger reports the frozen decision and its
  * day alongside the full trajectory aggregate.
  *
  * Scale shape: per-key running windows (series-partitioned), one
  * keyed aggregate for the summary; nothing corpus-global. */
object Sprt {

  /** The four e6-quantized literals for (p0, p1, α, β), driver-side. */
  def literals(p0: Double, p1: Double, alpha: Double, beta: Double)
      : (Long, Long, Long, Long) = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p1 != p0,
      "p0, p1 in (0, 1), distinct")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha, beta in (0, 1)")
    def e6(x: Double): Long = math.round(x * 1e6)
    (e6(math.log(p1 / p0)), e6(math.log((1 - p1) / (1 - p0))),
     e6(math.log((1 - beta) / alpha)), e6(math.log(beta / (1 - alpha))))
  }

  /** @param daily one row per (key, day): successes and trials that
    *              day (exact counts)
    * @return one SUMMARY row per key: (key, n_days, s_tot, f_tot,
    *         llr_e6, decision, decided_day) — decision +1/−1 at the
    *         FIRST boundary crossing (frozen thereafter), 0 with a
    *         null day while the test still runs */
  def sprtLedger(daily: DataFrame, keyCol: String, dateCol: String,
                 succCol: String, trialCol: String,
                 p0: Double, p1: Double,
                 alpha: Double = 0.05, beta: Double = 0.2): DataFrame = {
    val (l1, l0, a, b) = literals(p0, p1, alpha, beta)
    val run = Window.partitionBy(col("k")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val led = daily
      .select(col(keyCol).as("k"), col(dateCol).as("d"),
              col(succCol).cast("long").as("s"),
              (col(trialCol).cast("long") - col(succCol).cast("long"))
                .as("f"))
      .withColumn("s_cum", sum(col("s")).over(run))
      .withColumn("f_cum", sum(col("f")).over(run))
      .withColumn("llr",
        col("s_cum") * lit(l1) + col("f_cum") * lit(l0))
      .withColumn("cross",
        when(col("llr") >= lit(a), 1L)
          .when(col("llr") <= lit(b), -1L).otherwise(0L))
    // the first crossing freezes the test: min_by over (day) among
    // crossing rows; the trajectory aggregate rides the same pass
    led.groupBy(col("k"))
      .agg(count(lit(1)).as("n_days"), sum(col("s")).as("s_tot"),
        sum(col("f")).as("f_tot"), max(col("d")).as("last_d"),
        min(when(col("cross") =!= 0L, col("d"))).as("decided_day"),
        min_by(col("cross"), when(col("cross") =!= 0L, col("d")))
          .as("first_cross"),
        max_by(col("llr"), col("d")).as("llr_e6"))
      .select(col("k").as(keyCol), col("n_days"), col("s_tot"),
        col("f_tot"), col("llr_e6"),
        coalesce(col("first_cross"), lit(0L)).as("decision"),
        col("decided_day"))
  }
}
