package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multiple-testing control — the missing step after every per-key
  * test battery in this engine (per-series Mann–Kendall, per-nation
  * sign tests, per-source drift checks): run m tests at α and ~α·m
  * of them "fire" by luck. Benjamini–Hochberg turns the battery into
  * a single FALSE-DISCOVERY-RATE contract: reject the k smallest
  * p-values where k is the largest i with p_(i) ≤ i·q/m, and the
  * expected fraction of false rejections stays ≤ q (Benjamini &
  * Hochberg 1995).
  *
  * Everything here is integer-exact on e6-quantized p-values (the
  * engine's tests emit p_e6 / z_e6 already): the step-up threshold
  * compare is p_e6·m·100 ≤ i·q_pct·10⁴ (pure int64 — m·10⁸ bounds
  * far above any battery), and the adjusted p is the running suffix
  * minimum of min(10⁶, p_e6·m div i) — so a DuckDB oracle replays
  * the decisions bit-for-bit, and the BH quantization contract is
  * explicit rather than hidden in float noise. */
object Multiplicity {

  /** Benjamini–Hochberg step-up over one battery of tests.
    *
    * Scale contract (battery-bounded): the battery is ONE family of
    * simultaneous hypotheses — per-nation, per-series, per-source
    * keys, i.e. config/domain-bounded cardinality (the decile-bucket
    * window class, not corpus rows). The rank and suffix-min windows
    * are global over that battery by design; feeding corpus-row-
    * cardinality "tests" through one battery is a modeling error,
    * not a supported shape.
    *
    * Ties in p_e6 are ordered by the test key (deterministic rank),
    * and the suffix-min adjustment makes tied p's share one adjusted
    * value regardless of that order — the standard BH monotonization.
    *
    * @param tests (test, p_e6) rows, one per hypothesis; null p_e6
    *              rows are excluded from the battery (they never ran)
    * @param qPct  target FDR in percent (default 5)
    * @return per test: (test, m, rank, p_e6, p_adj_e6, reject) with
    *         reject 1L when p_adj_e6 ≤ qPct·10⁴ */
  def bhAdjust(tests: DataFrame, testCol: String, pCol: String,
               qPct: Int = 5): DataFrame = {
    require(qPct > 0 && qPct < 100, "qPct in (0, 100)")
    val base = tests
      .select(col(testCol).as("t"), col(pCol).cast("long").as("p_e6"))
      .where(col("p_e6").isNotNull)
    val m = base.agg(count(lit(1)).as("m"))
    // battery-bounded global windows (see scale contract above)
    val asc = org.apache.spark.sql.expressions.Window
      .orderBy(col("p_e6"), col("t"))
    val suffix = org.apache.spark.sql.expressions.Window
      .orderBy(col("p_e6").desc, col("t").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    base.crossJoin(broadcast(m))
      .withColumn("rank", row_number().over(asc).cast("long"))
      .withColumn("raw_adj",
        least(lit(1000000L), expr("p_e6 * m div rank")))
      .withColumn("p_adj_e6", min(col("raw_adj")).over(suffix))
      .select(col("t").as(testCol), col("m"), col("rank"), col("p_e6"),
        col("p_adj_e6"),
        when(col("p_adj_e6") <= qPct.toLong * 10000L, 1L).otherwise(0L)
          .as("reject"))
  }
}
