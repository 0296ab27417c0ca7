package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation — the right-censored
  * time-to-event curve (time to second purchase, time to churn, time
  * to first conversion) that a naive "average days between orders"
  * silently biases by dropping everyone who hasn't converted yet:
  * censored subjects stay in the risk set until their censoring time.
  *
  * Integer form: survival lives on the e6 grid, S₀ = 1,000,000, and
  * each event step multiplies S' = S·(n_t − d_t) div n_t — exact long
  * arithmetic, one truncating division per step, so a SQL oracle
  * replays the ordered product with a recursive CTE and hash-matches.
  *
  * Scale shape: one keyed pass groups subjects onto the DURATION GRID
  * (bounded by the time domain in days); the risk set n_t = n − cum_<t
  * rides [[graft.scale.GridPrefix.prefixSums]]' distributed prefix
  * (no single-task sort even on a wide grid); the sequential product
  * folds ONE collected array row bounded by the grid (the
  * [[ExpSmooth]] contract). */
object Survival {

  /** @param subjects one row per subject
    * @param durCol   time-to-event-or-censoring (non-negative long,
    *                 e.g. days)
    * @param eventCol 1 = event observed, 0 = right-censored
    * @return one row per distinct duration t, ordered by t:
    *         (t, n_risk, d_events, c_censored, s_e6) where s_e6 is
    *         the survival AFTER the events at t. */
  def kaplanMeier(subjects: DataFrame, durCol: String,
                  eventCol: String): DataFrame = {
    val rows = subjects.select(col(durCol).cast("long").as("t"),
                               col(eventCol).cast("long").as("ev"))
    val grid = rows.groupBy(col("t"))
      .agg(sum(col("ev")).as("d_events"),
           sum(lit(1L) - col("ev")).as("c_censored"),
           count(lit(1)).as("n_at"))
    val pref = graft.scale.GridPrefix.prefixSums(grid, "t", "n_at")
    val tot = pref.agg(max(col("cum")).as("n_total"))
    val steps = pref.crossJoin(broadcast(tot))
      .select(col("t"), col("d_events"), col("c_censored"),
              (col("n_total") - col("cum_before")).as("n_risk"))
    val packed = steps
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
             col("d_events"), col("c_censored")))).as("s"))
    val fold = """
      |aggregate(
      |  s,
      |  named_struct(
      |    'surv', CAST(1000000 AS BIGINT),
      |    'out', CAST(array() AS
      |      ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT, d_events: BIGINT,
      |                   c_censored: BIGINT, s_e6: BIGINT>>)),
      |  (acc, x) -> named_struct(
      |    'surv', (acc.surv * (x.n_risk - x.d_events)) div x.n_risk,
      |    'out', array_append(acc.out, named_struct(
      |      't', x.t, 'n_risk', x.n_risk, 'd_events', x.d_events,
      |      'c_censored', x.c_censored,
      |      's_e6', (acc.surv * (x.n_risk - x.d_events)) div x.n_risk))),
      |  acc -> acc.out)""".stripMargin
    packed
      .select(explode(expr(fold)).as("r"))
      .select(col("r.t").as("t"), col("r.n_risk").as("n_risk"),
              col("r.d_events").as("d_events"),
              col("r.c_censored").as("c_censored"),
              col("r.s_e6").as("s_e6"))
  }

  /** Nelson–Aalen cumulative hazard — [[kaplanMeier]]'s additive
    * sibling: H(t) = Σ_{tᵢ ≤ t} dᵢ/n_riskᵢ. Unlike the KM product it
    * needs NO sequential fold: per-step increments are exact e6
    * longs ((d·1e6) div n_risk) and the cumulative is a PREFIX SUM —
    * so the whole curve rides [[graft.scale.GridPrefix.prefixSums]]
    * twice (risk sets, then hazard accumulation) and stays fully
    * distributed even on a corpus-wide duration grid.
    * @return per distinct duration: (t, n_risk, d_events, h_e6,
    *         cum_h_e6) */
  /** Log-rank test — the standard two-arm survival comparison: at
    * every event time, arm 1's observed events vs the expectation
    * under the null that both arms share one hazard; χ² =
    * (Σ(O−E))²/ΣV with the hypergeometric variance. Step terms are
    * exact-or-e6-rounded longs (E₁ = (d·n₁·1e6) div n exact; V one
    * fixed-shape double per step re-rounded to the grid), so the
    * order-free sums replay in SQL. Risk sets ride the grouped grid
    * prefix (single wide group — the distributed-grid shape).
    * @return one row: (n_1, n_2, events_1, events_2, sum_oe_e6,
    *         sum_v_e6, chi2_e6) */
  def logRank(subjects: DataFrame, durCol: String, eventCol: String,
              armCol: String): DataFrame = {
    val rows = subjects.select(col(durCol).cast("long").as("t"),
                               col(eventCol).cast("long").as("ev"),
                               col(armCol).cast("long").as("arm"))
    val grid = rows.groupBy(col("t"))
      .agg(sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("na1"),
           sum(when(col("arm") =!= 1L, 1L).otherwise(0L)).as("na0"),
           sum(when(col("arm") === 1L, col("ev")).otherwise(0L)).as("d1"),
           sum(when(col("arm") =!= 1L, col("ev")).otherwise(0L)).as("d0"))
      .withColumn("g", lit(0))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
      grid, "g", "t", Seq("na1", "na0"))
    val tot = pre.agg(max(col("cum_na1")).as("nt1"),
                      max(col("cum_na0")).as("nt0"))
    val steps = pre.crossJoin(broadcast(tot))
      .withColumn("n1", col("nt1") - col("cum_before_na1"))
      .withColumn("n0", col("nt0") - col("cum_before_na0"))
      .withColumn("n", col("n1") + col("n0"))
      .withColumn("d", col("d1") + col("d0"))
      .filter(col("d") > 0L && col("n") > 1L)
      // decimal(38) product before the integer divide: d·n1·1e6
      // exceeds int64 once risk sets reach ~1e6 with large per-time
      // event counts — the long form would wrap silently (and the
      // oracle mirrors with HUGEINT, so the selfcheck would not see it)
      .withColumn("e1_e6",
        expr("(CAST(d AS DECIMAL(38,0)) * n1 * 1000000) div n"))
      .withColumn("oe_e6", col("d1") * 1000000L - col("e1_e6"))
      .withColumn("v_e6", round(
        col("d").cast("double") * (col("n1").cast("double") / col("n"))
          * (col("n0").cast("double") / col("n"))
          * (col("n") - col("d")) / (col("n") - 1L) * 1e6).cast("long"))
    steps.agg(max(col("nt1")).as("n_1"), max(col("nt0")).as("n_2"),
        sum(col("d1")).as("events_1"), sum(col("d0")).as("events_2"),
        sum(col("oe_e6")).as("sum_oe_e6"), sum(col("v_e6")).as("sum_v_e6"))
      .withColumn("chi2_e6",
        when(col("sum_v_e6") <= 0L, lit(null))
          .otherwise(round(
            (col("sum_oe_e6").cast("double") / 1e6)
              * (col("sum_oe_e6").cast("double") / 1e6)
              / (col("sum_v_e6").cast("double") / 1e6) * 1e6))
          .cast("long"))
  }

  def nelsonAalen(subjects: DataFrame, durCol: String,
                  eventCol: String): DataFrame = {
    val rows = subjects.select(col(durCol).cast("long").as("t"),
                               col(eventCol).cast("long").as("ev"))
    val grid = rows.groupBy(col("t"))
      .agg(sum(col("ev")).as("d_events"), count(lit(1)).as("n_at"))
    val pref = graft.scale.GridPrefix.prefixSums(grid, "t", "n_at")
    val tot = pref.agg(max(col("cum")).as("n_total"))
    val steps = pref.crossJoin(broadcast(tot))
      .select(col("t"), col("d_events"),
              (col("n_total") - col("cum_before")).as("n_risk"))
      .withColumn("h_e6", expr("(d_events * 1000000) div n_risk"))
    graft.scale.GridPrefix.prefixSums(
        steps.select(col("t"), col("n_risk"), col("d_events"),
                     col("h_e6")), "t", "h_e6")
      .select(col("t"), col("n_risk"), col("d_events"), col("h_e6"),
              col("cum").as("cum_h_e6"))
  }
}
