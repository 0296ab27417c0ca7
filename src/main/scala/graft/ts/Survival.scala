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
