package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the events stream: ordered-funnel
  * progression and cohort retention — the two canonical "product
  * analytics" queries a warehouse team asks of the same event table
  * the curation tier mines.
  *
  * Both are compositions of keyed aggregates and keyed joins — no
  * corpus-sized window partitions, no driver materialization — so they
  * hold at any user count: funnel cost is (#stages − 1) keyed joins on
  * the user axis; retention is two keyed aggregates and one join.
  */
object EventAnalytics {

  /** Ordered funnel: for each user, the earliest time of stage 1, then
    * for each later stage the earliest qualifying event AT OR AFTER the
    * previous stage's time and within `windowSec` of stage 1 (the
    * standard "conversion window from first touch"). One ledger row
    * per user who reached stage 1: (user_id, t1_sec … tk_sec, depth) —
    * unreached stages stay null, `depth` counts reached stages.
    * Timestamps are integral seconds (`secCol`). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             secCol: String, stages: Seq[String],
             windowSec: Long): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    require(windowSec > 0, "windowSec must be positive")
    val base = events.select(col(userCol).as("user_id"),
                             col(typeCol).as("et"), col(secCol).as("sec"))
    val s1 = base.filter(col("et") === stages.head)
      .groupBy("user_id").agg(min(col("sec")).as("t1_sec"))
    val full = stages.tail.zipWithIndex.foldLeft(s1) { case (acc, (stage, i)) =>
      val prev = s"t${i + 1}_sec"
      val cur = s"t${i + 2}_sec"
      val si = base.filter(col("et") === stage)
        .join(acc.select(col("user_id"), col(prev), col("t1_sec").as("__t1")),
              Seq("user_id"))
        .filter(col("sec") >= col(prev) &&
                col("sec") <= col("__t1") + windowSec)
        .groupBy("user_id").agg(min(col("sec")).as(cur))
      acc.join(si, Seq("user_id"), "left")
    }
    val depth = stages.indices.map(i => when(col(s"t${i + 1}_sec").isNotNull, 1L)
      .otherwise(0L)).reduce(_ + _)
    full.select(col("user_id") +:
      stages.indices.map(i => col(s"t${i + 1}_sec")) :+
      depth.as("depth"): _*)
  }

  /** Cohort retention: users grouped by their FIRST active week (the
    * cohort), counted in every later week they were active. One row
    * per (cohort week, week offset): (cohort_wk, offset_weeks,
    * n_users) — the retention matrix in long form. Weeks are
    * Monday-aligned `date_trunc` buckets (the q03 grain), offsets
    * exact multiples of 7 days. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val act = events.select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
    val coh = act.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    act.join(coh, Seq("user_id"))
      .withColumn("offset_weeks",
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("long"))
      .groupBy("cohort_wk", "offset_weeks")
      .agg(count(lit(1)).as("n_users"))
  }
}
