package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** STREAMING form of the reference's flagship `/analyze` dataflow
  * (§3.1: T3 day bucket → A1 sum agg → J1/J2 covariate splice → J3
  * alignment → forecast state) as ONE Structured Streaming job — the
  * composition the batch operator
  * [[graft.forecast.AnalyzeSlice.analyzeSlice]] runs as a grid fold,
  * maintained live per series via `flatMapGroupsWithState` over the
  * UNION of the target and covariate event streams.
  *
  * Day-close is WATERMARK-DRIVEN (event-time timeout): a day folds
  * (and its target row emits, exactly once) when the union stream's
  * event-time watermark passes the day's end — `withWatermark` over
  * the union with `latenessDays` of allowed lateness, the standard
  * Structured Streaming finality contract the window-agg members of
  * this tier already use. The watermark runs on the DAY-END boundary
  * column (see the in-body note), so it reads (newest day boundary
  * seen on either stream) − latenessDays and every day is final or
  * open as a WHOLE. That makes lateness a TIME contract, not an
  * arrival-order contract: one source running up to `latenessDays`
  * days ahead of the other can no longer orphan the other's same-day
  * rows (the failure mode of the single-stream ops' arrival-order
  * close, which is fine for ONE stream but race-prone across two);
  * only rows for days the watermark has already closed are late, and
  * late-is-final.
  *
  * State per series = the two Holt–Winters recursions (target +
  * covariate: t, level, trend, m seasonal longs each), the
  * days-since-covariate gap for the h-step-ahead covariate
  * prediction, and the OPEN-day accumulators — days inside the
  * watermark horizon, so ~latenessDays + in-flight-skew entries of
  * five longs each, config-bounded (the single pending slot of the
  * arrival-order device generalizes to the horizon because finality
  * now comes from time, and several days can be legitimately open at
  * once). Per fold the arithmetic is the batch aggregate's
  * element-for-element: same exact-long updates, same truncating
  * division, same session-TZ `date_trunc` bucketing — after the
  * watermark passes a day, its emitted row equals the batch
  * `analyzeSlice` row (spec-pinned parity, including under a racing
  * covariate). */
object StreamAnalyze {

  /** One Holt–Winters recursion state (t = folds done). */
  case class AzHw(t: Long, l: Long, b: Long, sv: Array[Long])
  /** One OPEN day's accumulator (five longs). */
  case class AzPend(day: Long, tSeen: Long, tSum: Long,
                    cSeen: Long, cSum: Long)
  case class AzState(lastClosed: Long, pend: List[AzPend], hg: Long,
                     tgt: AzHw, cov: AzHw)
  case class AnalyzeUpdate(series: String, day_sec: Long, y_c: Long,
                           cov_obs_c: Option[Long],
                           cov_pred_c: Option[Long],
                           cov_c: Option[Long],
                           level_c: Long, trend_c: Long,
                           seas_c: Long, pred_c: Long)

  /** @param target  streaming frame with (seriesCol, tsCol, vCol) —
    *                the series being forecast
    * @param covariate streaming frame with the SAME column names —
    *                the covariate whose observed/predicted splice is
    *                aligned onto the target's days
    * @param latenessDays watermark delay: how long after a day's last
    *                possible event the fold waits for stragglers (and
    *                how far one source may race ahead of the other
    *                without orphaning its rows) */
  def streamingAnalyze(target: DataFrame, covariate: DataFrame,
                       seriesCol: String, tsCol: String, vCol: String,
                       m: Int = 7,
                       aNum: Int = 2, aDen: Int = 10,
                       bNum: Int = 1, bDen: Int = 10,
                       gNum: Int = 3, gDen: Int = 10,
                       latenessDays: Int = 1)
      : Dataset[AnalyzeUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(m >= 2, "seasonal period must be >= 2")
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(gNum > 0 && gNum < gDen, "gamma in (0, 1)")
    require(latenessDays >= 0 && latenessDays <= 3653,
      "lateness config-bounded")
    val spark = target.sparkSession
    import spark.implicits._
    val NONE = Long.MinValue
    // one HW fold step — identical arithmetic to the batch
    // aggregate's per-element update (Java long division and Spark's
    // `div` both truncate toward zero). Returns (state', level,
    // trend, seas, pred) for the folded day.
    def foldHw(st: AzHw, y: Long): (AzHw, Long, Long, Long, Long) =
      if (st.t == 0L)
        (AzHw(1L, y, 0L, st.sv), y, 0L, 0L, y)
      else {
        val p = (st.t % m).toInt
        val sOld = st.sv(p)
        val pred = st.l + st.b + sOld
        val lp = (aNum * (y - sOld) + (aDen - aNum) * (st.l + st.b)) / aDen
        val bp = (bNum * (lp - st.l) + (bDen - bNum) * st.b) / bDen
        val sp = (gNum * (y - lp) + (gDen - gNum) * sOld) / gDen
        val sv2 = st.sv.clone(); sv2(p) = sp
        (AzHw(st.t + 1, lp, bp, sv2), lp, bp, sp, pred)
      }
    // close ONE day: covariate prediction from the PRE-update
    // covariate state (h = hg + 1 union days since the last covariate
    // fold, phase (t + h - 1) mod m), J1/J2 splice, fold whichever
    // sides observed the day, emit iff the target did
    def closeDay(st: AzState, p: AzPend, key: String)
        : (AzState, Option[AnalyzeUpdate]) = {
      val h = st.hg + 1
      val covPred =
        if (st.cov.t > 0L)
          Some(st.cov.l + h * st.cov.b +
            st.cov.sv(((st.cov.t + h - 1) % m).toInt))
        else None
      val (cov2, hg2) =
        if (p.cSeen == 1L) (foldHw(st.cov, p.cSum)._1, 0L)
        else (st.cov, h)
      val covObs = if (p.cSeen == 1L) Some(p.cSum) else None
      if (p.tSeen == 1L) {
        val (tgt2, l, b, seas, pred) = foldHw(st.tgt, p.tSum)
        (st.copy(lastClosed = p.day, tgt = tgt2, cov = cov2, hg = hg2),
         Some(AnalyzeUpdate(key, p.day, p.tSum, covObs, covPred,
           covObs.orElse(covPred), l, b, seas, pred)))
      } else
        (st.copy(lastClosed = p.day, cov = cov2, hg = hg2), None)
    }
    // the watermark column is the event's DAY-END boundary, not its
    // raw timestamp: Spark's own late-row filter drops rows older
    // than the watermark at ROW granularity, and a raw-ts watermark
    // would drop a straddling day's early-morning rows while keeping
    // its afternoon ones — day-grain state demands day-grain
    // lateness. On the day-end column, every row of a day is dropped
    // or kept TOGETHER, the watermark reads max(closed-day boundary)
    // − latenessDays, and the group function's close rule (day end ≤
    // watermark) is at least as eager as the engine's drop rule, so a
    // kept-but-closed-day row always hits the explicit late rule
    // below (day ≤ lastClosed) — never a half-folded day. The column
    // must SURVIVE into the stateful operator (the event-time-timeout
    // analysis rule requires a watermarked child attribute); the fold
    // ignores it.
    val tag = (df: DataFrame, kind: Int) => df.select(
      col(seriesCol).cast("string").as("series"),
      date_trunc("day", col(tsCol).cast("timestamp")).cast("long")
        .as("day_sec"),
      col(vCol).cast("long").as("v"), lit(kind).as("kind"))
    tag(target, 1).unionByName(tag(covariate, 0))
      .withColumn("day_end",
        timestamp_seconds(col("day_sec") + lit(86400L)))
      .withWatermark("day_end", s"$latenessDays days")
      .as[(String, Long, Long, Int, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
          GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Long, Long, Int, java.sql.Timestamp)],
         state: GroupState[AzState]) =>
          var st = state.getOption.getOrElse(
            AzState(NONE, Nil, 0L,
              AzHw(0L, 0L, 0L, Array.fill(m)(0L)),
              AzHw(0L, 0L, 0L, Array.fill(m)(0L))))
          // fold fresh rows into the open-day accumulators (per-batch
          // day aggregation absorbs in-batch disorder); days at or
          // before the last CLOSED day are late by contract
          val byDay = scala.collection.mutable.Map
            .from(st.pend.map(p => p.day -> p))
          rows.foreach { case (_, d, v, kind, _) =>
            // NONE = Long.MinValue, so the fresh-state case passes
            if (d > st.lastClosed) {
              val p = byDay.getOrElse(d, AzPend(d, 0L, 0L, 0L, 0L))
              byDay(d) =
                if (kind == 1) p.copy(tSeen = 1L, tSum = p.tSum + v)
                else p.copy(cSeen = 1L, cSum = p.cSum + v)
            }
          }
          // close every open day the watermark has passed, in day
          // order (the recursion is order-sensitive); the rest stay
          // open and re-arm the event-time timeout at the earliest
          // still-open day's end, so closure does not wait for the
          // next data batch
          val wm = state.getCurrentWatermarkMs()
          val (ready, open) = byDay.values.toSeq.sortBy(_.day)
            .partition(p => (p.day + 86400L) * 1000L <= wm)
          val out = scala.collection.mutable.ArrayBuffer.empty[AnalyzeUpdate]
          ready.foreach { p =>
            val (st2, row) = closeDay(st, p, key)
            row.foreach(out += _)
            st = st2
          }
          st = st.copy(pend = open.sortBy(_.day).toList)
          state.update(st)
          if (open.nonEmpty)
            state.setTimeoutTimestamp((open.map(_.day).min + 86400L) * 1000L)
          out.iterator
      }
  }
}
