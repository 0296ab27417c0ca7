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
  * State per series = the two Holt–Winters recursions (target +
  * covariate: t, level, trend, m seasonal longs each), the
  * days-since-covariate gap for the h-step-ahead covariate
  * prediction, and ONE pending (day, target-sum, covariate-sum)
  * accumulator — 2·(m + 3) + 6 longs, config-bounded forever. A day
  * FOLDS (and its target row emits, exactly once) when a LATER day
  * first arrives for the series on EITHER stream — the
  * [[StreamOps.streamingHoltWinters]] day-close device over the
  * union grid — so after any stream prefix every emitted row equals
  * the batch `analyzeSlice` row for that day (spec-pinned parity;
  * each series' still-open max union day is the only difference).
  * Same exact-long arithmetic, same truncating division, same
  * session-TZ `date_trunc` bucketing as batch.
  *
  * Lateness contract (the order-sensitive-recursion rule): events
  * for a day older than the series' pending day are ignored —
  * day-grain disorder inside one micro-batch is absorbed by the
  * per-batch day aggregation; once a later day opens, earlier days
  * are final. */
object StreamAnalyze {

  /** One Holt–Winters recursion state (t = folds done). */
  case class AzHw(t: Long, l: Long, b: Long, sv: Array[Long])
  case class AzState(pendDay: Long, tSeen: Long, tSum: Long,
                     cSeen: Long, cSum: Long, hg: Long,
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
    *                aligned onto the target's days */
  def streamingAnalyze(target: DataFrame, covariate: DataFrame,
                       seriesCol: String, tsCol: String, vCol: String,
                       m: Int = 7,
                       aNum: Int = 2, aDen: Int = 10,
                       bNum: Int = 1, bDen: Int = 10,
                       gNum: Int = 3, gDen: Int = 10)
      : Dataset[AnalyzeUpdate] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(m >= 2, "seasonal period must be >= 2")
    require(aNum > 0 && aNum < aDen, "alpha in (0, 1)")
    require(bNum > 0 && bNum < bDen, "beta in (0, 1)")
    require(gNum > 0 && gNum < gDen, "gamma in (0, 1)")
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
    // close the pending day: covariate prediction from the
    // PRE-update covariate state (h = hg + 1 union days since the
    // last covariate fold, phase (t + h - 1) mod m), J1/J2 splice,
    // fold whichever sides observed the day, emit iff the target did
    def closeDay(st: AzState, key: String)
        : (AzState, Option[AnalyzeUpdate]) = {
      val h = st.hg + 1
      val covPred =
        if (st.cov.t > 0L)
          Some(st.cov.l + h * st.cov.b +
            st.cov.sv(((st.cov.t + h - 1) % m).toInt))
        else None
      val (cov2, hg2) =
        if (st.cSeen == 1L) (foldHw(st.cov, st.cSum)._1, 0L)
        else (st.cov, h)
      val covObs = if (st.cSeen == 1L) Some(st.cSum) else None
      if (st.tSeen == 1L) {
        val (tgt2, l, b, seas, pred) = foldHw(st.tgt, st.tSum)
        (st.copy(tgt = tgt2, cov = cov2, hg = hg2),
         Some(AnalyzeUpdate(key, st.pendDay, st.tSum, covObs, covPred,
           covObs.orElse(covPred), l, b, seas, pred)))
      } else
        (st.copy(cov = cov2, hg = hg2), None)
    }
    val tag = (df: DataFrame, kind: Int) => df.select(
      col(seriesCol).cast("string").as("series"),
      date_trunc("day", col(tsCol).cast("timestamp")).cast("long")
        .as("day_sec"),
      col(vCol).cast("long").as("v"), lit(kind).as("kind"))
    tag(target, 1).unionByName(tag(covariate, 0))
      .as[(String, Long, Long, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Long, Long, Int)],
         state: GroupState[AzState]) =>
          var st = state.getOption.getOrElse(
            AzState(NONE, 0L, 0L, 0L, 0L, 0L,
              AzHw(0L, 0L, 0L, Array.fill(m)(0L)),
              AzHw(0L, 0L, 0L, Array.fill(m)(0L))))
          // per-batch day aggregation: (day -> (tgtSum, tgtSeen,
          // covSum, covSeen)) — absorbs in-batch disorder
          val days = rows.foldLeft(
              Map.empty[Long, (Long, Long, Long, Long)]) {
            case (acc, (_, d, v, kind)) =>
              val (ts, tn, cs, cn) = acc.getOrElse(d, (0L, 0L, 0L, 0L))
              acc.updated(d,
                if (kind == 1) (ts + v, 1L, cs, cn)
                else (ts, tn, cs + v, 1L))
          }
          val out = scala.collection.mutable.ArrayBuffer.empty[AnalyzeUpdate]
          days.toSeq.sortBy(_._1).foreach { case (d, (ts, tn, cs, cn)) =>
            if (st.pendDay == NONE)
              st = st.copy(pendDay = d, tSeen = tn, tSum = ts,
                           cSeen = cn, cSum = cs)
            else if (d == st.pendDay)
              st = st.copy(tSeen = st.tSeen max tn, tSum = st.tSum + ts,
                           cSeen = st.cSeen max cn, cSum = st.cSum + cs)
            else if (d > st.pendDay) {
              val (st2, row) = closeDay(st, key)
              row.foreach(out += _)
              st = st2.copy(pendDay = d, tSeen = tn, tSum = ts,
                            cSeen = cn, cSum = cs)
            } // d < pendDay: closed days are final — ignored
          }
          state.update(st)
          out.iterator
      }
  }
}
