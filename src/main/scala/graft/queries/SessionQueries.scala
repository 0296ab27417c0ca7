package graft.queries

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session windows + multi-level aggregation — operators Catalyst gives
  * for free that the north-star pipeline needs (user sessionization for
  * event data, rollup reporting).
  */
object SessionQueries {

  /** q23 — sessionization: per-user sessions with a 30-minute inactivity
    * gap via `session_window` (batch form of the streaming operator).
    * Timestamps are second-truncated BEFORE sessionizing so boundary
    * decisions are identical across engines (ns vs µs precision).
    * Oracle: classic gaps-and-islands (lag + cumulative island id). */
  private def q23(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("user_id"), toSecond(col("ts")).as("ds"), cents(col("value")).as("v"))
      .groupBy(col("user_id"), session_window(col("ds"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("value_c"),
           min(col("ds")).as("session_start"), max(col("ds")).as("last_event"))
      .select(col("user_id"), col("session_start"), col("last_event"),
              col("n_events"), col("value_c"))

  private val q23Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ds,
      |         CAST(round(value*100) AS BIGINT) AS v
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ds, v,
      |         CASE WHEN ds - lag(ds) OVER (PARTITION BY user_id ORDER BY ds)
      |                   >= INTERVAL 30 MINUTE OR
      |              lag(ds) OVER (PARTITION BY user_id ORDER BY ds) IS NULL
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM e),
      |islands AS (
      |  SELECT user_id, ds, v,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ds
      |                                ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM flagged)
      |SELECT user_id, min(ds) AS session_start, max(ds) AS last_event,
      |       count(*) AS n_events, CAST(sum(v) AS BIGINT) AS value_c
      |FROM islands GROUP BY user_id, sid""".stripMargin

  /** q24 — rollup aggregation: revenue at (flag, status), (flag), and
    * grand-total levels in one pass, with explicit level markers. */
  private def q24(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev_c"), count(lit(1)).as("n"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("status"),
              col("rev_c"), col("n"))

  private val q24Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev_c,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** q25 — JSON-path extraction (the P1 dotted-path op on JSON-string
    * columns, `get_json_object` ≙ the reference's `pydash.get`): pull
    * props.k out of the event payload and aggregate it. */
  private def q25(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"),
           count(when(col("k") > 50, 1)).as("n_high"))

  private val q25Sql =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
      |  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
      |             THEN 1 END) AS n_high
      |FROM events GROUP BY 1""".stripMargin

  /** q26 — pivot: daily event counts, one column per event type (the
    * wide-format projection a feature table needs). */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    t(s, dir, "events")
      .groupBy(dayBucket(col("ts")).as("ds"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
      .na.fill(0L, types)
  }

  private val q26Sql =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS ds,
      |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
      |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
      |FROM events GROUP BY 1""".stripMargin

  /** q210 — cube aggregation (the q24 rollup's full-lattice twin):
    * revenue and counts at EVERY subset of (returnflag, linestatus),
    * with `grouping()` markers distinguishing real nulls from
    * subtotal rows — one pass, Catalyst expands the lattice
    * (4 grouping sets) with map-side partials per set. */
  private def q210(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev_c"),
           count(lit(1)).as("n"),
           grouping(col("l_returnflag")).cast("long").as("g_flag"),
           grouping(col("l_linestatus")).cast("long").as("g_status"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("status"),
              col("rev_c"), col("n"), col("g_flag"), col("g_status"))

  private val q210Sql =
    """SELECT coalesce(l_returnflag, 'ALL') AS flag,
      |       coalesce(l_linestatus, 'ALL') AS status,
      |       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
      |         AS rev_c,
      |       count(*) AS n,
      |       CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
      |       CAST(grouping(l_linestatus) AS BIGINT) AS g_status
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  /** q213 — time-weighted average (TWAP): per event type, the mean
    * value weighted by how long each observation "held" (the gap to
    * the next same-type event) — the correct average for irregularly
    * sampled state series, vs the naive mean that over-weights busy
    * periods. Holding durations from one keyed lead window; the last
    * observation carries zero weight (no forward extrapolation).
    * Exact integers: Σ(dur·v_c) div Σdur. */
  private def q213(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("sec"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("sec"),
        cents(col("value")).as("v_c"))
      .withColumn("dur", lead(col("sec"), 1).over(w) - col("sec"))
      .filter(col("dur").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_holds"), sum(col("dur")).as("total_dur"),
           sum(col("dur") * col("v_c")).as("wsum_c"))
      .select(col("event_type"), col("n_holds"), col("total_dur"),
        expr("wsum_c div total_dur").as("twap_c"))
  }

  private val q213Sql =
    """WITH e AS (SELECT event_type, event_id,
      |             epoch_ns(ts) // 1000000000 AS sec,
      |             CAST(round(value*100) AS BIGINT) AS v_c
      |           FROM events),
      |d AS (SELECT event_type,
      |        lead(sec) OVER (PARTITION BY event_type
      |                        ORDER BY sec, event_id) - sec AS dur,
      |        v_c
      |      FROM e)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_holds,
      |       CAST(sum(dur) AS BIGINT) AS total_dur,
      |       CAST(sum(dur * v_c) AS BIGINT) // CAST(sum(dur) AS BIGINT)
      |         AS twap_c
      |FROM d WHERE dur IS NOT NULL GROUP BY 1""".stripMargin

  /** q214 — A/B experiment analysis: users deterministically split
    * into two arms (user_id parity — in production, the h32 hash
    * split of q75), per-arm conversion = did the user purchase;
    * pooled two-proportion z statistic on the e6 grid from one
    * double expression (the classic experiment readout). Per-user
    * collapse is one keyed aggregate; arms are a 2-row frame. */
  private def q214(s: SparkSession, dir: String): DataFrame = {
    // conversion = a heavy purchaser (≥ 13 purchases, the corpus
    // median) — "made any purchase" saturates at 100% on this data,
    // which degenerates the pooled variance to zero (and the guard
    // below nulls z); a median split keeps both outcomes live
    val users = t(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(when(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
                  >= 13L, 1L).otherwise(0L).as("converted"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    val a = arms.filter(col("arm") === 0)
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = arms.filter(col("arm") === 1)
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    val p1 = col("conv_a").cast("double") / col("n_a")
    val p2 = col("conv_b").cast("double") / col("n_b")
    val pp = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b"))
    val z = (p1 - p2) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
    a.crossJoin(b).select(col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
      round(p1 * 1000000.0).cast("long").as("rate_a_e6"),
      round(p2 * 1000000.0).cast("long").as("rate_b_e6"),
      when(pp === 0.0 || pp === 1.0, lit(null))
        .otherwise(round(z * 1000000.0)).cast("long").as("z_e6"))
  }

  private val q214Sql =
    """WITH u AS (SELECT user_id,
      |             CASE WHEN sum(CASE WHEN event_type = 'purchase'
      |                               THEN 1 ELSE 0 END) >= 13
      |                  THEN 1 ELSE 0 END AS converted
      |           FROM events GROUP BY 1),
      |arms AS (SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n,
      |                CAST(sum(converted) AS BIGINT) AS conv
      |         FROM u GROUP BY 1),
      |a AS (SELECT n AS n_a, conv AS conv_a FROM arms WHERE arm = 0),
      |b AS (SELECT n AS n_b, conv AS conv_b FROM arms WHERE arm = 1)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  CAST(round(CAST(conv_a AS DOUBLE) / n_a * 1000000.0) AS BIGINT)
      |    AS rate_a_e6,
      |  CAST(round(CAST(conv_b AS DOUBLE) / n_b * 1000000.0) AS BIGINT)
      |    AS rate_b_e6,
      |  CASE WHEN CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) = 0.0
      |         OR CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) = 1.0
      |       THEN NULL
      |       ELSE CAST(round((CAST(conv_a AS DOUBLE) / n_a
      |              - CAST(conv_b AS DOUBLE) / n_b)
      |         / sqrt(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)
      |                * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
      |                * (1.0 / n_a + 1.0 / n_b)) * 1000000.0) AS BIGINT)
      |  END AS z_e6
      |FROM a CROSS JOIN b""".stripMargin

  /** q165 — interval (range) join ([[graft.joins.RangeJoin.rangeJoin]]):
    * attribute every event to each same-user 2-hour window anchored at
    * every 50th event — `ts BETWEEN start AND end` matching that Spark
    * would otherwise plan as BroadcastNestedLoopJoin, decomposed into
    * the bucketized (user, overlap-bucket) hash equi-join + residual
    * filter. One aggregate row per window; the oracle computes the
    * naive BETWEEN join (DuckDB's IEJoin handles it at oracle scale),
    * so the decomposition's exactness is hash-checked. */
  private def q165(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts").cast("timestamp").cast("long").as("sec"))
    val windows = ev.filter(pmod(col("event_id"), lit(50)) === 0)
      .select(col("event_id").as("window_id"), col("user_id"),
              col("sec").as("start_sec"), (col("sec") + 7200L).as("end_sec"))
    graft.joins.RangeJoin.rangeJoin(
        ev, windows, "sec", "start_sec", "end_sec",
        keyCols = Seq("user_id"), bucketWidth = 3600L)
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"),
           min(col("sec")).as("min_sec"), max(col("sec")).as("max_sec"))
  }

  private val q165Sql =
    """WITH ev AS (SELECT event_id, user_id,
      |              epoch_ns(ts) // 1000000000 AS sec FROM events),
      |iv AS (SELECT event_id AS window_id, user_id,
      |              sec AS start_sec, sec + 7200 AS end_sec
      |       FROM ev WHERE event_id % 50 = 0)
      |SELECT iv.window_id, CAST(count(*) AS BIGINT) AS n_events,
      |       min(ev.sec) AS min_sec, max(ev.sec) AS max_sec
      |FROM iv JOIN ev ON ev.user_id = iv.user_id
      |                AND ev.sec BETWEEN iv.start_sec AND iv.end_sec
      |GROUP BY 1""".stripMargin

  /** q166 — ordered funnel ([[graft.ts.EventAnalytics.funnel]]):
    * view → click → purchase within 7 days of first touch, per-user
    * earliest-qualifying-event semantics (stage k must be AT OR AFTER
    * stage k−1 and inside the window from stage 1). (#stages − 1)
    * keyed joins, no window partitions; the oracle replays the CTE
    * chain with identical BETWEEN bounds. */
  private def q166(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts").cast("timestamp").cast("long").as("sec"))
    graft.ts.EventAnalytics.funnel(ev, "user_id", "event_type", "sec",
      Seq("view", "click", "purchase"), windowSec = 604800L)
  }

  private val q166Sql =
    """WITH ev AS (SELECT user_id, event_type AS et,
      |              epoch_ns(ts) // 1000000000 AS sec FROM events),
      |s1 AS (SELECT user_id, min(sec) AS t1_sec FROM ev
      |       WHERE et = 'view' GROUP BY 1),
      |s2 AS (SELECT ev.user_id, min(ev.sec) AS t2_sec
      |       FROM ev JOIN s1 USING (user_id)
      |       WHERE ev.et = 'click' AND ev.sec >= s1.t1_sec
      |         AND ev.sec <= s1.t1_sec + 604800
      |       GROUP BY 1),
      |s3 AS (SELECT ev.user_id, min(ev.sec) AS t3_sec
      |       FROM ev JOIN s1 USING (user_id) JOIN s2 USING (user_id)
      |       WHERE ev.et = 'purchase' AND ev.sec >= s2.t2_sec
      |         AND ev.sec <= s1.t1_sec + 604800
      |       GROUP BY 1)
      |SELECT s1.user_id, s1.t1_sec, s2.t2_sec, s3.t3_sec,
      |       CAST(1 + CASE WHEN s2.t2_sec IS NOT NULL THEN 1 ELSE 0 END
      |              + CASE WHEN s3.t3_sec IS NOT NULL THEN 1 ELSE 0 END
      |            AS BIGINT) AS depth
      |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin

  /** q167 — cohort retention ([[graft.ts.EventAnalytics
    * .cohortRetention]]): users grouped by first active week, counted
    * in every later active week — the retention matrix in long form.
    * Monday-aligned week buckets (the q03 grain parity), two keyed
    * aggregates + one keyed join. */
  private def q167(s: SparkSession, dir: String): DataFrame =
    graft.ts.EventAnalytics.cohortRetention(t(s, dir, "events"), "user_id", "ts")

  private val q167Sql =
    """WITH act AS (SELECT DISTINCT user_id,
      |               CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
      |coh AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1)
      |SELECT coh.cohort_wk,
      |       CAST((act.wk - coh.cohort_wk) // 7 AS BIGINT) AS offset_weeks,
      |       CAST(count(*) AS BIGINT) AS n_users
      |FROM act JOIN coh USING (user_id) GROUP BY 1, 2""".stripMargin

  /** q280 — cohort LTV ledger ([[graft.ts.EventAnalytics.cohortLtv]]):
    * q167's retention matrix extended with purchase revenue — active
    * share (exact micros) and cumulative revenue per cohort member,
    * the division applied once to the running sum. */
  private def q280(s: SparkSession, dir: String): DataFrame =
    graft.ts.EventAnalytics.cohortLtv(
      t(s, dir, "events"), "user_id", "ts", "event_type", "value",
      convType = "purchase")

  private val q280Sql =
    """WITH act AS (SELECT DISTINCT user_id,
      |               CAST(date_trunc('week', ts) AS DATE) AS wk
      |             FROM events),
      |coh AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1),
      |n0 AS (SELECT cohort_wk, CAST(count(*) AS BIGINT) AS n0
      |       FROM coh GROUP BY 1),
      |ret AS (SELECT coh.cohort_wk,
      |          CAST((act.wk - coh.cohort_wk) // 7 AS BIGINT)
      |            AS offset_weeks,
      |          CAST(count(*) AS BIGINT) AS n_active
      |        FROM act JOIN coh USING (user_id) GROUP BY 1, 2),
      |rev AS (SELECT coh.cohort_wk,
      |          CAST((CAST(date_trunc('week', e.ts) AS DATE)
      |                - coh.cohort_wk) // 7 AS BIGINT) AS offset_weeks,
      |          CAST(sum(CAST(round(e.value * 100) AS BIGINT))
      |            AS BIGINT) AS rev_c
      |        FROM events e JOIN coh ON e.user_id = coh.user_id
      |        WHERE e.event_type = 'purchase' GROUP BY 1, 2),
      |base AS (SELECT ret.cohort_wk, ret.offset_weeks, ret.n_active,
      |           coalesce(rev.rev_c, 0) AS rev_c
      |         FROM ret LEFT JOIN rev USING (cohort_wk, offset_weeks))
      |SELECT base.cohort_wk, offset_weeks, n0.n0, n_active,
      |  (n_active * 1000000) // n0.n0 AS retention_e6,
      |  CAST(rev_c AS BIGINT) AS rev_c,
      |  CAST(CAST(sum(rev_c) OVER (PARTITION BY base.cohort_wk
      |    ORDER BY offset_weeks ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |    // n0.n0 AS BIGINT) AS cum_ltv_c
      |FROM base JOIN n0 ON base.cohort_wk = n0.cohort_wk""".stripMargin

  /** q287 — funnel-conformance alignment
    * ([[graft.ts.SeqAlign.alignToReference]]): each user-day's event
    * sequence globally aligned (Needleman–Wunsch, match +2 /
    * mismatch −1 / gap −1, exact max-plus longs) against the
    * canonical signup→view→click→purchase path — insert/delete
    * tolerant conformance the subsequence-only funnel can't score.
    * The oracle replays the DP anti-diagonally (the q279 pattern,
    * max-plus with real boundary rows). */
  private def q287(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeqAlign.alignToReference(
      t(s, dir, "events").select(col("user_id"),
        dayBucket(col("ts")).as("d"), col("event_type"),
        col("ts").cast("timestamp").cast("long").as("sec"),
        col("event_id")),
      "user_id", "d", "event_type", Seq("sec", "event_id"),
      reference = Seq("signup", "view", "click", "purchase"))

  private val q287Sql =
    """WITH RECURSIVE ev AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d,
      |         event_type AS et, epoch_ns(ts) // 1000000000 AS sec,
      |         event_id
      |  FROM events),
      |ser AS (SELECT user_id, d,
      |          list(et ORDER BY sec, event_id) AS va,
      |          CAST(count(*) AS BIGINT) AS n
      |        FROM ev GROUP BY 1, 2 HAVING count(*) <= 64),
      |rec AS (
      |  SELECT user_id, d, va, n, CAST(0 AS BIGINT) AS dg,
      |    list_transform(generate_series(0, CAST(n AS INT)),
      |      i -> CASE WHEN i = 0 THEN CAST(0 AS BIGINT)
      |           ELSE CAST(-4000000000000000 AS BIGINT) END) AS cur,
      |    list_transform(generate_series(0, CAST(n AS INT)),
      |      i -> CAST(-4000000000000000 AS BIGINT)) AS prv
      |  FROM ser
      |  UNION ALL
      |  SELECT user_id, d, va, n, dg + 1,
      |    list_transform(generate_series(0, CAST(n AS INT)), i ->
      |      CASE WHEN i > n OR (dg + 1) - i < 0 OR (dg + 1) - i > 4
      |             THEN CAST(-4000000000000000 AS BIGINT)
      |           WHEN i = 0 THEN CAST(-(dg + 1) AS BIGINT)
      |           WHEN (dg + 1) - i = 0 THEN CAST(-i AS BIGINT)
      |           ELSE greatest(
      |             prv[CAST(i AS INT)] +
      |               CASE WHEN va[CAST(i AS INT)] =
      |                 (['signup','view','click','purchase'])
      |                   [CAST((dg + 1) - i AS INT)]
      |               THEN 2 ELSE -1 END,
      |             cur[CAST(i AS INT)] - 1,
      |             cur[CAST(i + 1 AS INT)] - 1)
      |      END) AS cur,
      |    cur AS prv
      |  FROM rec WHERE dg < n + 4)
      |SELECT user_id, d, n AS n_events,
      |  cur[CAST(n + 1 AS INT)] AS score
      |FROM rec WHERE dg = n + 4""".stripMargin

  /** q185 — event-type transition matrix
    * ([[graft.ts.EventAnalytics.transitionMatrix]]): first-order
    * Markov step counts + per-from-type probabilities over each
    * user's (second, event_id)-ordered stream. The oracle replays
    * the lead window on the identical total order, both aggregates,
    * and the micro-rounded normalize. */
  private def q185(s: SparkSession, dir: String): DataFrame =
    graft.ts.EventAnalytics.transitionMatrix(
      t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")

  private val q185Sql =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |         CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec, event_id
      |  FROM events),
      |st AS (
      |  SELECT user_id, event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY sec, event_id) AS to_type
      |  FROM e),
      |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM st WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      |      FROM c GROUP BY 1)
      |SELECT c.from_type, c.to_type, c.n, m.n_from,
      |       round(c.n * 1.0 / m.n_from, 6) AS p
      |FROM c JOIN m USING (from_type)""".stripMargin

  /** q186 — RFM segmentation
    * ([[graft.ts.EventAnalytics.rfmSegments]]): per-user recency /
    * frequency / monetary quintile scores + composite segment. The
    * oracle computes single-window ranks over (metric, user_id) and
    * the same even-spread `(rank0·5) div total + 1` bucket rule (the
    * q174 convention — deliberately not SQL ntile's front-loaded
    * remainder), pinning the grid decomposition to the naive form. */
  private def q186(s: SparkSession, dir: String): DataFrame =
    graft.ts.EventAnalytics.rfmSegments(
      t(s, dir, "events"), "user_id", "ts", "value")

  private val q186Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |u AS (SELECT user_id, CAST(epoch(max(sec)) AS BIGINT) AS last_sec,
      |             CAST(count(*) AS BIGINT) AS freq,
      |             CAST(sum(v) AS BIGINT) AS mon_c
      |      FROM e GROUP BY 1),
      |refc AS (SELECT max(last_sec) AS ref_sec FROM u),
      |b AS (SELECT user_id,
      |             CAST((refc.ref_sec - u.last_sec) // 86400 AS BIGINT)
      |               AS recency_days,
      |             freq, mon_c
      |      FROM u CROSS JOIN refc),
      |tot AS (SELECT count(*) AS n_total FROM b),
      |rk AS (SELECT user_id, recency_days, freq, mon_c,
      |         row_number() OVER (ORDER BY recency_days, user_id) - 1 AS r0,
      |         row_number() OVER (ORDER BY freq, user_id) - 1 AS f0,
      |         row_number() OVER (ORDER BY mon_c, user_id) - 1 AS m0
      |       FROM b),
      |sc AS (SELECT user_id, recency_days, freq, mon_c,
      |         CAST(6 - ((r0 * 5) // n_total + 1) AS BIGINT) AS r,
      |         CAST((f0 * 5) // n_total + 1 AS BIGINT) AS f,
      |         CAST((m0 * 5) // n_total + 1 AS BIGINT) AS m
      |       FROM rk CROSS JOIN tot)
      |SELECT user_id, recency_days, freq, mon_c, r, f, m,
      |       r * 100 + f * 10 + m AS segment
      |FROM sc""".stripMargin

  /** q187 — decay-weighted trending
    * ([[graft.ts.EventAnalytics.decayedTrending]], half-life 7 days):
    * per-type exact counts + e6 micro-grid decayed scores + rank.
    * The oracle replays the per-event decay weight (single pow
    * expression, rounded before the sum) and the alphabet-sized rank
    * window. */
  private def q187(s: SparkSession, dir: String): DataFrame =
    graft.ts.EventAnalytics.decayedTrending(
      t(s, dir, "events"), "event_type", "ts", halfLifeDays = 7.0)

  private val q187Sql =
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS sec
      |  FROM events),
      |refc AS (SELECT max(sec) AS ref_sec FROM e),
      |sc AS (SELECT event_type,
      |         CAST(round(pow(2.0, -((refc.ref_sec - sec) / 86400.0) / 7.0)
      |                    * 1e6) AS BIGINT) AS w_e6
      |       FROM e CROSS JOIN refc),
      |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |              CAST(sum(w_e6) AS BIGINT) AS score_e6
      |       FROM sc GROUP BY 1)
      |SELECT event_type, n_events, score_e6,
      |       CAST(row_number() OVER (ORDER BY score_e6 DESC, event_type)
      |            AS BIGINT) AS trend_rank
      |FROM ag""".stripMargin

  /** q189 — calendar gap-fill + linear interpolation
    * ([[graft.ts.SeriesOps.gapFill]]): per-type daily revenue with
    * deterministic holes punched (every 7th day-of-month dropped) so
    * both fill branches fire, regridded to the full per-series
    * calendar and linearly interpolated on the exact cents grid. The
    * oracle replays the grid (`generate_series`), the four
    * IGNORE-NULLS anchor windows, and the single-round interpolation
    * expression. */
  private def q189(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .filter(dayofmonth(col("ts")) % 7 =!= 0)
      .groupBy(col("event_type"), dayBucket(col("ts")).as("d"))
      .agg(sum(cents(col("value"))).as("v_c"))
    graft.ts.SeriesOps.gapFill(daily, "event_type", "d", "v_c")
  }

  private val q189Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v_c
      |  FROM events WHERE date_part('day', ts) % 7 <> 0 GROUP BY 1, 2),
      |spans AS (SELECT event_type, min(d) AS d0, max(d) AS d1
      |          FROM daily GROUP BY 1),
      |grid AS (SELECT event_type,
      |           CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      |         FROM spans),
      |j AS (SELECT g.event_type, g.d, daily.v_c AS obs_c
      |      FROM grid g LEFT JOIN daily
      |        ON daily.event_type = g.event_type AND daily.d = g.d),
      |a AS (SELECT event_type, d, obs_c,
      |        last_value(obs_c IGNORE NULLS) OVER w AS prev_c,
      |        last_value(CASE WHEN obs_c IS NOT NULL THEN d END IGNORE NULLS)
      |          OVER w AS prev_d,
      |        first_value(obs_c IGNORE NULLS) OVER w2 AS next_c,
      |        first_value(CASE WHEN obs_c IS NOT NULL THEN d END IGNORE NULLS)
      |          OVER w2 AS next_d
      |      FROM j WINDOW
      |        w AS (PARTITION BY event_type ORDER BY d ROWS UNBOUNDED PRECEDING),
      |        w2 AS (PARTITION BY event_type ORDER BY d
      |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT event_type, d, obs_c,
      |  CAST(CASE WHEN obs_c IS NOT NULL THEN obs_c
      |            WHEN prev_c IS NULL THEN next_c
      |            WHEN next_c IS NULL THEN prev_c
      |            ELSE CAST(round(prev_c + (next_c - prev_c) * (d - prev_d)
      |                            * 1.0 / (next_d - prev_d)) AS BIGINT)
      |       END AS BIGINT) AS filled_c,
      |  CAST(CASE WHEN obs_c IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
      |FROM a""".stripMargin

  /** q190 — CUSUM change-point location
    * ([[graft.ts.SeriesOps.cusumChangepoint]]): per-type daily event
    * counts, deviations kept exact by n_days-scaling, earliest-argmax
    * |cusum| day per series. The oracle replays the running-sum and
    * rank windows on the identical integer statistic. */
  private def q190(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), dayBucket(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    graft.ts.SeriesOps.cusumChangepoint(daily, "event_type", "d", "cnt")
  }

  private val q190Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |              CAST(sum(cnt) AS BIGINT) AS total_n
      |       FROM daily GROUP BY 1),
      |cu AS (SELECT daily.event_type, daily.d, st.n_days, st.total_n,
      |         sum(daily.cnt * st.n_days - st.total_n)
      |           OVER (PARTITION BY daily.event_type ORDER BY daily.d
      |                 ROWS UNBOUNDED PRECEDING) AS cusum
      |       FROM daily JOIN st USING (event_type)),
      |pk AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |                 ORDER BY abs(cusum) DESC, d) AS rk FROM cu)
      |SELECT event_type, d AS change_d,
      |       CAST(abs(cusum) AS BIGINT) AS max_abs_cusum, n_days, total_n
      |FROM pk WHERE rk = 1""".stripMargin

  /** q191 — robust seasonal-profile outliers
    * ([[graft.ts.SeriesOps.seasonalOutliers]]): per (type, ISO
    * weekday, hour) cell, exact lower median + MAD of the cents
    * value and the count beyond 5·MAD. The oracle replays both
    * median passes on the identical (value, event_id) total order. */
  private def q191(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.seasonalOutliers(
      t(s, dir, "events").select(col("event_type"), col("ts"),
        cents(col("value")).as("v"), col("event_id")),
      "event_type", "ts", "v", "event_id", k = 5)

  private val q191Sql =
    """WITH c AS (
      |  SELECT event_type AS key,
      |         CAST(date_part('isodow', ts) AS BIGINT) AS isodow,
      |         CAST(date_part('hour', ts) AS BIGINT) AS hour,
      |         CAST(round(value*100) AS BIGINT) AS v, event_id AS eid
      |  FROM events),
      |m1 AS (
      |  SELECT key, isodow, hour, v AS med_c FROM (
      |    SELECT key, isodow, hour, v,
      |           row_number() OVER (PARTITION BY key, isodow, hour
      |                              ORDER BY v, eid) AS rn,
      |           count(*) OVER (PARTITION BY key, isodow, hour) AS cnt
      |    FROM c) WHERE rn = (cnt + 1) // 2),
      |d AS (
      |  SELECT c.key, c.isodow, c.hour, c.v, c.eid, m1.med_c,
      |         abs(c.v - m1.med_c) AS dev
      |  FROM c JOIN m1 USING (key, isodow, hour)),
      |m2 AS (
      |  SELECT key, isodow, hour, dev AS mad_c FROM (
      |    SELECT key, isodow, hour, dev,
      |           row_number() OVER (PARTITION BY key, isodow, hour
      |                              ORDER BY dev, eid) AS rn,
      |           count(*) OVER (PARTITION BY key, isodow, hour) AS cnt
      |    FROM d) WHERE rn = (cnt + 1) // 2)
      |SELECT d.key AS event_type, d.isodow, d.hour,
      |       CAST(count(*) AS BIGINT) AS n,
      |       max(d.med_c) AS med_c, max(m2.mad_c) AS mad_c,
      |       CAST(sum(CASE WHEN d.dev > 5 * m2.mad_c THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_outliers
      |FROM d JOIN m2 USING (key, isodow, hour)
      |GROUP BY 1, 2, 3""".stripMargin

  /** q196 — interval coalescing ([[graft.ts.SeriesOps
    * .mergeIntervals]]): every event opens a 30-minute activity
    * interval; overlapping-or-touching intervals per user merge into
    * maximal busy periods (the interval-union twin of q23's
    * session_window, built from explicit ranges instead of
    * gap-to-next semantics). The oracle replays the running-max /
    * flag / cumsum windows on the identical total order. */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").cast("long").as("start_sec"))
      .withColumn("end_sec", col("start_sec") + 1800L)
    graft.ts.SeriesOps.mergeIntervals(iv, "user_id", "start_sec", "end_sec",
      "event_id")
  }

  private val q196Sql =
    """WITH iv AS (
      |  SELECT user_id, event_id,
      |         epoch_ns(ts) // 1000000000 AS start_sec,
      |         epoch_ns(ts) // 1000000000 + 1800 AS end_sec
      |  FROM events),
      |fl AS (SELECT user_id, event_id, start_sec, end_sec,
      |         max(end_sec) OVER (PARTITION BY user_id
      |           ORDER BY start_sec, end_sec, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
      |       FROM iv),
      |fg AS (SELECT *, CASE WHEN pme IS NULL OR start_sec > pme
      |                      THEN 1 ELSE 0 END AS nf FROM fl),
      |ci AS (SELECT *, sum(nf) OVER (PARTITION BY user_id
      |          ORDER BY start_sec, end_sec, event_id
      |          ROWS UNBOUNDED PRECEDING) AS island FROM fg)
      |SELECT user_id, min(start_sec) AS island_start,
      |       max(end_sec) AS island_end,
      |       CAST(count(*) AS BIGINT) AS n_intervals
      |FROM ci GROUP BY user_id, island""".stripMargin

  private def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), dayBucket(col("ts")).as("d"))
      .agg(sum(cents(col("value"))).as("v_c"))

  private val dailyRevenueSql =
    """SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v_c
      |  FROM events GROUP BY 1, 2""".stripMargin

  /** q199 — truncated-EWMA smoothing ([[graft.ts.SeriesOps
    * .ewmaSmooth]], α = 0.8, 8 taps): per-type daily revenue
    * smoothed with driver-computed e6 weights; the oracle embeds the
    * IDENTICAL weight literals ([[graft.ts.SeriesOps.ewmaWeights]])
    * in an unrolled lag chain. */
  private def q199(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.ewmaSmooth(dailyRevenue(s, dir),
      "event_type", "d", "v_c", alpha = 0.8, taps = 8)

  private val q199Sql = {
    val ws = graft.ts.SeriesOps.ewmaWeights(0.8, 8)
    def tap(k: Int) = s"lag(v_c, $k) OVER w"
    val num = ws.zipWithIndex.map { case (wk, k) =>
      s"CASE WHEN ${tap(k)} IS NOT NULL THEN $wk * ${tap(k)} ELSE 0 END"
    }.mkString("\n      + ")
    val den = ws.zipWithIndex.map { case (wk, k) =>
      s"CASE WHEN ${tap(k)} IS NOT NULL THEN $wk ELSE 0 END"
    }.mkString("\n      + ")
    s"""WITH daily AS (
      |  $dailyRevenueSql)
      |SELECT event_type, d, v_c,
      |  ($num)
      |  // ($den) AS smooth_c
      |FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)""".stripMargin
  }

  /** q201 — trailing 30-day rolling aggregates ([[graft.ts.SeriesOps
    * .rollingDaily]]): RANGE frame over the integer day index (gaps
    * genuinely shrink the window), exact integer sum/count and the
    * meanFromCents-derived average. */
  private def q201(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.rollingDaily(dailyRevenue(s, dir),
      "event_type", "d", "v_c", windowDays = 30)

  private val q201Sql =
    s"""WITH daily AS (
      |  $dailyRevenueSql),
      |r AS (SELECT event_type, d, v_c,
      |        CAST(d - DATE '1970-01-01' AS BIGINT) AS di FROM daily)
      |SELECT event_type, d, v_c,
      |  CAST(sum(v_c) OVER w AS BIGINT) AS roll_sum_c,
      |  CAST(count(*) OVER w AS BIGINT) AS roll_n,
      |  round(sum(v_c) OVER w / 100.0 / count(*) OVER w, 6) AS roll_avg
      |FROM r WINDOW w AS (PARTITION BY event_type ORDER BY di
      |                    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)""".stripMargin

  /** q205 — per-series OLS linear trend ([[graft.ts.SeriesOps
    * .linearTrend]]): slope / intercept / r² of each type's daily
    * event-count series, single-expression doubles over exact
    * integer sums (x re-based to the series start by a keyed min
    * window). The oracle mirrors every expression — including which
    * products stay long and which go double — verbatim. */
  private def q205(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.linearTrend(
      t(s, dir, "events")
        .groupBy(col("event_type"), dayBucket(col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt")),
      "event_type", "d", "cnt")

  private val q205Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |x AS (SELECT event_type, cnt,
      |        CAST(d - DATE '1970-01-01' AS BIGINT)
      |          - min(CAST(d - DATE '1970-01-01' AS BIGINT))
      |            OVER (PARTITION BY event_type) AS x
      |      FROM daily),
      |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(x) AS BIGINT) AS sx,
      |             CAST(sum(cnt) AS BIGINT) AS sy,
      |             CAST(sum(x*cnt) AS BIGINT) AS sxy,
      |             CAST(sum(x*x) AS BIGINT) AS sxx,
      |             CAST(sum(cnt*cnt) AS BIGINT) AS syy
      |      FROM x GROUP BY 1)
      |SELECT event_type, n AS n_days,
      |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
      |       ELSE CAST(round((n*sxy - sx*sy) * 1000000.0
      |                       / (n*sxx - sx*sx)) AS BIGINT) END AS slope_e6,
      |  CASE WHEN n*sxx - sx*sx = 0 THEN NULL
      |       ELSE CAST(round((sy*sxx - sx*sxy) * 1000000.0
      |                       / (n*sxx - sx*sx)) AS BIGINT) END AS intercept_e6,
      |  CASE WHEN n*sxx - sx*sx = 0
      |         OR CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy = 0 THEN NULL
      |       ELSE CAST(round(CAST(n*sxy - sx*sy AS DOUBLE) * (n*sxy - sx*sy)
      |                 * 1000000.0
      |                 / (CAST(n*sxx - sx*sx AS DOUBLE)
      |                    * (CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy)))
      |            AS BIGINT) END AS r2_e6
      |FROM g""".stripMargin

  /** q207 — last-touch attribution ([[graft.ts.EventAnalytics
    * .lastTouchAttribution]]): every purchase attributed to the
    * user's most recent view/click within 7 days, via the backward
    * as-of join (keyed union + running-last window — no range
    * explosion). The oracle uses DuckDB's native ASOF LEFT JOIN over
    * touches pre-collapsed to one per (user, second) with the same
    * max-(event_id) tie rule, proving the window-sort as-of ≡ ASOF. */
  private def q207(s: SparkSession, dir: String): DataFrame =
    graft.ts.EventAnalytics.lastTouchAttribution(
      t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click"), convType = "purchase",
      windowSec = 604800L)

  private val q207Sql =
    """WITH e AS (SELECT user_id, event_type AS et,
      |             epoch_ns(ts) // 1000000000 AS sec, event_id AS eid
      |           FROM events),
      |t AS (SELECT user_id, sec, arg_max(et, eid) AS touch_type,
      |             max(eid) AS touch_id
      |      FROM e WHERE et IN ('view', 'click') GROUP BY 1, 2),
      |p AS (SELECT user_id, sec, eid AS conv_id FROM e
      |      WHERE et = 'purchase')
      |SELECT p.user_id, p.sec AS conv_sec, p.conv_id,
      |  CASE WHEN t.sec IS NOT NULL AND p.sec - t.sec <= 604800
      |       THEN t.touch_type END AS touch_type,
      |  CASE WHEN t.sec IS NOT NULL AND p.sec - t.sec <= 604800
      |       THEN t.sec END AS touch_sec,
      |  CASE WHEN t.sec IS NOT NULL AND p.sec - t.sec <= 604800
      |       THEN p.sec - t.sec END AS age_sec
      |FROM p ASOF LEFT JOIN t
      |  ON p.user_id = t.user_id AND t.sec <= p.sec""".stripMargin

  /** q275 — multi-touch attribution
    * ([[graft.ts.MultiTouch.multiTouchAttribution]]): linear,
    * U-shaped, and time-decay credit per channel for every purchase's
    * 7-day touch window. Linear/U-shape micro-shares sum to exactly
    * 1e6 per conversion (largest-remainder rule on the touch rank);
    * decay is one fixed-shape IEEE expression with a shared ln 2
    * literal. Pairing rides the bucketized interval join. */
  private def q275(s: SparkSession, dir: String): DataFrame =
    graft.ts.MultiTouch.multiTouchAttribution(
      t(s, dir, "events"), "user_id", "event_type", "ts", "event_id",
      touchTypes = Seq("view", "click"), convType = "purchase",
      windowSec = 604800L)

  private val q275Sql =
    """WITH e AS (SELECT user_id, event_type AS et,
      |             epoch_ns(ts) // 1000000000 AS sec, event_id AS eid
      |           FROM events),
      |tch AS (SELECT user_id, et AS touch_type, sec AS t_sec,
      |          eid AS touch_id
      |        FROM e WHERE et IN ('view', 'click')),
      |cv AS (SELECT user_id, eid AS conv_id, sec - 604800 AS w_start,
      |         sec AS c_sec
      |       FROM e WHERE et = 'purchase'),
      |j AS (SELECT t.touch_type, t.t_sec, t.touch_id, c.conv_id,
      |        c.c_sec
      |      FROM tch t JOIN cv c ON t.user_id = c.user_id
      |        AND t.t_sec >= c.w_start AND t.t_sec <= c.c_sec),
      |r AS (SELECT *,
      |        CAST(row_number() OVER (PARTITION BY conv_id
      |          ORDER BY t_sec, touch_id) AS BIGINT) AS rk,
      |        CAST(count(*) OVER (PARTITION BY conv_id) AS BIGINT) AS n
      |      FROM j),
      |cr AS (SELECT touch_type, conv_id,
      |  (1000000 // n) + CASE WHEN rk <= 1000000 % n THEN 1 ELSE 0 END
      |    AS linear_e6,
      |  CASE WHEN n = 1 THEN 1000000 WHEN n = 2 THEN 500000
      |       WHEN rk = 1 THEN 400000 WHEN rk = n THEN 400000
      |       ELSE (200000 // (n - 2)) +
      |         CASE WHEN rk - 1 <= 200000 % (n - 2) THEN 1 ELSE 0 END
      |       END AS ushape_e6,
      |  CAST(round(exp(-0.6931471805599453 * (c_sec - t_sec)
      |    / 86400.0) * 1000000.0) AS BIGINT) AS decay_e6
      |  FROM r)
      |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
      |  CAST(sum(linear_e6) AS BIGINT) AS linear_e6,
      |  CAST(sum(ushape_e6) AS BIGINT) AS ushape_e6,
      |  CAST(sum(decay_e6) AS BIGINT) AS decay_e6
      |FROM cr GROUP BY 1""".stripMargin

  /** q208 — cross-series correlation matrix ([[graft.ts.SeriesOps
    * .pairwiseCorr]]): Pearson between every pair of event types'
    * daily count series, closed-form sums with the documented
    * long→double split, sqrt IEEE-identical. */
  private def q208(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.pairwiseCorr(
      t(s, dir, "events")
        .groupBy(col("event_type"), dayBucket(col("ts")).as("d"))
        .agg(count(lit(1)).as("cnt")),
      "event_type", "d", "cnt")

  private val q208Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |g AS (SELECT a.event_type AS key_a, b.event_type AS key_b,
      |        CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(a.cnt) AS BIGINT) AS sa,
      |        CAST(sum(b.cnt) AS BIGINT) AS sb,
      |        CAST(sum(a.cnt * b.cnt) AS BIGINT) AS sab,
      |        CAST(sum(a.cnt * a.cnt) AS BIGINT) AS saa,
      |        CAST(sum(b.cnt * b.cnt) AS BIGINT) AS sbb
      |      FROM daily a JOIN daily b
      |        ON a.d = b.d AND a.event_type < b.event_type
      |      GROUP BY 1, 2)
      |SELECT key_a, key_b, n AS n_days,
      |  CASE WHEN CAST(n AS DOUBLE)*saa - CAST(sa AS DOUBLE)*sa <= 0
      |         OR CAST(n AS DOUBLE)*sbb - CAST(sb AS DOUBLE)*sb <= 0
      |       THEN NULL
      |       ELSE CAST(round((CAST(n AS DOUBLE)*sab - CAST(sa AS DOUBLE)*sb)
      |              * 1000000.0
      |              / sqrt((CAST(n AS DOUBLE)*saa - CAST(sa AS DOUBLE)*sa)
      |                     * (CAST(n AS DOUBLE)*sbb - CAST(sb AS DOUBLE)*sb)))
      |            AS BIGINT) END AS corr_e6
      |FROM g""".stripMargin

  /** q220 — 2-D skyline ([[graft.stats.Skyline.skyline2d]]): per
    * brand, the price/size Pareto frontier of its parts
    * (cheapest-yet-largest — no other part of the same brand is both
    * ≤ price and ≥ size with one strict). Grid running-max
    * decomposition, no pairwise join; the oracle replays grid,
    * running max, and cover join. */
  private def q220(s: SparkSession, dir: String): DataFrame =
    graft.stats.Skyline.skyline2d(
      t(s, dir, "part").select(col("p_brand"), col("p_partkey"),
        cents(col("p_retailprice")).as("price_c"), col("p_size")),
      "p_brand", "p_partkey", "price_c", "p_size")

  private val q220Sql =
    """WITH r AS (SELECT p_brand, p_partkey,
      |                  CAST(round(p_retailprice*100) AS BIGINT) AS x,
      |                  CAST(p_size AS BIGINT) AS y FROM part),
      |grid AS (SELECT p_brand, x, max(y) AS ymax FROM r GROUP BY 1, 2),
      |f AS (SELECT p_brand, x, ymax,
      |        max(ymax) OVER (PARTITION BY p_brand ORDER BY x
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
      |      FROM grid)
      |SELECT r.p_brand, r.p_partkey, r.x, r.y
      |FROM r JOIN f ON f.p_brand = r.p_brand AND f.x = r.x AND r.y = f.ymax
      |WHERE f.m1 IS NULL OR f.m1 < f.ymax""".stripMargin

  /** q221 — rolling-origin seasonal-naive backtest ([[graft.ts
    * .SeriesOps.seasonalNaiveBacktest]], season 7, 8 origins,
    * horizons 1–7): per (event_type, horizon) MAE and sMAPE of the
    * week-ago-naive yardstick on daily revenue — the oracle-checkable
    * half of forecast evaluation (the structural fitter's backtests
    * are golden-pinned). The oracle replays the origin grid, both
    * alignment joins, and the exact metric arithmetic. */
  private def q221(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.seasonalNaiveBacktest(dailyRevenue(s, dir),
      "event_type", "d", "v_c", season = 7, nOrigins = 8, horizons = 1 to 7)

  private val q221Sql =
    s"""WITH daily AS (
      |  $dailyRevenueSql),
      |mx AS (SELECT event_type, max(d) AS dmax FROM daily GROUP BY 1),
      |org AS (SELECT event_type, dmax - CAST(7 + j AS INTEGER) AS o
      |        FROM mx, unnest(generate_series(0, 7)) AS t(j)),
      |grid AS (SELECT event_type, o, h, o + CAST(h AS INTEGER) AS target_d,
      |                o + CAST(h - 7 AS INTEGER) AS base_d
      |         FROM org, unnest(generate_series(1, 7)) AS s(h)),
      |p AS (SELECT g.event_type, CAST(g.h AS BIGINT) AS h,
      |             a.v_c AS y_c, b.v_c AS p_c
      |      FROM grid g
      |      JOIN daily a ON a.event_type = g.event_type AND a.d = g.target_d
      |      JOIN daily b ON b.event_type = g.event_type AND b.d = g.base_d)
      |SELECT event_type, h, CAST(count(*) AS BIGINT) AS n_pairs,
      |       CAST(round(avg(abs(y_c - p_c))) AS BIGINT) AS mae_c,
      |       round(avg(CASE WHEN abs(y_c) + abs(p_c) = 0 THEN 0.0
      |                 ELSE 2.0*abs(y_c - p_c)/(abs(y_c) + abs(p_c)) END), 6)
      |         AS smape
      |FROM p GROUP BY 1, 2""".stripMargin

  /** q242 — split-conformal interval calibration
    * ([[graft.ts.SeriesOps.conformalWidth]], 90%): per (event type,
    * horizon), the width covering 90% of future absolute errors of
    * the q221 seasonal-naive backtest under exchangeability — the
    * k = ⌈(n+1)·0.9⌉-th smallest residual via the exact grid cover
    * rule (residual rows are never sorted; the window sees the
    * residual-value grid per (key, h)). The calibration layer every
    * point forecaster needs before shipping intervals. */
  private def q242(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.conformalWidth(dailyRevenue(s, dir),
      "event_type", "d", "v_c", season = 7, nOrigins = 8,
      horizons = 1 to 7, covPct = 90)

  private val q242Sql =
    s"""WITH daily AS (
      |  $dailyRevenueSql),
      |mx AS (SELECT event_type, max(d) AS dmax FROM daily GROUP BY 1),
      |org AS (SELECT event_type, dmax - CAST(7 + j AS INTEGER) AS o
      |        FROM mx, unnest(generate_series(0, 7)) AS t(j)),
      |grid AS (SELECT event_type, o, h, o + CAST(h AS INTEGER) AS target_d,
      |                o + CAST(h - 7 AS INTEGER) AS base_d
      |         FROM org, unnest(generate_series(1, 7)) AS s(h)),
      |p AS (SELECT g.event_type, CAST(g.h AS BIGINT) AS h,
      |             abs(a.v_c - b.v_c) AS e
      |      FROM grid g
      |      JOIN daily a ON a.event_type = g.event_type AND a.d = g.target_d
      |      JOIN daily b ON b.event_type = g.event_type AND b.d = g.base_d),
      |gr AS (SELECT event_type, h, e, CAST(count(*) AS BIGINT) AS c
      |       FROM p GROUP BY 1, 2, 3),
      |w AS (SELECT event_type, h, e, c,
      |        sum(c) OVER (PARTITION BY event_type, h ORDER BY e
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY event_type, h) AS n_pairs
      |      FROM gr),
      |k AS (SELECT *, least(((n_pairs + 1) * 90 + 99) // 100, n_pairs) AS k
      |      FROM w)
      |SELECT event_type, h, CAST(n_pairs AS BIGINT) AS n_pairs,
      |       CAST(k AS BIGINT) AS k, e AS width_c
      |FROM k WHERE cum - c < k AND k <= cum""".stripMargin

  /** q243 — Theil–Sen robust trend ([[graft.ts.SeriesOps.theilSen]]):
    * per event type, the lower-median pairwise slope of daily revenue
    * — the outlier-proof complement of q205's OLS trend (one spike
    * day drags OLS; the slope median ignores it). Pair join keyed per
    * series (30-day histories → ≤435 pairs/key); median on the
    * slope-value grid. */
  private def q243(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.theilSen(
      dailyRevenue(s, dir).select(col("event_type"),
        datediff(col("d"), lit("1970-01-01").cast("date")).as("x"),
        col("v_c").as("y")),
      "event_type", "x", "y")

  private val q243Sql =
    s"""WITH daily AS (
      |  $dailyRevenueSql),
      |dd AS (SELECT event_type, CAST(d - DATE '1970-01-01' AS BIGINT) AS x,
      |              v_c AS y
      |       FROM daily),
      |p AS (SELECT a.event_type,
      |        CAST(round(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x)
      |          * 1000000.0) AS BIGINT) AS s
      |      FROM dd a JOIN dd b ON a.event_type = b.event_type
      |                         AND a.x < b.x),
      |g AS (SELECT event_type, s, CAST(count(*) AS BIGINT) AS c
      |      FROM p GROUP BY 1, 2),
      |w AS (SELECT event_type, s, c,
      |        sum(c) OVER (PARTITION BY event_type ORDER BY s
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY event_type) AS n_pairs
      |      FROM g),
      |np AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_points
      |       FROM dd GROUP BY 1)
      |SELECT w.event_type, n_points, CAST(n_pairs AS BIGINT) AS n_pairs,
      |       s AS slope_e6
      |FROM w JOIN np ON np.event_type = w.event_type
      |WHERE cum * 2 >= n_pairs AND (cum - c) * 2 < n_pairs""".stripMargin

  /** q244 — k-anonymity audit (k = 5) over the quasi-identifier
    * tuple (nation, market segment, account-balance bucket): every
    * equivalence class with its size and the at-risk flag
    * (size < k means those customers are re-identifiable within the
    * released attributes) — the privacy-release twin of the q102 PII
    * redaction tier. One keyed aggregate; the QI bucketing is a pure
    * projection. */
  private def q244(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
              cents(col("c_acctbal")).as("bc"))
      // FLOOR division (acctbal is negative for some customers, and
      // both Spark `div` and DuckDB `//` truncate toward zero, which
      // would merge (-1000, 1000) into one bucket — the RangeJoin
      // pmod correction makes this side a floor, and the oracle
      // floors explicitly)
      .select(col("nat"), col("seg"),
              expr("(bc - pmod(bc, 100000L)) div 100000L").as("bal_bucket"))
      .groupBy(col("nat"), col("seg"), col("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .select(col("nat"), col("seg"), col("bal_bucket"), col("class_size"),
              when(col("class_size") < 5L, 1L).otherwise(0L).as("at_risk"))

  private val q244Sql =
    """SELECT c_nationkey AS nat, c_mktsegment AS seg,
      |  CAST(floor(CAST(round(c_acctbal*100) AS BIGINT) / 100000.0)
      |    AS BIGINT) AS bal_bucket,
      |  CAST(count(*) AS BIGINT) AS class_size,
      |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS at_risk
      |FROM customer GROUP BY 1, 2, 3""".stripMargin

  /** q247 — first-touch sequential rules: for every ordered
    * event-type pair (a, b), how many users did a AT ALL, and how
    * many reached b within 24h of their FIRST a (first(b) after
    * first(a), gap ≤ 86400 s) — the adoption-funnel question q185's
    * adjacent transitions can't answer (transitions see consecutive
    * steps; this sees eventual conversion with a deadline). Per-user
    * first-occurrence table is one keyed aggregate; the pair join is
    * keyed BY USER and ≤ |types|² rows per user. */
  private def q247(s: SparkSession, dir: String): DataFrame = {
    val firsts = t(s, dir, "events")
      .select(col("user_id"), col("event_type"),
              col("ts").cast("timestamp").cast("long").as("sec"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("sec")).as("first_sec"))
    val a = firsts.select(col("user_id"), col("event_type").as("a"),
                          col("first_sec").as("ta"))
    val b = firsts.select(col("user_id"), col("event_type").as("b"),
                          col("first_sec").as("tb"))
    a.join(b, Seq("user_id"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_a"),
           sum(when(col("tb") > col("ta") &&
                    col("tb") - col("ta") <= 86400L, 1L).otherwise(0L))
             .as("n_conv"))
      .select(col("a"), col("b"), col("n_a"), col("n_conv"),
        round(col("n_conv").cast("double") / col("n_a") * 1000000.0)
          .cast("long").as("conf_e6"))
  }

  private val q247Sql =
    """WITH f AS (SELECT user_id, event_type,
      |             CAST(min(epoch_ns(ts) // 1000000000) AS BIGINT)
      |               AS first_sec
      |           FROM events GROUP BY 1, 2)
      |SELECT a.event_type AS a, b.event_type AS b,
      |  CAST(count(*) AS BIGINT) AS n_a,
      |  CAST(sum(CASE WHEN b.first_sec > a.first_sec
      |                 AND b.first_sec - a.first_sec <= 86400
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_conv,
      |  CAST(round(CAST(sum(CASE WHEN b.first_sec > a.first_sec
      |                 AND b.first_sec - a.first_sec <= 86400
      |                THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
      |    * 1000000.0) AS BIGINT) AS conf_e6
      |FROM f a JOIN f b ON a.user_id = b.user_id
      |                 AND a.event_type <> b.event_type
      |GROUP BY 1, 2""".stripMargin

  /** q248 — top consecutive event-type trigrams across sessionized
    * streams: the dominant 3-step behavior paths (the "common
    * journeys" report). Two keyed lead windows extract consecutive
    * triples inside each user's 30-minute session (q23's gap rule —
    * triples never cross a session boundary), one keyed count, top
    * 20 on (count DESC, path) — alphabet-bounded rank. */
  private def q248(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("sid"))
      .orderBy(col("sec"), col("event_id"))
    val sess = sessionized(s, dir)
    val triples = sess
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("event_type").as("s1"), col("t2").as("s2"),
               col("t3").as("s3"))
      .agg(count(lit(1)).as("n"))
    val rk = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
    triples.withColumn("rk", row_number().over(rk).cast("long"))
      .filter(col("rk") <= 20L)
  }

  /** Sessionized event stream (user, sid, sec, event_id, event_type)
    * with the q23 30-minute gap rule, shared by q248. */
  private def sessionized(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts").cast("timestamp").cast("long").as("sec"))
      .withColumn("new_session",
        when(lag(col("sec"), 1).over(w).isNull ||
             col("sec") - lag(col("sec"), 1).over(w) >= 1800L, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_session")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                       org.apache.spark.sql.expressions.Window.currentRow)))
  }

  private val q248Sql =
    """WITH e AS (SELECT user_id, event_type, event_id,
      |             epoch_ns(ts) // 1000000000 AS sec FROM events),
      |f AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
      |                       OR sec - lag(sec) OVER w >= 1800
      |                     THEN 1 ELSE 0 END AS new_session
      |      FROM e WINDOW w AS (PARTITION BY user_id
      |                          ORDER BY sec, event_id)),
      |i AS (SELECT *, sum(new_session) OVER (PARTITION BY user_id
      |        ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS sid
      |      FROM f),
      |tr AS (SELECT event_type AS s1,
      |         lead(event_type, 1) OVER w2 AS s2,
      |         lead(event_type, 2) OVER w2 AS s3
      |       FROM i WINDOW w2 AS (PARTITION BY user_id, sid
      |                            ORDER BY sec, event_id)),
      |c AS (SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
      |      FROM tr WHERE s2 IS NOT NULL AND s3 IS NOT NULL
      |      GROUP BY 1, 2, 3),
      |r AS (SELECT *, CAST(row_number() OVER (
      |        ORDER BY n DESC, s1, s2, s3) AS BIGINT) AS rk FROM c)
      |SELECT s1, s2, s3, n, rk FROM r WHERE rk <= 20""".stripMargin

  /** q249 — data-quality contract report: the release-gate audit a
    * warehouse runs before publishing a snapshot — referential
    * integrity (orphaned fact keys, both hops), domain rules
    * (positive amounts, bounded discounts), and cross-column
    * temporal sanity (ship date not before order date) — one row per
    * rule with checked/violation counts and the e6 rate. Each rule
    * is one keyed anti-join or predicate aggregate; the report is a
    * rule-count-sized union. */
  private def q249(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val cust = t(s, dir, "customer")
    def rule(name: String, checked: DataFrame, violations: DataFrame) = {
      val n = checked.agg(count(lit(1)).as("n_checked"))
      val v = violations.agg(count(lit(1)).as("n_violations"))
      n.crossJoin(v).select(lit(name).as("rule"), col("n_checked"),
        col("n_violations"),
        round(col("n_violations").cast("double") / col("n_checked")
          * 1000000.0).cast("long").as("viol_rate_e6"))
    }
    val orphanLi = li.join(o.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    val orphanO = o.join(cust.select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_anti")
    val shipJoin = li.join(o.select(col("o_orderkey"), col("o_orderdate")),
      col("l_orderkey") === col("o_orderkey"))
    rule("li_orderkey_fk", li, orphanLi)
      .unionByName(rule("o_custkey_fk", o, orphanO))
      .unionByName(rule("price_positive", li,
        li.filter(cents(col("l_extendedprice")) <= 0L)))
      .unionByName(rule("discount_domain", li,
        li.filter(cents(col("l_discount")) < 0L ||
                  cents(col("l_discount")) > 10L)))
      .unionByName(rule("ship_after_order", shipJoin,
        shipJoin.filter(col("l_shipdate") < col("o_orderdate"))))
      .unionByName(rule("totalprice_positive", o,
        o.filter(cents(col("o_totalprice")) <= 0L)))
  }

  private val q249Sql = {
    def r(name: String, nSql: String, vSql: String) =
      s"""SELECT '$name' AS rule,
        |  CAST(($nSql) AS BIGINT) AS n_checked,
        |  CAST(($vSql) AS BIGINT) AS n_violations,
        |  CAST(round(CAST(($vSql) AS DOUBLE) / ($nSql) * 1000000.0)
        |    AS BIGINT) AS viol_rate_e6""".stripMargin
    Seq(
      r("li_orderkey_fk",
        "SELECT count(*) FROM lineitem",
        """SELECT count(*) FROM lineitem
          | WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)""".stripMargin),
      r("o_custkey_fk",
        "SELECT count(*) FROM orders",
        """SELECT count(*) FROM orders
          | WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)""".stripMargin),
      r("price_positive",
        "SELECT count(*) FROM lineitem",
        """SELECT count(*) FROM lineitem
          | WHERE CAST(round(l_extendedprice*100) AS BIGINT) <= 0""".stripMargin),
      r("discount_domain",
        "SELECT count(*) FROM lineitem",
        """SELECT count(*) FROM lineitem
          | WHERE CAST(round(l_discount*100) AS BIGINT) < 0
          |    OR CAST(round(l_discount*100) AS BIGINT) > 10""".stripMargin),
      r("ship_after_order",
        """SELECT count(*) FROM lineitem
          | JOIN orders ON o_orderkey = l_orderkey""".stripMargin,
        """SELECT count(*) FROM lineitem
          | JOIN orders ON o_orderkey = l_orderkey
          | WHERE l_shipdate < o_orderdate""".stripMargin),
      r("totalprice_positive",
        "SELECT count(*) FROM orders",
        """SELECT count(*) FROM orders
          | WHERE CAST(round(o_totalprice*100) AS BIGINT) <= 0""".stripMargin)
    ).mkString("\nUNION ALL\n")
  }

  /** q250 — robust trend-break detection
    * ([[graft.ts.SeriesOps.robustLineOutliers]]): per event type,
    * fit the Theil–Sen line with a median intercept and flag days
    * whose residual exceeds 3×MAD — both the line and the spread
    * shrug off the very outliers being hunted (the fully robust
    * upgrade of q205's OLS + q191's seasonal MAD). Exact e6
    * integers end to end; the oracle replays pairwise slopes and
    * both grid medians. */
  private def q250(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.robustLineOutliers(
      dailyRevenue(s, dir).select(col("event_type"),
        datediff(col("d"), lit("1970-01-01").cast("date")).as("x"),
        col("v_c").as("y")),
      "event_type", "x", "y")

  private val q250Sql =
    s"""WITH daily AS (
      |  $dailyRevenueSql),
      |dd AS (SELECT event_type AS key,
      |              CAST(d - DATE '1970-01-01' AS BIGINT) AS x0, v_c AS y
      |       FROM daily),
      |bs AS (SELECT key, min(x0) AS xmin FROM dd GROUP BY 1),
      |d2 AS (SELECT dd.key, x0, x0 - xmin AS x, y
      |       FROM dd JOIN bs ON bs.key = dd.key),
      |p AS (SELECT a.key,
      |        CAST(round(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x)
      |          * 1000000.0) AS BIGINT) AS s
      |      FROM d2 a JOIN d2 b ON a.key = b.key AND a.x < b.x),
      |g AS (SELECT key, s, CAST(count(*) AS BIGINT) AS c
      |      FROM p GROUP BY 1, 2),
      |w AS (SELECT key, s, c,
      |        sum(c) OVER (PARTITION BY key ORDER BY s
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY key) AS n
      |      FROM g),
      |sl AS (SELECT key, s AS slope_e6 FROM w
      |       WHERE cum * 2 >= n AND (cum - c) * 2 < n),
      |r0 AS (SELECT d2.key, x0, y, y * 1000000 - slope_e6 * x AS r0
      |       FROM d2 JOIN sl ON sl.key = d2.key),
      |g2 AS (SELECT key, r0, CAST(count(*) AS BIGINT) AS c
      |       FROM r0 GROUP BY 1, 2),
      |w2 AS (SELECT key, r0, c,
      |         sum(c) OVER (PARTITION BY key ORDER BY r0
      |                      ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(c) OVER (PARTITION BY key) AS n
      |       FROM g2),
      |ic AS (SELECT key, r0 AS intercept_e6 FROM w2
      |       WHERE cum * 2 >= n AND (cum - c) * 2 < n),
      |rr AS (SELECT r0.key, x0, y, r0.r0 - intercept_e6 AS res_e6
      |       FROM r0 JOIN ic ON ic.key = r0.key),
      |g3 AS (SELECT key, abs(res_e6) AS ares, CAST(count(*) AS BIGINT) AS c
      |       FROM rr GROUP BY 1, 2),
      |w3 AS (SELECT key, ares, c,
      |         sum(c) OVER (PARTITION BY key ORDER BY ares
      |                      ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(c) OVER (PARTITION BY key) AS n
      |       FROM g3),
      |md AS (SELECT key, ares AS mad_e6 FROM w3
      |       WHERE cum * 2 >= n AND (cum - c) * 2 < n)
      |SELECT rr.key AS event_type, CAST(x0 AS BIGINT) AS x, y,
      |  CAST(res_e6 AS BIGINT) AS res_e6, CAST(mad_e6 AS BIGINT) AS mad_e6,
      |  CAST(CASE WHEN abs(res_e6) > 3 * mad_e6 THEN 1 ELSE 0 END
      |    AS BIGINT) AS is_outlier
      |FROM rr JOIN md ON md.key = rr.key""".stripMargin

  /** q251 — conversion-latency percentiles: per experiment arm
    * (q214's user-parity split), the exact p50/p90 of seconds from a
    * user's FIRST view to their FIRST purchase (converters only,
    * purchase strictly after view) — the "how fast does the funnel
    * move" readout that pairs with q247's conversion rates. Firsts
    * are one keyed aggregate; percentiles ride the q216 grid cover
    * rule on the latency-value grid. */
  private def q251(s: SparkSession, dir: String): DataFrame = {
    val firsts = t(s, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view",
             col("ts").cast("timestamp").cast("long"))).as("tv"),
           min(when(col("event_type") === "purchase",
             col("ts").cast("timestamp").cast("long"))).as("tp"))
      .filter(col("tv").isNotNull && col("tp").isNotNull &&
              col("tp") > col("tv"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"),
              (col("tp") - col("tv")).as("lat"))
    graft.pipeline.CorpusSketch.exactPercentiles(firsts, "arm", "lat",
      Seq(50, 90))
  }

  private val q251Sql =
    """WITH f AS (SELECT user_id,
      |             min(CASE WHEN event_type = 'view'
      |                      THEN epoch_ns(ts) // 1000000000 END) AS tv,
      |             min(CASE WHEN event_type = 'purchase'
      |                      THEN epoch_ns(ts) // 1000000000 END) AS tp
      |           FROM events
      |           WHERE event_type IN ('view', 'purchase')
      |           GROUP BY 1),
      |lat AS (SELECT user_id % 2 AS arm, CAST(tp - tv AS BIGINT) AS v
      |        FROM f WHERE tv IS NOT NULL AND tp IS NOT NULL AND tp > tv),
      |g AS (SELECT arm, v, CAST(count(*) AS BIGINT) AS c
      |      FROM lat GROUP BY 1, 2),
      |w AS (SELECT arm, v, c,
      |        sum(c) OVER (PARTITION BY arm ORDER BY v
      |                     ROWS UNBOUNDED PRECEDING) AS cum,
      |        sum(c) OVER (PARTITION BY arm) AS n
      |      FROM g),
      |x AS (SELECT arm, v, c, cum, n,
      |             unnest([CAST(50 AS BIGINT), CAST(90 AS BIGINT)]) AS q_pct
      |      FROM w)
      |SELECT arm, q_pct, CAST(n AS BIGINT) AS n, v AS exact
      |FROM x
      |WHERE cum - c < (n * q_pct + 99) // 100
      |  AND (n * q_pct + 99) // 100 <= cum""".stripMargin

  /** q224 — EXACT trailing-7-day distinct users per event type
    * ([[graft.ts.SeriesOps.slidingDistinct]]): the gaps-and-islands
    * decomposition (per-user covering intervals → ±1 deltas →
    * calendar cum-sum) whose cost is linear in presence rows, vs the
    * naive w-way window self-join. The oracle IS the naive form — a
    * range-join COUNT(DISTINCT) per window end — so the hash match
    * proves the decomposition result-invisible (the q195 salted-join
    * convention). Exact twin of q202's HLL estimate. */
  private def q224(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.slidingDistinct(
      t(s, dir, "events").select(col("event_type"),
        dayBucket(col("ts")).as("d"), col("user_id")),
      "event_type", "d", "user_id", windowDays = 7)

  private val q224Sql =
    """WITH p AS (SELECT DISTINCT event_type AS k,
      |             CAST(date_trunc('day', ts) AS DATE) AS d, user_id AS u
      |           FROM events),
      |spans AS (SELECT k, min(d) AS d0, max(d) AS d1 FROM p GROUP BY 1),
      |grid AS (SELECT k, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |                CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS d
      |         FROM spans)
      |SELECT g.k AS event_type, g.d, CAST(count(DISTINCT p.u) AS BIGINT)
      |         AS uniq_7d
      |FROM grid g LEFT JOIN p ON p.k = g.k AND p.d BETWEEN g.d - 6 AND g.d
      |GROUP BY 1, 2""".stripMargin

  /** q228 — revenue concentration per market segment
    * ([[graft.stats.Concentration.gini]]): Gini coefficient and
    * top-decile Lorenz share of per-customer lifetime spend — the
    * "how dependent is this segment on its whales" audit (the same
    * statistic a corpus-mix designer runs on per-source token
    * counts). The Gini numerator Σ(2i−n−1)·x is one exact long per
    * segment; windows are segment-keyed and member-count sized. */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("x"))
    val seg = t(s, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("segment"))
    graft.stats.Concentration.gini(rev.join(seg, Seq("o_custkey")),
      "segment", "x")
  }

  private val q228Sql =
    """WITH rev AS (SELECT o_custkey,
      |               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
      |                 AS BIGINT) AS x
      |             FROM orders GROUP BY 1),
      |j AS (SELECT c.c_mktsegment AS grp, x
      |      FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey),
      |r AS (SELECT grp, x,
      |        CAST(row_number() OVER (PARTITION BY grp ORDER BY x)
      |          AS BIGINT) AS i,
      |        CAST(row_number() OVER (PARTITION BY grp ORDER BY x DESC)
      |          AS BIGINT) AS rd
      |      FROM j),
      |nt AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |              CAST(sum(x) AS BIGINT) AS total FROM j GROUP BY 1)
      |SELECT r.grp AS segment, n, total,
      |  CAST(round(CAST(sum((2*i - n - 1) * x) AS DOUBLE) / (n * total)
      |    * 1000000.0) AS BIGINT) AS gini_e6,
      |  CAST(round(CAST(sum(CASE WHEN rd * 10 <= n + 9 THEN x ELSE 0 END)
      |    AS DOUBLE) / total * 1000000.0) AS BIGINT) AS top_decile_share_e6
      |FROM r JOIN nt ON nt.grp = r.grp
      |GROUP BY r.grp, n, total""".stripMargin

  /** q231 — ABC / Pareto classification
    * ([[graft.stats.Concentration.abcClasses]]): per brand, every
    * part labeled A (inside the top 70% of cumulative revenue),
    * B (70–90%], or C — the inventory-weight labeling (and, run on
    * per-source token counts, the corpus-mix version of the same
    * question q228 answers as a single Gini number). Exact integer
    * threshold compares (cum·100 ≤ total·pct); brand-keyed
    * member-sized windows. */
  private def q231(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"), col("l_partkey").as("partkey"))
      .agg(sum(cents(col("l_extendedprice"))).as("rev_c"))
    graft.stats.Concentration.abcClasses(rev, "brand", "partkey", "rev_c")
  }

  private val q231Sql =
    """WITH rev AS (SELECT p.p_brand AS brand, l_partkey AS partkey,
      |               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
      |                 AS BIGINT) AS rev_c
      |             FROM lineitem JOIN part p ON p.p_partkey = l_partkey
      |             GROUP BY 1, 2),
      |c AS (SELECT brand, partkey, rev_c,
      |        CAST(sum(rev_c) OVER (PARTITION BY brand
      |          ORDER BY rev_c DESC, partkey
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |        CAST(sum(rev_c) OVER (PARTITION BY brand) AS BIGINT) AS total
      |      FROM rev)
      |SELECT brand, partkey, rev_c, cum,
      |  CASE WHEN cum * 100 <= total * 70 THEN 'A'
      |       WHEN cum * 100 <= total * 90 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c""".stripMargin

  /** q232 — CDC latest-wins materialization
    * ([[graft.ts.Scd.applyCdc]]): the event stream read as a
    * replication log per user — 'error' rows are delete tombstones,
    * everything else upserts the profile value — collapsed to live
    * table state by ONE keyed max_by aggregate (no window at all);
    * users whose LATEST op is the tombstone drop out, a delete
    * followed by a re-insert survives. Total order inside a key =
    * (second-truncated ts, event_id) — second truncation keeps the
    * ordering engine-identical (Spark micros vs DuckDB nanos), the
    * unique id breaks the remaining ties. */
  private def q232(s: SparkSession, dir: String): DataFrame =
    graft.ts.Scd.applyCdc(
      t(s, dir, "events").select(col("user_id"), toSecond(col("ts")).as("ds"),
        col("event_id"), col("event_type").as("op"),
        cents(col("value")).as("v_c")),
      "user_id", "op", "error", Seq("ds", "event_id"), Seq("v_c"))

  private val q232Sql =
    """WITH c AS (SELECT user_id,
      |             CAST(date_trunc('second', ts) AS TIMESTAMP) AS ds,
      |             event_id, event_type AS op,
      |             CAST(round(value*100) AS BIGINT) AS v_c
      |           FROM events),
      |r AS (SELECT user_id, ds, event_id, op, v_c,
      |        row_number() OVER (PARTITION BY user_id
      |          ORDER BY ds DESC, event_id DESC) AS rk,
      |        CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
      |          AS n_changes
      |      FROM c)
      |SELECT user_id, ds AS last_ds, event_id AS last_event_id,
      |       v_c AS last_v_c, n_changes
      |FROM r WHERE rk = 1 AND op <> 'error'""".stripMargin

  /** q234 — stationary distribution of the q185 behavior chain:
    * 4 power iterations of the WEIGHTED walk r′(v) = Σ_u r(u)·n(u,v)
    * div n_from(u) on the e6 grid, from the uniform start 1e6 div
    * |states| — "where does user behavior settle" (the long-run
    * event-type mix). Transitions are restricted to in-state targets
    * so mass stays closed up to div truncation; every iteration is
    * one state-keyed join + keyed sum (the [[graft.graphs.PageRank]]
    * shape, teleport-free and count-weighted). The oracle unrolls
    * all four iterations over the identical integer rule. */
  private def q234(s: SparkSession, dir: String): DataFrame = {
    val tm = graft.ts.EventAnalytics.transitionMatrix(
        t(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"))
    val states = tm.select(col("from_type").as("state")).distinct()
    val tmIn = tm.join(states.select(col("state").as("to_type")),
                       Seq("to_type"), "left_semi")
    val ns = states.agg(count(lit(1)).as("n_states"))
    var r = states.crossJoin(ns)
      .select(col("state"), expr("1000000 div n_states").as("rank_e6"))
    for (_ <- 1 to 4) {
      val contribs = tmIn
        .join(r.select(col("state").as("from_type"), col("rank_e6")),
              Seq("from_type"))
        .select(col("to_type").as("state"),
                expr("(rank_e6 * n) div n_from").as("share"))
        .groupBy(col("state")).agg(sum(col("share")).as("in_share"))
      r = states.join(contribs, Seq("state"), "left")
        .select(col("state"), coalesce(col("in_share"), lit(0L)).as("rank_e6"))
    }
    r.select(col("state"), col("rank_e6").as("stat_e6"))
  }

  private val q234Sql = {
    val iters = (1 to 4).map { i =>
      s"""c$i AS (SELECT t.to_type AS state,
        |         CAST(sum((r${i - 1}.rank_e6 * t.n) // t.n_from) AS BIGINT)
        |           AS in_share
        |       FROM t JOIN r${i - 1} ON r${i - 1}.state = t.from_type
        |       GROUP BY 1),
        |r$i AS (SELECT s.state, CAST(COALESCE(c$i.in_share, 0) AS BIGINT)
        |          AS rank_e6
        |        FROM states s LEFT JOIN c$i USING (state))""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
      |  SELECT user_id, event_type,
      |         CAST(date_trunc('second', ts) AS TIMESTAMP) AS sec, event_id
      |  FROM events),
      |st AS (
      |  SELECT user_id, event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY sec, event_id) AS to_type
      |  FROM e),
      |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |      FROM st WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |m AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      |      FROM c GROUP BY 1),
      |states AS (SELECT DISTINCT from_type AS state FROM c),
      |t AS (SELECT c.from_type, c.to_type, c.n, m.n_from
      |      FROM c JOIN m ON m.from_type = c.from_type
      |      WHERE c.to_type IN (SELECT state FROM states)),
      |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_states FROM states),
      |r0 AS (SELECT state, CAST(1000000 // n_states AS BIGINT) AS rank_e6
      |       FROM states CROSS JOIN ns),
      |$iters
      |SELECT state, rank_e6 AS stat_e6 FROM r4""".stripMargin
  }

  /** q238 — event debounce: repeated (user, type) events inside a
    * 5-minute inactivity gap collapse to one island (the telemetry
    * duplicate-click / retry-storm cleanup), keeping the island
    * head, the collapse count, and the island span. Pure
    * gaps-and-islands per (user, type) — one keyed lag window + one
    * keyed aggregate, epoch-second grid so boundary decisions are
    * engine-identical. */
  private def q238(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("sec"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
              col("ts").cast("timestamp").cast("long").as("sec"))
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .withColumn("new_island",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") >= 300L, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("sec"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                       org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("event_type"), col("island"))
      .agg(min(col("sec")).as("head_sec"),
           min_by(col("event_id"), struct(col("sec"), col("event_id")))
             .as("head_event_id"),
           count(lit(1)).as("n_collapsed"),
           (max(col("sec")) - min(col("sec"))).as("span_sec"))
      .select(col("user_id"), col("event_type"), col("head_sec"),
              col("head_event_id"), col("n_collapsed"), col("span_sec"))
  }

  private val q238Sql =
    """WITH e AS (SELECT user_id, event_type, event_id,
      |             epoch_ns(ts) // 1000000000 AS sec FROM events),
      |f AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
      |                       OR sec - lag(sec) OVER w >= 300
      |                     THEN 1 ELSE 0 END AS new_island
      |      FROM e WINDOW w AS (PARTITION BY user_id, event_type
      |                          ORDER BY sec, event_id)),
      |i AS (SELECT *, sum(new_island) OVER (PARTITION BY user_id, event_type
      |        ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS island
      |      FROM f),
      |h AS (SELECT *, first_value(event_id) OVER (
      |        PARTITION BY user_id, event_type, island
      |        ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS head_id
      |      FROM i)
      |SELECT user_id, event_type,
      |  CAST(min(sec) AS BIGINT) AS head_sec,
      |  CAST(min(head_id) AS BIGINT) AS head_event_id,
      |  CAST(count(*) AS BIGINT) AS n_collapsed,
      |  CAST(max(sec) - min(sec) AS BIGINT) AS span_sec
      |FROM h GROUP BY user_id, event_type, island""".stripMargin

  /** q239 — market-share shift report: per segment, revenue share of
    * the early half (orders before 1998-06-01) vs the late half, and
    * the exact share delta — the period-over-period mix question
    * every warehouse asks. Two keyed aggregates + two 1-row totals;
    * shares on the e6 grid from exact cents. */
  private def q239(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
              when(col("o_orderdate") < lit("1998-06-01").cast("date"), 1L)
                .otherwise(2L).as("period"),
              cents(col("o_totalprice")).as("v"))
    val per = o.groupBy(col("segment"))
      .agg(sum(when(col("period") === 1L, col("v")).otherwise(0L)).as("rev1_c"),
           sum(when(col("period") === 2L, col("v")).otherwise(0L)).as("rev2_c"))
    val tot = per.agg(sum(col("rev1_c")).as("tot1_c"),
                      sum(col("rev2_c")).as("tot2_c"))
    per.crossJoin(tot)
      .select(col("segment"), col("rev1_c"), col("rev2_c"),
        round(col("rev1_c").cast("double") / col("tot1_c") * 1000000.0)
          .cast("long").as("share1_e6"),
        round(col("rev2_c").cast("double") / col("tot2_c") * 1000000.0)
          .cast("long").as("share2_e6"))
      .withColumn("delta_e6", col("share2_e6") - col("share1_e6"))
  }

  private val q239Sql =
    """WITH o AS (SELECT c.c_mktsegment AS segment,
      |             CASE WHEN o_orderdate < DATE '1998-06-01' THEN 1
      |                  ELSE 2 END AS period,
      |             CAST(round(o_totalprice*100) AS BIGINT) AS v
      |           FROM orders JOIN customer c ON c.c_custkey = o_custkey),
      |per AS (SELECT segment,
      |          CAST(sum(CASE WHEN period = 1 THEN v ELSE 0 END) AS BIGINT)
      |            AS rev1_c,
      |          CAST(sum(CASE WHEN period = 2 THEN v ELSE 0 END) AS BIGINT)
      |            AS rev2_c
      |        FROM o GROUP BY 1),
      |tot AS (SELECT CAST(sum(rev1_c) AS BIGINT) AS tot1_c,
      |               CAST(sum(rev2_c) AS BIGINT) AS tot2_c FROM per)
      |SELECT segment, rev1_c, rev2_c,
      |  CAST(round(CAST(rev1_c AS DOUBLE) / tot1_c * 1000000.0) AS BIGINT)
      |    AS share1_e6,
      |  CAST(round(CAST(rev2_c AS DOUBLE) / tot2_c * 1000000.0) AS BIGINT)
      |    AS share2_e6,
      |  CAST(round(CAST(rev2_c AS DOUBLE) / tot2_c * 1000000.0) AS BIGINT)
      |    - CAST(round(CAST(rev1_c AS DOUBLE) / tot1_c * 1000000.0) AS BIGINT)
      |    AS delta_e6
      |FROM per CROSS JOIN tot""".stripMargin

  /** q240 — CUPED variance-reduced experiment readout: per-user
    * pre-period (Jan 1–15) spend as the covariate X, post-period
    * (Jan 16–30) spend as the metric Y, arms by user parity (q214's
    * split); θ = cov(X,Y)/var(X) from POOLED exact integer moments,
    * adjusted per-arm mean = (ΣY_a − θ·(ΣX_a − n_a·X̄))/n_a — the
    * standard pre-experiment-data adjustment (Deng et al. 2013)
    * that tightens the q214 z-test. Moments are whole-currency longs
    * (cents would overflow Σxy·n at scale); θ and the means are
    * single double expressions replayed verbatim by the oracle. */
  private def q240(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("date")
    val u = t(s, dir, "events")
      .select(col("user_id"), dayBucket(col("ts")).as("d"),
              round(col("value")).cast("long").as("v"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("d") < cut, col("v")).otherwise(0L)).as("x"),
           sum(when(col("d") >= cut, col("v")).otherwise(0L)).as("y"))
      .withColumn("arm", pmod(col("user_id"), lit(2L)))
    val pooled = u.agg(count(lit(1)).as("nn"), sum(col("x")).as("sx"),
                       sum(col("y")).as("sy"),
                       sum(col("x") * col("y")).as("sxy"),
                       sum(col("x") * col("x")).as("sxx"))
    val arms = u.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx_a"),
           sum(col("y")).as("sy_a"))
    val theta =
      (col("nn").cast("double") * col("sxy")
        - col("sx").cast("double") * col("sy")) /
      (col("nn").cast("double") * col("sxx")
        - col("sx").cast("double") * col("sx"))
    arms.crossJoin(pooled)
      .withColumn("theta", theta)
      .select(col("arm"), col("n"), col("sx_a"), col("sy_a"),
        round(col("theta") * 1000000.0).cast("long").as("theta_e6"),
        round(col("sy_a").cast("double") / col("n") * 1000000.0)
          .cast("long").as("raw_mean_e6"),
        round((col("sy_a").cast("double")
            - col("theta") * (col("sx_a").cast("double")
              - col("n").cast("double") * col("sx") / col("nn")))
          / col("n") * 1000000.0).cast("long").as("adj_mean_e6"))
  }

  private val q240Sql =
    """WITH u AS (SELECT user_id,
      |  CAST(sum(CASE WHEN CAST(date_trunc('day', ts) AS DATE)
      |                     < DATE '2024-01-16'
      |                THEN CAST(round(value) AS BIGINT) ELSE 0 END)
      |    AS BIGINT) AS x,
      |  CAST(sum(CASE WHEN CAST(date_trunc('day', ts) AS DATE)
      |                     >= DATE '2024-01-16'
      |                THEN CAST(round(value) AS BIGINT) ELSE 0 END)
      |    AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |ua AS (SELECT user_id, x, y, user_id % 2 AS arm FROM u),
      |pooled AS (SELECT CAST(count(*) AS BIGINT) AS nn,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * y) AS BIGINT) AS sxy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx
      |           FROM ua),
      |arms AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |           CAST(sum(x) AS BIGINT) AS sx_a, CAST(sum(y) AS BIGINT) AS sy_a
      |         FROM ua GROUP BY 1),
      |th AS (SELECT arm, n, sx_a, sy_a, nn, sx,
      |         (CAST(nn AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
      |           / (CAST(nn AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
      |           AS theta
      |       FROM arms CROSS JOIN pooled)
      |SELECT arm, n, sx_a, sy_a,
      |  CAST(round(theta * 1000000.0) AS BIGINT) AS theta_e6,
      |  CAST(round(CAST(sy_a AS DOUBLE) / n * 1000000.0) AS BIGINT)
      |    AS raw_mean_e6,
      |  CAST(round((CAST(sy_a AS DOUBLE)
      |      - theta * (CAST(sx_a AS DOUBLE)
      |        - CAST(n AS DOUBLE) * sx / nn))
      |    / n * 1000000.0) AS BIGINT) AS adj_mean_e6
      |FROM th""".stripMargin

  /** q299 — market-basket association rules
    * ([[graft.pipeline.AssocRules.associationRules]]): which part
    * BRANDS co-occur in an order beyond chance — supports exact,
    * confidence/lift integer-div micro-ratios, Apriori item prune
    * before the basket-keyed pair join. The co-purchase GRAPH
    * queries (q219/q227/q254) see edges; this scores directed RULES
    * with the baseline-rate correction (lift) that a raw edge count
    * can't give. */
  private def q299(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.AssocRules.associationRules(
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"),
              col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("bk"), col("p_brand").as("it")),
      "bk", "it", minItemSupport = 100L, minPairSupport = 25L)

  private val q299Sql =
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS bk, p_brand AS it
      |  FROM lineitem JOIN part ON p_partkey = l_partkey),
      |nb AS (SELECT count(DISTINCT bk) AS n_baskets FROM b),
      |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS c_item
      |       FROM b GROUP BY 1 HAVING count(*) >= 100),
      |f AS (SELECT b.bk, b.it FROM b JOIN ic ON ic.it = b.it),
      |pc AS (SELECT a.it AS ia, b2.it AS ib,
      |              CAST(count(*) AS BIGINT) AS c_pair
      |       FROM f a JOIN f b2 ON a.bk = b2.bk AND a.it < b2.it
      |       GROUP BY 1, 2 HAVING count(*) >= 25),
      |d AS (SELECT ia AS antecedent, ib AS consequent, c_pair FROM pc
      |      UNION ALL
      |      SELECT ib AS antecedent, ia AS consequent, c_pair FROM pc)
      |SELECT d.antecedent, d.consequent, c_pair AS n_pair,
      |  ia.c_item AS n_ante, ic2.c_item AS n_cons,
      |  CAST(nb.n_baskets AS BIGINT) AS n_baskets,
      |  c_pair * 1000000 // ia.c_item AS conf_e6,
      |  CAST(CAST(c_pair AS HUGEINT) * nb.n_baskets * 1000000
      |       // (CAST(ia.c_item AS HUGEINT) * ic2.c_item) AS BIGINT)
      |    AS lift_e6
      |FROM d JOIN ic ia ON ia.it = d.antecedent
      |       JOIN ic ic2 ON ic2.it = d.consequent
      |       CROSS JOIN nb""".stripMargin

  /** q303 — exact Shapley-value attribution
    * ([[graft.ts.ShapleyAttribution.shapley]]): journey = (user,
    * calendar week), channels = the four non-purchase event types,
    * conversion = a purchase that week. The game-theoretic credit
    * next to q275's positional models — the oracle replays the
    * coalition masks, the factorial weights, and the exact
    * numerator/k! division. */
  private def q303(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"),
              col("event_type"))
    graft.ts.ShapleyAttribution.shapley(
      ev.filter(col("event_type") =!= "purchase"),
      Seq("user_id", "wk"), "event_type",
      ev.filter(col("event_type") === "purchase"),
      Seq("view", "click", "signup", "error"))
  }

  private val q303Sql =
    """WITH tm AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk,
      |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |         WHEN 'signup' THEN 4 WHEN 'error' THEN 8 END AS bit
      |  FROM events
      |  WHERE event_type IN ('view', 'click', 'signup', 'error')),
      |mk AS (SELECT user_id, wk, CAST(sum(DISTINCT bit) AS BIGINT) AS mask
      |       FROM tm GROUP BY 1, 2),
      |cvj AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
      |        FROM events WHERE event_type = 'purchase'),
      |j AS (SELECT mk.mask,
      |        CASE WHEN cvj.user_id IS NULL THEN 0 ELSE 1 END AS cv
      |      FROM mk LEFT JOIN cvj
      |        ON cvj.user_id = mk.user_id AND cvj.wk = mk.wk),
      |coal AS (SELECT mask, CAST(count(*) AS BIGINT) AS n_j,
      |                CAST(sum(cv) AS BIGINT) AS n_c
      |         FROM j GROUP BY 1),
      |vv AS (SELECT mask, n_j, n_c, n_c * 1000000 // n_j AS v_e6,
      |         (mask // 1) % 2 + (mask // 2) % 2 + (mask // 4) % 2
      |           + (mask // 8) % 2 AS pc
      |       FROM coal),
      |ch(name, bit) AS (VALUES ('view', 1), ('click', 2),
      |                         ('signup', 4), ('error', 8)),
      |wt(s, w) AS (VALUES (0, 6), (1, 2), (2, 2), (3, 6)),
      |ex AS (SELECT ch.name, vv.n_j, vv.n_c, vv.v_e6,
      |         CASE WHEN (mask // ch.bit) % 2 = 1 THEN 1 ELSE 0 END AS pres,
      |         pc - CASE WHEN (mask // ch.bit) % 2 = 1 THEN 1 ELSE 0 END
      |           AS s_excl
      |       FROM vv CROSS JOIN ch),
      |tr AS (SELECT name, n_j, n_c, pres,
      |         CASE WHEN pres = 1 THEN CAST(w AS HUGEINT) * v_e6
      |              ELSE -CAST(w AS HUGEINT) * v_e6 END AS term
      |       FROM ex JOIN wt ON wt.s = ex.s_excl)
      |SELECT name AS channel,
      |  CAST(sum(CASE WHEN pres = 1 THEN n_j ELSE 0 END) AS BIGINT)
      |    AS n_journeys,
      |  CAST(sum(CASE WHEN pres = 1 THEN n_c ELSE 0 END) AS BIGINT)
      |    AS n_convs,
      |  CAST(sum(term) // 24 AS BIGINT) AS phi_e6
      |FROM tr GROUP BY 1""".stripMargin

  /** q310 — Markov removal-effect attribution
    * ([[graft.ts.MarkovAttribution.removalEffects]]): the path-aware
    * credit model next to q303's set-based Shapley — journeys become
    * a START→touch→CONV/NULL chain, each channel scored by how much
    * conversion probability drops when its node is removed. The
    * oracle rebuilds the chain and unrolls all five scenarios' value
    * iterations on the same integer grid. */
  private def q310(s: SparkSession, dir: String): DataFrame =
    graft.ts.MarkovAttribution.removalEffects(
      t(s, dir, "events")
        .withColumn("wk", date_trunc("week", col("ts"))),
      Seq("user_id", "wk"), "event_type", "ts", "event_id",
      Seq("view", "click", "signup", "error"), "purchase", iters = 12)

  private val q310Sql: String = {
    val chans = Seq("view", "click", "signup", "error")
    val iters = 12
    val scen: Seq[(String, Option[String])] =
      ("F", None) +: chans.map(c => (c.take(2), Some(c)))
    val v0s = scen.map { case (tag, _) =>
      s"v${tag}0 AS (SELECT s, CAST(0 AS HUGEINT) AS v FROM st)" }
    val vIters = scen.flatMap { case (tag, removed) =>
      val rm = removed.map(r => s"st.s = '$r' OR ").getOrElse("")
      (1 to iters).map { i =>
        s"""v$tag$i AS MATERIALIZED (
           |  SELECT st.s,
           |    CASE WHEN ${rm}tt.n = 0 THEN CAST(0 AS HUGEINT)
           |         ELSE (cc.cc * 1000000 + coalesce(agg.x, 0)) // tt.n
           |    END AS v
           |  FROM st JOIN tt ON tt.s = st.s JOIN cc ON cc.s = st.s
           |  LEFT JOIN (SELECT trc.src AS s, sum(trc.c * vp.v) AS x
           |             FROM trc JOIN v$tag${i - 1} vp ON vp.s = trc.dst
           |             GROUP BY 1) agg ON agg.s = st.s)""".stripMargin
      }
    }
    val prUnion = chans.map { c =>
      val tag = c.take(2)
      s"SELECT '$c' AS channel, v AS p_rem FROM v$tag$iters WHERE s = 'START'"
    }.mkString("\n      UNION ALL\n      ")
    val stVals = ("START" +: chans).map(s => s"('$s')").mkString(", ")
    val inList = chans.map(c => s"'$c'").mkString(", ")
    s"""WITH base AS MATERIALIZED (
       |  SELECT user_id, date_trunc('week', ts) AS wk, event_type AS et,
       |         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS sec,
       |         event_id AS eid
       |  FROM events),
       |tch AS MATERIALIZED (
       |  SELECT *, lead(et) OVER w AS nxt, row_number() OVER w AS rk
       |  FROM base WHERE et IN ($inList)
       |  WINDOW w AS (PARTITION BY user_id, wk ORDER BY sec, eid)),
       |cvj AS (SELECT DISTINCT user_id, wk FROM base
       |        WHERE et = 'purchase'),
       |lf AS (SELECT t.et, t.rk,
       |         coalesce(t.nxt, CASE WHEN cvj.user_id IS NOT NULL
       |                              THEN 'CONV' ELSE 'NULL' END) AS dst
       |       FROM tch t LEFT JOIN cvj
       |         ON cvj.user_id = t.user_id AND cvj.wk = t.wk),
       |edges AS MATERIALIZED (
       |  SELECT et AS src, dst FROM lf
       |  UNION ALL
       |  SELECT 'START' AS src, et AS dst FROM lf WHERE rk = 1),
       |tr AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS HUGEINT) AS c
       |      FROM edges GROUP BY 1, 2),
       |st(s) AS (VALUES $stVals),
       |tt AS MATERIALIZED (SELECT st.s,
       |        coalesce((SELECT sum(c) FROM tr WHERE tr.src = st.s), 0)
       |          AS n FROM st),
       |cc AS MATERIALIZED (SELECT st.s,
       |        coalesce((SELECT sum(c) FROM tr
       |                  WHERE tr.src = st.s AND tr.dst = 'CONV'), 0)
       |          AS cc FROM st),
       |trc AS MATERIALIZED (SELECT src, dst, c FROM tr
       |       WHERE dst IN ($inList)),
       |${(v0s ++ vIters).mkString(",\n")},
       |pf AS (SELECT v AS p_full FROM vF$iters WHERE s = 'START'),
       |pr AS ($prUnion),
       |eff AS (SELECT channel, p_full, p_rem,
       |         CASE WHEN p_full = 0 THEN CAST(0 AS HUGEINT)
       |              ELSE greatest(p_full - p_rem, 0) * 1000000 // p_full
       |         END AS removal
       |        FROM pr CROSS JOIN pf),
       |es AS (SELECT sum(removal) AS tot_eff FROM eff)
       |SELECT channel, CAST(p_full AS BIGINT) AS p_full_e6,
       |  CAST(p_rem AS BIGINT) AS p_removed_e6,
       |  CAST(removal AS BIGINT) AS removal_e6,
       |  CAST(CASE WHEN tot_eff = 0 THEN 0
       |       ELSE removal * 1000000 // tot_eff END AS BIGINT) AS share_e6
       |FROM eff CROSS JOIN es""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q310_markov_attribution", q310, Some(q310Sql)),
    QueryDef("q299_assoc_rules", q299, Some(q299Sql)),
    QueryDef("q303_shapley_attribution", q303, Some(q303Sql)),
    QueryDef("q238_debounce", q238, Some(q238Sql)),
    QueryDef("q242_conformal_width", q242, Some(q242Sql)),
    QueryDef("q243_theil_sen", q243, Some(q243Sql)),
    QueryDef("q244_k_anonymity", q244, Some(q244Sql)),
    QueryDef("q247_seq_rules", q247, Some(q247Sql)),
    QueryDef("q248_path_trigrams", q248, Some(q248Sql)),
    QueryDef("q249_dq_contract", q249, Some(q249Sql)),
    QueryDef("q250_robust_outliers", q250, Some(q250Sql)),
    QueryDef("q251_conversion_latency", q251, Some(q251Sql)),
    QueryDef("q239_share_shift", q239, Some(q239Sql)),
    QueryDef("q240_cuped", q240, Some(q240Sql)),
    QueryDef("q224_sliding_distinct", q224, Some(q224Sql)),
    QueryDef("q228_gini", q228, Some(q228Sql)),
    QueryDef("q231_abc_classes", q231, Some(q231Sql)),
    QueryDef("q232_cdc_apply", q232, Some(q232Sql)),
    QueryDef("q234_markov_stationary", q234, Some(q234Sql)),
    QueryDef("q220_skyline", q220, Some(q220Sql)),
    QueryDef("q221_backtest", q221, Some(q221Sql)),
    QueryDef("q210_cube_revenue", q210, Some(q210Sql)),
    QueryDef("q213_twap", q213, Some(q213Sql)),
    QueryDef("q214_ab_test", q214, Some(q214Sql)),
    QueryDef("q207_attribution", q207, Some(q207Sql)),
    QueryDef("q275_multi_touch", q275, Some(q275Sql)),
    QueryDef("q280_cohort_ltv", q280, Some(q280Sql)),
    QueryDef("q287_funnel_alignment", q287, Some(q287Sql)),
    QueryDef("q208_series_corr", q208, Some(q208Sql)),
    QueryDef("q205_series_trend", q205, Some(q205Sql)),
    QueryDef("q199_ewma_smooth", q199, Some(q199Sql)),
    QueryDef("q201_rolling_30d", q201, Some(q201Sql)),
    QueryDef("q196_interval_merge", q196, Some(q196Sql)),
    QueryDef("q189_gap_fill", q189, Some(q189Sql)),
    QueryDef("q190_cusum_changepoint", q190, Some(q190Sql)),
    QueryDef("q191_seasonal_outliers", q191, Some(q191Sql)),
    QueryDef("q185_event_transitions", q185, Some(q185Sql)),
    QueryDef("q186_rfm_segments", q186, Some(q186Sql)),
    QueryDef("q187_decayed_trending", q187, Some(q187Sql)),
    QueryDef("q23_sessionize", q23, Some(q23Sql)),
    QueryDef("q24_rollup_revenue", q24, Some(q24Sql)),
    QueryDef("q25_json_extract", q25, Some(q25Sql)),
    QueryDef("q26_pivot_daily_counts", q26, Some(q26Sql)),
    QueryDef("q165_range_join", q165, Some(q165Sql)),
    QueryDef("q166_funnel", q166, Some(q166Sql)),
    QueryDef("q167_cohort_retention", q167, Some(q167Sql))
  )
}
