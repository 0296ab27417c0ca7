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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q23_sessionize", q23, Some(q23Sql)),
    QueryDef("q24_rollup_revenue", q24, Some(q24Sql)),
    QueryDef("q25_json_extract", q25, Some(q25Sql)),
    QueryDef("q26_pivot_daily_counts", q26, Some(q26Sql))
  )
}
