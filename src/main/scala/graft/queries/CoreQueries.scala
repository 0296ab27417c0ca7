package graft.queries

import graft.QueryDef
import graft.ts.TimeOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational + time-series-normalization queries (SURVEY §2.2-§2.6).
  *
  * Each query exercises one or more reference operators over the driver's
  * parquet tables and carries an ANSI-SQL DuckDB oracle. Numeric outputs
  * follow the exact-integer-cents discipline of [[graft.queries]] so the
  * driver's hash compare is stable across engines and scale factors.
  */
object CoreQueries {

  /** q01 — A1 group-aggregate, TPC-H Q1 flavor (pricing summary).
    * Single hash-aggregate with map-side partials; filter pushed to scan. */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(cents(col("l_quantity"))).as("sum_qty_c"),
        sum(cents(col("l_extendedprice"))).as("sum_base_c"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_c"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
                  (lit(1.0) + col("l_tax")))).as("sum_charge_c"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty", meanFromCents(col("sum_qty_c"), col("n_rows")))
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
      |  count(*) AS n_rows,
      |  round(CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS avg_qty
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — T3 hour bucketing + A1 over the events stream table. */
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(TimeOps.bucket(col("ts"), Some("H")).as("ds"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))

  private val q02Sql =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ds, count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events GROUP BY 1""".stripMargin

  /** q03 — T3 ISO-week bucketing with period-END label (pandas
    * `.end_time` convention, SURVEY §2 T3) + mean aggregation. */
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"),
               to_date(date_trunc("week", col("ts"))).as("week_start"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
      .withColumn("week_end", date_add(col("week_start"), 6))
      .withColumn("mean_value", meanFromCents(col("value_c"), col("n")))

  private val q03Sql =
    """SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week_start,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c,
      |  CAST(date_trunc('week', ts) AS DATE) + 6 AS week_end,
      |  round(CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0 / count(*), 6) AS mean_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q04 — T3 month bucketing, period-end via `last_day`, max agg. */
  private def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), last_day(col("ts")).as("month_end"))
      .agg(max(cents(col("value"))).as("max_value_c"),
           min(cents(col("value"))).as("min_value_c"))

  private val q04Sql =
    """SELECT event_type, last_day(CAST(ts AS DATE)) AS month_end,
      |  CAST(max(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS max_value_c,
      |  CAST(min(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS min_value_c
      |FROM events GROUP BY 1, 2""".stripMargin

  /** q05 — T1/T2 mixed-format parse: render ts in the electricity_demand
    * `dd-MM-yyyy HH:mm` format, re-parse through the fallback chain
    * (`coalesce(try_to_timestamp…)`), verify per-day counts survive the
    * round trip. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val formatted = t(s, dir, "events")
      .select(date_format(col("ts"), "dd-MM-yyyy HH:mm").as("raw"))
    formatted
      .select(TimeOps.parseTimestamp(col("raw")).as("parsed"))
      .groupBy(dayBucket(col("parsed")).as("ds"))
      .agg(count(lit(1)).as("n"),
           min(col("parsed")).as("first_ts"),
           max(col("parsed")).as("last_ts"))
  }

  private val q05Sql =
    """WITH p AS (
      |  SELECT strptime(strftime(ts, '%d-%m-%Y %H:%M'), '%d-%m-%Y %H:%M') AS parsed
      |  FROM events)
      |SELECT CAST(date_trunc('day', parsed) AS DATE) AS ds, count(*) AS n,
      |  min(parsed) AS first_ts, max(parsed) AS last_ts
      |FROM p GROUP BY 1""".stripMargin

  /** q06 — A2 date bounds + A5 counts per series (event_type). */
  private def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(toSecond(min(col("ts"))).as("min_ts"),
           toSecond(max(col("ts"))).as("max_ts"),
           count(lit(1)).as("n"),
           countDistinct(col("user_id")).as("n_users"),
           sum(cents(col("value"))).as("value_c"))

  private val q06Sql =
    """SELECT event_type,
      |  CAST(date_trunc('second', min(ts)) AS TIMESTAMP) AS min_ts,
      |  CAST(date_trunc('second', max(ts)) AS TIMESTAMP) AS max_ts,
      |  count(*) AS n, count(DISTINCT user_id) AS n_users,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events GROUP BY 1""".stripMargin

  /** q07 — J1+J2 splice: observed actuals win over the "forecast" grid,
    * `coalesce` fills gaps (`app.py:144-151`). Actuals restricted to the
    * first half of the month so the splice exercises both branches.
    * Both sides are post-aggregation daily frames → broadcast join. */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val pred = ev.groupBy(dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("yhat"))
    val act = ev.filter(col("event_type") === "purchase" &&
                        col("ts") < lit("2024-01-16").cast("timestamp"))
      .groupBy(dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("y"))
    pred.join(broadcast(act), Seq("ds"), "left")
      .select(col("ds"),
              coalesce(col("y"), col("yhat")).as("spliced_c"),
              when(col("y").isNull, 0).otherwise(1).as("observed"))
  }

  private val q07Sql =
    """WITH pred AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS yhat
      |  FROM events GROUP BY 1),
      |act AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events
      |  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-16'
      |  GROUP BY 1)
      |SELECT p.ds AS ds, coalesce(a.y, p.yhat) AS spliced_c,
      |       CASE WHEN a.y IS NULL THEN 0 ELSE 1 END AS observed
      |FROM pred p LEFT JOIN act a ON p.ds = a.ds""".stripMargin

  /** q08 — J3 covariate alignment: target daily series left-joined with
    * covariate daily series on ds (`app.py:169`). */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val target = ev.filter(col("event_type") === "purchase")
      .groupBy(dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("y_c"))
    val cov = ev.filter(col("event_type") === "error")
      .groupBy(dayBucket(col("ts")).as("ds"))
      .agg(count(lit(1)).as("cov_n"))
    target.join(broadcast(cov), Seq("ds"), "left")
  }

  private val q08Sql =
    """WITH target AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS y_c
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |cov AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS ds, count(*) AS cov_n
      |  FROM events WHERE event_type = 'error' GROUP BY 1)
      |SELECT t.ds AS ds, t.y_c AS y_c, c.cov_n AS cov_n
      |FROM target t LEFT JOIN cov c ON t.ds = c.ds""".stripMargin

  /** q09 — J4/J5 future-grid inner join: day grid ⋈ covariate rows that
    * clear a threshold (the reference's left-join+dropna = inner,
    * `app.py:188`). */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val grid = ev.select(dayBucket(col("ts")).as("ds")).distinct()
    val cov = ev.filter(col("event_type") === "signup")
      .groupBy(dayBucket(col("ts")).as("ds"))
      .agg(count(lit(1)).as("n_signup"))
      .filter(col("n_signup") >= 3)
    grid.join(broadcast(cov), Seq("ds"), "inner")
  }

  private val q09Sql =
    """WITH grid AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS ds FROM events),
      |cov AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS ds, count(*) AS n_signup
      |  FROM events WHERE event_type = 'signup'
      |  GROUP BY 1 HAVING count(*) >= 3)
      |SELECT g.ds AS ds, c.n_signup AS n_signup
      |FROM grid g INNER JOIN cov c ON g.ds = c.ds""".stripMargin

  /** q10 — F1 historical/future split against a computed scalar bound
    * (max ds − 7 days); scalar via broadcast cross join, the distributed
    * form of the reference's driver-side `date_bounds` (`app.py:397-415`). */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("y_c"))
    val bound = daily.agg(max(col("ds")).as("max_ds"))
    daily.crossJoin(broadcast(bound))
      .select(col("ds"), col("y_c"),
              when(col("ds") <= date_sub(col("max_ds"), 7), 1).otherwise(0).as("is_hist"))
  }

  private val q10Sql =
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS y_c
      |  FROM events GROUP BY 1)
      |SELECT ds, y_c,
      |  CASE WHEN ds <= (SELECT max(ds) FROM daily) - 7 THEN 1 ELSE 0 END AS is_hist
      |FROM daily""".stripMargin

  /** q11 — F2 membership filter (`isin`, `app.py:201-209`). */
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "signup") &&
              col("user_id").isin(1L, 2L, 3L, 5L, 8L, 13L, 21L))
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))

  private val q11Sql =
    """SELECT event_type, user_id, count(*) AS n,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events
      |WHERE event_type IN ('purchase','signup')
      |  AND user_id IN (1,2,3,5,8,13,21)
      |GROUP BY 1, 2""".stripMargin

  /** q12 — O1/O3 order + limit with deterministic tiebreak. */
  private def q12(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("y_c"))
      .orderBy(col("y_c").desc, col("ds"))
      .limit(10)

  private val q12Sql =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS ds,
      |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS y_c
      |FROM events GROUP BY 1
      |ORDER BY y_c DESC, ds LIMIT 10""".stripMargin

  /** q22 — as-of join: attach each user's latest daily error total (at
    * or before the purchase instant) to every purchase event — the
    * train-time feature-attach pattern. Oracle is DuckDB's native
    * ASOF LEFT JOIN. */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), toSecond(col("ts")).as("ds"))
    val errDaily = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id"), dayBucket(col("ts")).cast("timestamp").as("ds"))
      .agg(sum(cents(col("value"))).as("err_c"))
    graft.joins.AsOf.asOfJoin(purchases, errDaily, Seq("err_c"), Seq("user_id"))
  }

  private val q22Sql =
    """WITH l AS (
      |  SELECT user_id, event_id, CAST(date_trunc('second', ts) AS TIMESTAMP) AS ds
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT user_id, CAST(CAST(date_trunc('day', ts) AS DATE) AS TIMESTAMP) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS err_c
      |  FROM events WHERE event_type = 'error' GROUP BY 1, 2)
      |SELECT l.user_id, l.ds AS ds, l.event_id, r.err_c
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ds >= r.ds""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q22_asof_join", q22, Some(q22Sql)),
    QueryDef("q01_pricing_summary", q01, Some(q01Sql)),
    QueryDef("q02_bucket_hour", q02, Some(q02Sql)),
    QueryDef("q03_bucket_week_mean", q03, Some(q03Sql)),
    QueryDef("q04_bucket_month_minmax", q04, Some(q04Sql)),
    QueryDef("q05_parse_mixed_roundtrip", q05, Some(q05Sql)),
    QueryDef("q06_date_bounds", q06, Some(q06Sql)),
    QueryDef("q07_splice_coalesce", q07, Some(q07Sql)),
    QueryDef("q08_align_covariate", q08, Some(q08Sql)),
    QueryDef("q09_future_grid_inner", q09, Some(q09Sql)),
    QueryDef("q10_hist_future_split", q10, Some(q10Sql)),
    QueryDef("q11_membership_filter", q11, Some(q11Sql)),
    QueryDef("q12_topk_days", q12, Some(q12Sql))
  )
}
