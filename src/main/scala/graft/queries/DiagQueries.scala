package graft.queries

import graft.QueryDef
import graft.stats.Diagnostics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostics / statistics queries (SURVEY §2.4 A3-A4, §2.7 C1-C2,
  * C10-C12).
  *
  * Float discipline: every oracle-compared double is derived from exact
  * integer aggregates through a single expression written with the SAME
  * operation order in Spark and DuckDB, then rounded — see
  * [[graft.queries]].
  */
object DiagQueries {

  private def dailyCents(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"), dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("y"))

  private val dailySql =
    """daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2)""".stripMargin

  /** q16 — A3/A4 logistic floor/ceiling defaults per series, computed
    * from exact integer moments (n, Σy, Σy², max, min) so the
    * `max + 3·stddev_samp` ceiling is bit-stable cross-engine. */
  private def q16(s: SparkSession, dir: String): DataFrame =
    dailyCents(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("y")).as("s1"),
           sum(col("y") * col("y")).as("s2"),
           max(col("y")).as("max_c"),
           min(col("y")).as("min_c"))
      .select(col("event_type"), col("n"), col("max_c"), col("min_c"),
              least(lit(0L), col("min_c")).as("floor_c"),
              round(col("max_c") +
                    lit(3.0) * sqrt((col("s2").cast("double") -
                      col("s1").cast("double") * col("s1").cast("double") / col("n")) /
                      (col("n") - 1)), 4).as("ceiling_c"))

  private val q16Sql =
    s"""WITH $dailySql,
      |st AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(y) AS BIGINT) AS s1,
      |         CAST(sum(y*y) AS BIGINT) AS s2, max(y) AS max_c, min(y) AS min_c
      |  FROM daily GROUP BY 1)
      |SELECT event_type, n, max_c, min_c,
      |  least(0, min_c) AS floor_c,
      |  round(max_c + 3.0 * sqrt((CAST(s2 AS DOUBLE) -
      |        CAST(s1 AS DOUBLE)*CAST(s1 AS DOUBLE)/n) / (n - 1)), 4) AS ceiling_c
      |FROM st""".stripMargin

  /** q17 — C11 detrend: OLS line fit from exact integer sums (x = epoch
    * day), residuals per row. The distributed form of the notebook's
    * `remove_trend` (`Untitled.ipynb` cell 12). */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(s, dir)
      .withColumn("x", datediff(col("ds"), lit("1970-01-01").cast("date")).cast("long"))
    val st = daily.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
    val withSlope = st.select(col("event_type").as("et"),
      ((col("n") * col("sxy") - col("sx") * col("sy")) /
       (col("n") * col("sxx") - col("sx") * col("sx"))).as("slope"),
      col("sx"), col("sy"), col("n"))
      .select(col("et"), col("slope"),
              ((col("sy") - col("slope") * col("sx")) / col("n")).as("intercept"))
    daily.join(broadcast(withSlope), daily("event_type") === withSlope("et"))
      .select(col("event_type"), col("ds"), col("y").as("y_c"),
              round(col("intercept") + col("slope") * col("x"), 6).as("trend"),
              round(col("y") - (col("intercept") + col("slope") * col("x")), 6).as("resid"))
  }

  private val q17Sql =
    s"""WITH $dailySql,
      |dx AS (SELECT event_type, ds, y, CAST(ds - DATE '1970-01-01' AS BIGINT) AS x FROM daily),
      |st AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*x) AS BIGINT) AS sxx,
      |         CAST(sum(x*y) AS BIGINT) AS sxy
      |  FROM dx GROUP BY 1),
      |fit AS (
      |  SELECT event_type,
      |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope, sx, sy, n
      |  FROM st),
      |fit2 AS (
      |  SELECT event_type, slope, (sy - slope * sx) / n AS intercept FROM fit)
      |SELECT dx.event_type, dx.ds, dx.y AS y_c,
      |  round(intercept + slope * x, 6) AS trend,
      |  round(y - (intercept + slope * x), 6) AS resid
      |FROM dx JOIN fit2 ON dx.event_type = fit2.event_type""".stripMargin

  /** q18 — C10 quantile bundle: exact interpolated percentiles over
    * integer cents (order-independent → cross-engine stable). */
  private def q18(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(col("event_type"), cents(col("value")).as("value_c"))
      .groupBy(col("event_type"))
      .agg(expr("percentile(value_c, array(0.05, 0.25, 0.5, 0.75, 0.95))").as("q"))
      .select(col("event_type"),
              round(col("q")(0), 6).as("q05"), round(col("q")(1), 6).as("q25"),
              round(col("q")(2), 6).as("q50"), round(col("q")(3), 6).as("q75"),
              round(col("q")(4), 6).as("q95"))

  private val q18Sql =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_c FROM events)
      |SELECT event_type,
      |  round(quantile_cont(value_c, 0.05), 6) AS q05,
      |  round(quantile_cont(value_c, 0.25), 6) AS q25,
      |  round(quantile_cont(value_c, 0.5), 6) AS q50,
      |  round(quantile_cont(value_c, 0.75), 6) AS q75,
      |  round(quantile_cont(value_c, 0.95), 6) AS q95
      |FROM e GROUP BY 1""".stripMargin

  /** q19 — C12 univariateStatistics: count/sum/mean + skewness/kurtosis
    * from explicit centered moments (NOT the built-in skewness/kurtosis,
    * whose bias corrections differ across engines). */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("event_type"), col("value"), cents(col("value")).as("c"))
    val m = e.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"), sum(col("c")).as("s1"))
      .select(col("event_type").as("et"), col("n"),
              (col("s1") / 100.0 / col("n")).as("mu"))
    // explicit multiplications, not pow(): libm pow may differ by 1 ulp
    // between engines; * and sqrt are IEEE correctly rounded everywhere
    val dev = col("value") - col("mu")
    val p = col("m2") / col("n")
    e.join(broadcast(m), e("event_type") === m("et"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("mu")).as("mean_raw"),
           sum(dev * dev).as("m2"),
           sum(dev * dev * dev).as("m3"),
           sum(dev * dev * dev * dev).as("m4"))
      .select(col("event_type"), col("n"), round(col("mean_raw"), 6).as("mean_value"),
              round((col("m3") / col("n")) / sqrt(p * p * p), 4).as("skew"),
              round((col("m4") / col("n")) / (p * p) - 3.0, 4).as("kurt"))
  }

  private val q19Sql =
    """WITH e AS (
      |  SELECT event_type, value, CAST(round(value*100) AS BIGINT) AS c FROM events),
      |m AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) / 100.0 / count(*) AS mu
      |  FROM e GROUP BY 1),
      |mom AS (
      |  SELECT e.event_type, max(n) AS n, max(mu) AS mean_raw,
      |         sum((value - mu) * (value - mu)) AS m2,
      |         sum((value - mu) * (value - mu) * (value - mu)) AS m3,
      |         sum((value - mu) * (value - mu) * (value - mu) * (value - mu)) AS m4
      |  FROM e JOIN m ON e.event_type = m.event_type GROUP BY 1)
      |SELECT event_type, n, round(mean_raw, 6) AS mean_value,
      |  round((m3 / n) / sqrt((m2 / n) * (m2 / n) * (m2 / n)), 4) AS skew,
      |  round((m4 / n) / ((m2 / n) * (m2 / n)) - 3.0, 4) AS kurt
      |FROM mom""".stripMargin

  /** q20 — C1 autocorrelation, exact statsmodels biased estimator, per
    * series, lags 0..5. Oracle reproduces the estimator relationally via
    * a date-shift self-join (days are contiguous per series). */
  private def q20(s: SparkSession, dir: String): DataFrame =
    Diagnostics.acfPacf(dailyCents(s, dir).withColumnRenamed("event_type", "series"),
                        "series", Some(5))
      .select(col("series").as("event_type"), col("lag"), round(col("acf"), 6).as("acf"))

  private val q20Sql =
    s"""WITH $dailySql,
      |m AS (SELECT event_type, CAST(sum(y) AS DOUBLE)/count(*) AS mu, count(*) AS n
      |      FROM daily GROUP BY 1),
      |d AS (SELECT daily.event_type, ds, y - mu AS dev, n
      |      FROM daily JOIN m ON daily.event_type = m.event_type),
      |lags AS (SELECT CAST(unnest(range(0, 6)) AS INTEGER) AS k),
      |pairs AS (SELECT d1.event_type, l.k, d1.dev * d2.dev AS prod, d1.n AS n
      |          FROM d d1 CROSS JOIN lags l
      |          JOIN d d2 ON d2.event_type = d1.event_type AND d2.ds = d1.ds + l.k),
      |sums AS (SELECT event_type, k, sum(prod) AS sm, max(n) AS n
      |         FROM pairs GROUP BY 1, 2)
      |SELECT s.event_type, s.k AS lag, round((s.sm/s.n) / (c.sm/c.n), 6) AS acf
      |FROM sums s JOIN sums c ON c.event_type = s.event_type AND c.k = 0""".stripMargin

  /** q21 — C2 partial autocorrelation (ywadjusted), lags 1-2, with the
    * closed-form Yule-Walker oracle (φ11 = r1/r0, φ22 by elimination). */
  private def q21(s: SparkSession, dir: String): DataFrame =
    Diagnostics.acfPacf(dailyCents(s, dir).withColumnRenamed("event_type", "series"),
                        "series", Some(2))
      .filter(col("lag") >= 1)
      .select(col("series").as("event_type"), col("lag"), round(col("pacf"), 6).as("pacf"))

  private val q21Sql =
    s"""WITH $dailySql,
      |m AS (SELECT event_type, CAST(sum(y) AS DOUBLE)/count(*) AS mu, count(*) AS n
      |      FROM daily GROUP BY 1),
      |d AS (SELECT daily.event_type, ds, y - mu AS dev, n
      |      FROM daily JOIN m ON daily.event_type = m.event_type),
      |lags AS (SELECT CAST(unnest(range(0, 3)) AS INTEGER) AS k),
      |pairs AS (SELECT d1.event_type, l.k, d1.dev * d2.dev AS prod, d1.n AS n
      |          FROM d d1 CROSS JOIN lags l
      |          JOIN d d2 ON d2.event_type = d1.event_type AND d2.ds = d1.ds + l.k),
      |r AS (SELECT event_type,
      |        max(CASE WHEN k = 0 THEN sm/(n - 0) END) AS r0,
      |        max(CASE WHEN k = 1 THEN sm/(n - 1) END) AS r1,
      |        max(CASE WHEN k = 2 THEN sm/(n - 2) END) AS r2
      |      FROM (SELECT event_type, k, sum(prod) AS sm, max(n) AS n
      |            FROM pairs GROUP BY 1, 2) s
      |      GROUP BY event_type)
      |SELECT event_type, 1 AS lag, round(r1/r0, 6) AS pacf FROM r
      |UNION ALL
      |SELECT event_type, 2 AS lag,
      |  round((r2 - (r1/r0)*r1) / (r0 - (r1/r0)*r1), 6) AS pacf FROM r""".stripMargin

  /** q225 — two-sample Kolmogorov–Smirnov drift test
    * ([[graft.stats.Hypothesis.ksTest]]): per event type, does the
    * cents-value DISTRIBUTION differ between the two q214 experiment
    * arms (user-id parity)? D rides the exact integer numerator
    * |cum_a·n_b − cum_b·n_a| over the pooled value grid, so the
    * argmax (and its earliest-value location) is float-free; only
    * the final D is a rounded double. Complements q214's z-test:
    * KS sees shape changes the mean never moves. */
  private def q225(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.ksTest(
      t(s, dir, "events").select(col("event_type"),
        pmod(col("user_id"), lit(2L)).as("arm"), cents(col("value")).as("v")),
      "event_type", "arm", "v")

  private val q225Sql =
    """WITH o AS (SELECT event_type AS grp, user_id % 2 AS arm,
      |             CAST(round(value*100) AS BIGINT) AS v FROM events),
      |g AS (SELECT grp, v,
      |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |      FROM o GROUP BY 1, 2),
      |tot AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n_a,
      |               CAST(sum(cb) AS BIGINT) AS n_b FROM g GROUP BY 1),
      |d AS (SELECT g.grp, v, n_a, n_b,
      |        abs(CAST(sum(ca) OVER (PARTITION BY g.grp ORDER BY v
      |              ROWS UNBOUNDED PRECEDING) AS BIGINT) * n_b
      |          - CAST(sum(cb) OVER (PARTITION BY g.grp ORDER BY v
      |              ROWS UNBOUNDED PRECEDING) AS BIGINT) * n_a) AS dnum
      |      FROM g JOIN tot ON tot.grp = g.grp),
      |mx AS (SELECT grp, max(dnum) AS dmax FROM d GROUP BY 1)
      |SELECT d.grp AS event_type, n_a, n_b,
      |  CAST(round(CAST(dmax AS DOUBLE) / (n_a * n_b) * 1000000.0) AS BIGINT)
      |    AS d_e6,
      |  min(v) AS d_at
      |FROM d JOIN mx ON mx.grp = d.grp AND d.dnum = mx.dmax
      |GROUP BY d.grp, n_a, n_b, dmax""".stripMargin

  /** q226 — Mann–Whitney rank-sum test
    * ([[graft.stats.Hypothesis.mannWhitneyU]]) on the same arms as
    * q225: the non-parametric mean-shift readout for heavy-tailed
    * metrics. Doubled midranks keep the rank sum and the statistic
    * exact longs (u2_a = 2·U_a); the tie-corrected normal z is the
    * one rounded double. */
  private def q226(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.mannWhitneyU(
      t(s, dir, "events").select(col("event_type"),
        pmod(col("user_id"), lit(2L)).as("arm"), cents(col("value")).as("v")),
      "event_type", "arm", "v")

  private val q226Sql =
    """WITH o AS (SELECT event_type AS grp, user_id % 2 AS arm,
      |             CAST(round(value*100) AS BIGINT) AS v FROM events),
      |g AS (SELECT grp, v,
      |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM o GROUP BY 1, 2),
      |r AS (SELECT grp, v, ca, cb, c,
      |        CAST(coalesce(sum(c) OVER (PARTITION BY grp ORDER BY v
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |          AS BIGINT) AS cumprev
      |      FROM g),
      |a AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n_a,
      |        CAST(sum(cb) AS BIGINT) AS n_b,
      |        CAST(sum(ca * (2*cumprev + c + 1)) AS BIGINT) AS r2_a,
      |        CAST(sum(c*c*c - c) AS BIGINT) AS tiesum
      |      FROM r GROUP BY 1),
      |b AS (SELECT grp, n_a, n_b, r2_a - n_a*(n_a + 1) AS u2_a, tiesum,
      |        n_a + n_b AS n FROM a),
      |c2 AS (SELECT grp, n_a, n_b, u2_a,
      |         CAST(n_a AS DOUBLE) * n_b / 12.0 *
      |           (CAST(n + 1 AS DOUBLE)
      |            - CAST(tiesum AS DOUBLE) / (n * (n - 1))) AS varu
      |       FROM b)
      |SELECT grp AS event_type, n_a, n_b, u2_a,
      |  CASE WHEN varu <= 0.0 THEN NULL
      |       ELSE CAST(round(CAST(u2_a - n_a*n_b AS DOUBLE) / 2.0
      |              / sqrt(varu) * 1000000.0) AS BIGINT) END AS z_e6
      |FROM c2""".stripMargin

  /** q230 — Benford first-digit audit per order priority: observed
    * first-significant-digit counts of the cents price vs the Benford
    * expectation p_d = log10(1+1/d) (anomaly screening for fabricated
    * or capped amounts). The digit comes from the decimal STRING head
    * (log10-free — exact in both engines at every power of ten); the
    * Benford probabilities are pinned as double literals shared with
    * the oracle; per-digit χ² terms are e6-rounded BEFORE the group
    * sum so chi2_e6 is an exact long sum (float-sum order never
    * enters the hash). Zero-observed digits stay in via the 9-digit
    * grid — their (0−np)²/np term is part of the statistic. */
  private def q230(s: SparkSession, dir: String): DataFrame = {
    val v = t(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"), cents(col("o_totalprice")).as("v"))
      .filter(col("v") > 0L)
      .withColumn("digit", substring(col("v").cast("string"), 1, 1).cast("long"))
    val obs = v.groupBy(col("grp"), col("digit")).agg(count(lit(1)).as("obs"))
    val n = v.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val p = when(col("digit") === 1L, 0.3010299956639812)
      .when(col("digit") === 2L, 0.17609125905568124)
      .when(col("digit") === 3L, 0.12493873660829992)
      .when(col("digit") === 4L, 0.09691001300805642)
      .when(col("digit") === 5L, 0.07918124604762482)
      .when(col("digit") === 6L, 0.06694678963061322)
      .when(col("digit") === 7L, 0.05799194697768673)
      .when(col("digit") === 8L, 0.05115252244738129)
      .otherwise(0.04575749056067514)
    val terms = n
      .crossJoin(n.sparkSession.range(1, 10).select(col("id").as("digit")))
      .join(obs, Seq("grp", "digit"), "left")
      .select(col("grp"), col("digit"), col("n"),
              coalesce(col("obs"), lit(0L)).as("obs"))
      .withColumn("e", col("n").cast("double") * p)
      .withColumn("exp_e6", round(col("e") * 1000000.0).cast("long"))
      .withColumn("term_e6",
        round((col("obs").cast("double") - col("e"))
          * (col("obs").cast("double") - col("e")) / col("e")
          * 1000000.0).cast("long"))
    val chi2 = terms.groupBy(col("grp")).agg(sum(col("term_e6")).as("chi2_e6"))
    terms.join(chi2, Seq("grp"))
      .select(col("grp").as("priority"), col("digit"), col("n"), col("obs"),
              col("exp_e6"), col("term_e6"), col("chi2_e6"))
  }

  private val q230Sql =
    """WITH v AS (SELECT o_orderpriority AS grp,
      |             CAST(substr(CAST(CAST(round(o_totalprice*100) AS BIGINT)
      |               AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |           FROM orders WHERE CAST(round(o_totalprice*100) AS BIGINT) > 0),
      |obs AS (SELECT grp, digit, CAST(count(*) AS BIGINT) AS obs
      |        FROM v GROUP BY 1, 2),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |grid AS (SELECT grp, n, CAST(unnest(generate_series(1, 9)) AS BIGINT)
      |           AS digit FROM n),
      |terms AS (SELECT grp, digit, n, CAST(coalesce(obs, 0) AS BIGINT) AS obs,
      |            CAST(n AS DOUBLE) * (CASE digit
      |              WHEN 1 THEN 0.3010299956639812
      |              WHEN 2 THEN 0.17609125905568124
      |              WHEN 3 THEN 0.12493873660829992
      |              WHEN 4 THEN 0.09691001300805642
      |              WHEN 5 THEN 0.07918124604762482
      |              WHEN 6 THEN 0.06694678963061322
      |              WHEN 7 THEN 0.05799194697768673
      |              WHEN 8 THEN 0.05115252244738129
      |              ELSE 0.04575749056067514 END) AS e
      |          FROM grid LEFT JOIN obs USING (grp, digit)),
      |t2 AS (SELECT grp, digit, n, obs,
      |         CAST(round(e * 1000000.0) AS BIGINT) AS exp_e6,
      |         CAST(round((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e)
      |           / e * 1000000.0) AS BIGINT) AS term_e6
      |       FROM terms)
      |SELECT grp AS priority, digit, n, obs, exp_e6, term_e6,
      |  CAST(sum(term_e6) OVER (PARTITION BY grp) AS BIGINT) AS chi2_e6
      |FROM t2""".stripMargin

  /** q235 — chi-square test of independence on the segment × nation
    * contingency table: are market segment and nation independent
    * attributes of the customer base? Expected counts ride exact
    * integer marginals (e = row·col/n as ONE double division);
    * per-cell χ² terms are e6-rounded BEFORE the total (the q230
    * long-sum discipline — no float-sum order in the hash);
    * zero-observed cells stay in via the marginal-product grid.
    * Everything is keyed aggregates over an attribute-sized grid
    * (5×25 cells) — corpus rows are touched exactly once. */
  private def q235(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"))
    val obs = c.groupBy(col("seg"), col("nat")).agg(count(lit(1)).as("obs"))
    val rowt = c.groupBy(col("seg")).agg(count(lit(1)).as("row_n"))
    val colt = c.groupBy(col("nat")).agg(count(lit(1)).as("col_n"))
    val n = c.agg(count(lit(1)).as("n"))
    val terms = rowt.crossJoin(colt).crossJoin(n)
      .join(obs, Seq("seg", "nat"), "left")
      .select(col("seg"), col("nat"), col("row_n"), col("col_n"), col("n"),
              coalesce(col("obs"), lit(0L)).as("obs"))
      .withColumn("e", (col("row_n") * col("col_n")).cast("double") / col("n"))
      .withColumn("exp_e6", round(col("e") * 1000000.0).cast("long"))
      .withColumn("term_e6",
        round((col("obs").cast("double") - col("e"))
          * (col("obs").cast("double") - col("e")) / col("e")
          * 1000000.0).cast("long"))
    val chi2 = terms.agg(sum(col("term_e6")).as("chi2_e6"))
    terms.crossJoin(chi2)
      .select(col("seg"), col("nat"), col("obs"), col("row_n"), col("col_n"),
              col("exp_e6"), col("term_e6"), col("chi2_e6"))
  }

  private val q235Sql =
    """WITH c AS (SELECT c_mktsegment AS seg, c_nationkey AS nat
      |           FROM customer),
      |obs AS (SELECT seg, nat, CAST(count(*) AS BIGINT) AS obs
      |        FROM c GROUP BY 1, 2),
      |rowt AS (SELECT seg, CAST(count(*) AS BIGINT) AS row_n
      |         FROM c GROUP BY 1),
      |colt AS (SELECT nat, CAST(count(*) AS BIGINT) AS col_n
      |         FROM c GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      |terms AS (SELECT seg, nat, row_n, col_n, n,
      |            CAST(coalesce(obs, 0) AS BIGINT) AS obs,
      |            CAST(row_n * col_n AS DOUBLE) / n AS e
      |          FROM rowt CROSS JOIN colt CROSS JOIN nn
      |          LEFT JOIN obs USING (seg, nat)),
      |t2 AS (SELECT seg, nat, obs, row_n, col_n,
      |         CAST(round(e * 1000000.0) AS BIGINT) AS exp_e6,
      |         CAST(round((CAST(obs AS DOUBLE) - e) * (CAST(obs AS DOUBLE) - e)
      |           / e * 1000000.0) AS BIGINT) AS term_e6
      |       FROM terms),
      |chi AS (SELECT CAST(sum(term_e6) AS BIGINT) AS chi2_e6 FROM t2)
      |SELECT seg, nat, obs, row_n, col_n, exp_e6, term_e6, chi2_e6
      |FROM t2 CROSS JOIN chi""".stripMargin

  /** q246 — mutual information of the q235 contingency table: the
    * information-theoretic strength of the segment↔nation
    * association (χ² says "dependent or not", MI says "how many nats
    * of one attribute the other reveals" — the feature-selection
    * number). Per-cell terms p_ij·ln(p_ij·n / (row·col)) e6-rounded
    * before the long total (the q168 discipline); zero-observed
    * cells contribute 0 by the p·ln p convention and drop via the
    * inner-join grid. */
  private def q246(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"))
    val obs = c.groupBy(col("seg"), col("nat")).agg(count(lit(1)).as("obs"))
    val rowt = c.groupBy(col("seg")).agg(count(lit(1)).as("row_n"))
    val colt = c.groupBy(col("nat")).agg(count(lit(1)).as("col_n"))
    val n = c.agg(count(lit(1)).as("n"))
    val terms = obs.join(rowt, Seq("seg")).join(colt, Seq("nat")).crossJoin(n)
      .withColumn("term_e6",
        round((col("obs").cast("double") / col("n")) *
          log((col("obs") * 1.0 * col("n")) /
              (col("row_n") * 1.0 * col("col_n")))
          * 1000000.0).cast("long"))
    val mi = terms.agg(sum(col("term_e6")).as("mi_e6"))
    terms.crossJoin(mi)
      .select(col("seg"), col("nat"), col("obs"), col("term_e6"), col("mi_e6"))
  }

  private val q246Sql =
    """WITH c AS (SELECT c_mktsegment AS seg, c_nationkey AS nat
      |           FROM customer),
      |obs AS (SELECT seg, nat, CAST(count(*) AS BIGINT) AS obs
      |        FROM c GROUP BY 1, 2),
      |rowt AS (SELECT seg, CAST(count(*) AS BIGINT) AS row_n
      |         FROM c GROUP BY 1),
      |colt AS (SELECT nat, CAST(count(*) AS BIGINT) AS col_n
      |         FROM c GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      |terms AS (SELECT seg, nat, obs,
      |            CAST(round((CAST(obs AS DOUBLE) / n) *
      |              ln((obs * 1.0 * n) / (row_n * 1.0 * col_n))
      |              * 1000000.0) AS BIGINT) AS term_e6
      |          FROM obs JOIN rowt USING (seg) JOIN colt USING (nat)
      |          CROSS JOIN nn),
      |mi AS (SELECT CAST(sum(term_e6) AS BIGINT) AS mi_e6 FROM terms)
      |SELECT seg, nat, obs, term_e6, mi_e6 FROM terms CROSS JOIN mi""".stripMargin

  /** q245 — population stability index (the ML-monitoring drift
    * number): reference-arm decile bins (arm 0's exact grid
    * percentiles, q216 cover rule — duplicate edges from heavy ties
    * are kept verbatim, both engines replay them identically), both
    * arms binned by counting edges below each grid value (a 9-row
    * per-group edge join — no range join), +1 Laplace smoothing so
    * empty bins stay defined, per-bin terms (p−q)·ln(p/q) e6-rounded
    * BEFORE the long total (the q168/q230 discipline). PSI < 0.1 is
    * the conventional "no shift" band. Complements q225: KS is the
    * max pointwise gap, PSI the binned mass-transfer summary. */
  private def q245(s: SparkSession, dir: String): DataFrame = {
    val obs = t(s, dir, "events")
      .select(col("event_type").as("grp"), pmod(col("user_id"), lit(2L)).as("arm"),
              cents(col("value")).as("v"))
    val edges = graft.pipeline.CorpusSketch.exactPercentiles(
        obs.filter(col("arm") === 0L), "grp", "v",
        Seq(10, 20, 30, 40, 50, 60, 70, 80, 90))
      .select(col("grp"), col("exact").as("e"))
    val grid = obs.groupBy(col("grp"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
    val binned = grid.join(edges, Seq("grp"))
      .groupBy(col("grp"), col("v"))
      .agg(first(col("ca")).as("ca"), first(col("cb")).as("cb"),
           sum(when(col("e") < col("v"), 1L).otherwise(0L)).as("bin"))
    val counts = binned.groupBy(col("grp"), col("bin"))
      .agg(sum(col("ca")).as("na_bin"), sum(col("cb")).as("nb_bin"))
    val tot = obs.groupBy(col("grp"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("na"),
           sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nb"))
    val p = (col("na_bin") + 1L).cast("double") / (col("na") + 10L)
    val q = (col("nb_bin") + 1L).cast("double") / (col("nb") + 10L)
    val terms = tot
      .crossJoin(tot.sparkSession.range(0, 10).select(col("id").as("bin")))
      .join(counts, Seq("grp", "bin"), "left")
      .select(col("grp"), col("bin"), col("na"), col("nb"),
              coalesce(col("na_bin"), lit(0L)).as("na_bin"),
              coalesce(col("nb_bin"), lit(0L)).as("nb_bin"))
      .withColumn("term_e6",
        round((p - q) *
          log(((col("na_bin") + 1L) * 1.0 * (col("nb") + 10L)) /
              ((col("nb_bin") + 1L) * 1.0 * (col("na") + 10L)))
          * 1000000.0).cast("long"))
    val psi = terms.groupBy(col("grp")).agg(sum(col("term_e6")).as("psi_e6"))
    terms.join(psi, Seq("grp"))
      .select(col("grp").as("event_type"), col("bin"), col("na_bin"),
              col("nb_bin"), col("term_e6"), col("psi_e6"))
  }

  private val q245Sql =
    """WITH o AS (SELECT event_type AS grp, user_id % 2 AS arm,
      |             CAST(round(value*100) AS BIGINT) AS v FROM events),
      |rg AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
      |       FROM o WHERE arm = 0 GROUP BY 1, 2),
      |rw AS (SELECT grp, v, c,
      |         sum(c) OVER (PARTITION BY grp ORDER BY v
      |                      ROWS UNBOUNDED PRECEDING) AS cum,
      |         sum(c) OVER (PARTITION BY grp) AS n
      |       FROM rg),
      |rx AS (SELECT grp, v, c, cum, n,
      |              unnest([CAST(10 AS BIGINT), CAST(20 AS BIGINT),
      |                      CAST(30 AS BIGINT), CAST(40 AS BIGINT),
      |                      CAST(50 AS BIGINT), CAST(60 AS BIGINT),
      |                      CAST(70 AS BIGINT), CAST(80 AS BIGINT),
      |                      CAST(90 AS BIGINT)]) AS q_pct
      |       FROM rw),
      |edges AS (SELECT grp, v AS e FROM rx
      |          WHERE cum - c < (n * q_pct + 99) // 100
      |            AND (n * q_pct + 99) // 100 <= cum),
      |grid AS (SELECT grp, v,
      |           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |             AS ca,
      |           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |             AS cb
      |         FROM o GROUP BY 1, 2),
      |binned AS (SELECT g.grp, g.v, max(ca) AS ca, max(cb) AS cb,
      |             CAST(sum(CASE WHEN edges.e < g.v THEN 1 ELSE 0 END)
      |               AS BIGINT) AS bin
      |           FROM grid g JOIN edges ON edges.grp = g.grp
      |           GROUP BY g.grp, g.v),
      |counts AS (SELECT grp, bin, CAST(sum(ca) AS BIGINT) AS na_bin,
      |                  CAST(sum(cb) AS BIGINT) AS nb_bin
      |           FROM binned GROUP BY 1, 2),
      |tot AS (SELECT grp,
      |          CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |            AS na,
      |          CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |            AS nb
      |        FROM o GROUP BY 1),
      |bins AS (SELECT grp, na, nb, CAST(unnest(generate_series(0, 9))
      |           AS BIGINT) AS bin FROM tot),
      |terms AS (SELECT b.grp, b.bin, b.na, b.nb,
      |            CAST(coalesce(na_bin, 0) AS BIGINT) AS na_bin,
      |            CAST(coalesce(nb_bin, 0) AS BIGINT) AS nb_bin
      |          FROM bins b LEFT JOIN counts USING (grp, bin)),
      |t2 AS (SELECT grp, bin, na_bin, nb_bin,
      |         CAST(round((CAST(na_bin + 1 AS DOUBLE) / (na + 10)
      |             - CAST(nb_bin + 1 AS DOUBLE) / (nb + 10))
      |           * ln(((na_bin + 1) * 1.0 * (nb + 10))
      |               / ((nb_bin + 1) * 1.0 * (na + 10)))
      |           * 1000000.0) AS BIGINT) AS term_e6
      |       FROM terms)
      |SELECT grp AS event_type, bin, na_bin, nb_bin, term_e6,
      |  CAST(sum(term_e6) OVER (PARTITION BY grp) AS BIGINT) AS psi_e6
      |FROM t2""".stripMargin

  /** q256 — Spearman's ρ ([[graft.stats.RankCorr.spearman]]) between
    * quantity and extended price per return flag: does line size rank
    * with line value once the linear assumption is dropped? Doubled
    * midranks from the value grid keep every rank exact; decimal
    * moment sums; one round-6 double. */
  private def q256(s: SparkSession, dir: String): DataFrame =
    graft.stats.RankCorr.spearman(
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
                col("l_quantity").cast("long").as("qty"),
                cents(col("l_extendedprice")).as("price_c")),
      "l_returnflag", "qty", "price_c")

  private val q256Sql =
    """WITH r AS (SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x,
      |             CAST(round(l_extendedprice*100) AS BIGINT) AS y
      |           FROM lineitem),
      |gx AS (SELECT grp, x, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1, 2),
      |mx AS (SELECT grp, x,
      |         2 * (sum(c) OVER (PARTITION BY grp ORDER BY x) - c) + c + 1 AS rx2
      |       FROM gx),
      |gy AS (SELECT grp, y, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1, 2),
      |my AS (SELECT grp, y,
      |         2 * (sum(c) OVER (PARTITION BY grp ORDER BY y) - c) + c + 1 AS ry2
      |       FROM gy),
      |j AS (SELECT r.grp, mx.rx2, my.ry2
      |      FROM r JOIN mx USING (grp, x) JOIN my USING (grp, y)),
      |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |        sum(rx2) AS sx, sum(ry2) AS sy, sum(rx2 * ry2) AS sxy,
      |        sum(rx2 * rx2) AS sxx, sum(ry2 * ry2) AS syy
      |      FROM j GROUP BY 1)
      |SELECT grp AS l_returnflag, n,
      |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |        (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
      |FROM s""".stripMargin

  /** q257 — Kendall's τ-b ([[graft.stats.RankCorr.kendallTauB]])
    * between quantity (50 levels) and discount step (11 levels) per
    * return flag — the ordinal-grid rank test; concordant/discordant
    * counts come from the bounded joint grid's cell pairs, all exact
    * longs. */
  private def q257(s: SparkSession, dir: String): DataFrame =
    graft.stats.RankCorr.kendallTauB(
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
                col("l_quantity").cast("long").as("qty"),
                round(col("l_discount") * 100).cast("long").as("disc")),
      "l_returnflag", "qty", "disc")

  private val q257Sql =
    """WITH r AS (SELECT l_returnflag AS grp, CAST(l_quantity AS BIGINT) AS x,
      |             CAST(round(l_discount*100) AS BIGINT) AS y
      |           FROM lineitem),
      |g AS (SELECT grp, x, y, CAST(count(*) AS BIGINT) AS c
      |      FROM r GROUP BY 1, 2, 3),
      |prod AS (SELECT a.grp,
      |           CAST(sum(CASE WHEN a.y < b.y THEN a.c * b.c ELSE 0 END)
      |                AS BIGINT) AS nc,
      |           CAST(sum(CASE WHEN a.y > b.y THEN a.c * b.c ELSE 0 END)
      |                AS BIGINT) AS nd
      |         FROM g a JOIN g b ON a.grp = b.grp AND a.x < b.x
      |         GROUP BY 1),
      |tx AS (SELECT grp, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS tie_x,
      |              CAST(sum(t) AS BIGINT) AS n
      |       FROM (SELECT grp, x, CAST(sum(c) AS BIGINT) AS t
      |             FROM g GROUP BY 1, 2) GROUP BY 1),
      |ty AS (SELECT grp, CAST(sum(t * (t - 1) // 2) AS BIGINT) AS tie_y
      |       FROM (SELECT grp, y, CAST(sum(c) AS BIGINT) AS t
      |             FROM g GROUP BY 1, 2) GROUP BY 1)
      |SELECT grp AS l_returnflag, n, nc, nd,
      |  round((CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE)) /
      |        (sqrt(CAST(n * (n - 1) // 2 AS DOUBLE) - CAST(tie_x AS DOUBLE)) *
      |         sqrt(CAST(n * (n - 1) // 2 AS DOUBLE) - CAST(tie_y AS DOUBLE))),
      |        6) AS tau_b
      |FROM prod JOIN tx USING (grp) JOIN ty USING (grp)""".stripMargin

  /** q258 — one-way ANOVA ([[graft.stats.Anova.anovaOneWay]]) of
    * order value across the five order priorities: per-priority
    * decomposition plus the global F, per-group terms integer-rounded
    * BEFORE the order-free long sums (the q235 ledger convention).
    * Values in WHOLE DOLLARS — the q240/CUPED whole-currency rule:
    * cents² sums of squares overflow int64 at sf0.1 already (caught
    * live in the r13 bench). */
  private def q258(s: SparkSession, dir: String): DataFrame =
    graft.stats.Anova.anovaOneWay(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
                round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q258Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |             CAST(round(o_totalprice) AS BIGINT) AS v
      |           FROM orders),
      |perg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
      |           CAST(sum(v) AS BIGINT) AS t_sum, sum(v * v) AS s2
      |         FROM r GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |          CAST(sum(t_sum) AS BIGINT) AS t,
      |          CAST(count(*) AS BIGINT) AS k FROM perg),
      |terms AS (SELECT grp, n_g, t_sum, k, n,
      |            CAST(t_sum AS DOUBLE) / n_g AS mean_g,
      |            CAST(t AS DOUBLE) / n AS mean_all, s2
      |          FROM perg CROSS JOIN tot),
      |t2 AS (SELECT grp, n_g, t_sum, k, n,
      |         CAST(round(mean_g * 100.0) AS BIGINT) AS mean_e2,
      |         CAST(round(CAST(n_g AS DOUBLE) * (mean_g - mean_all)
      |           * (mean_g - mean_all)) AS BIGINT) AS ssb_term,
      |         CAST(round(CAST(s2 AS DOUBLE) - CAST(t_sum AS DOUBLE)
      |           * CAST(t_sum AS DOUBLE) / n_g) AS BIGINT)
      |           AS ssw_term
      |       FROM terms),
      |gl AS (SELECT CAST(sum(ssb_term) AS BIGINT) AS ssb,
      |         CAST(sum(ssw_term) AS BIGINT) AS ssw FROM t2)
      |SELECT grp AS o_orderpriority, n_g, t_sum, mean_e2, ssb_term,
      |  ssb, ssw, k, n,
      |  CASE WHEN k > 1 AND n > k THEN
      |    round((CAST(ssb AS DOUBLE) / (k - 1)) /
      |          (CAST(ssw AS DOUBLE) / (n - k)), 6)
      |  END AS f
      |FROM t2 CROSS JOIN gl""".stripMargin

  /** q259 — Cramér's V ([[graft.stats.Anova.cramersV]]) of the
    * segment × nation table: q235 answers "dependent?"; this answers
    * "how strongly", normalized to [0, 1] across table shapes. */
  private def q259(s: SparkSession, dir: String): DataFrame =
    graft.stats.Anova.cramersV(
      t(s, dir, "customer"), "c_mktsegment", "c_nationkey")

  private val q259Sql =
    """WITH c AS (SELECT c_mktsegment AS a, c_nationkey AS b FROM customer),
      |obs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS obs
      |        FROM c GROUP BY 1, 2),
      |rowt AS (SELECT a, CAST(count(*) AS BIGINT) AS row_n FROM c GROUP BY 1),
      |colt AS (SELECT b, CAST(count(*) AS BIGINT) AS col_n FROM c GROUP BY 1),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      |terms AS (SELECT row_n, col_n, n, CAST(coalesce(obs, 0) AS BIGINT) AS obs,
      |            CAST(row_n * col_n AS DOUBLE) / n AS e
      |          FROM rowt CROSS JOIN colt CROSS JOIN nn
      |          LEFT JOIN obs USING (a, b)),
      |t2 AS (SELECT CAST(round((CAST(obs AS DOUBLE) - e)
      |         * (CAST(obs AS DOUBLE) - e) / e * 1000000.0) AS BIGINT)
      |         AS term_e6 FROM terms),
      |dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM rowt) AS r,
      |                (SELECT CAST(count(*) AS BIGINT) FROM colt) AS c)
      |SELECT nn.n, dims.r, dims.c,
      |  CAST(sum(t2.term_e6) AS BIGINT) AS chi2_e6,
      |  round(sqrt((CAST(sum(t2.term_e6) AS BIGINT) / 1000000.0) /
      |             (nn.n * (least(dims.r, dims.c) - 1))), 6) AS v
      |FROM t2 CROSS JOIN dims CROSS JOIN nn
      |GROUP BY nn.n, dims.r, dims.c""".stripMargin

  /** q260 — Holt double exponential smoothing
    * ([[graft.ts.ExpSmooth.doubleExpSmooth]], α = 0.2, β = 0.3) of
    * daily order revenue per priority — recursive level+trend state
    * on the exact cents grid; the oracle replays the recurrence with
    * a recursive CTE over the day index. */
  private def q260(s: SparkSession, dir: String): DataFrame =
    graft.ts.ExpSmooth.doubleExpSmooth(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q260Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM daily),
      |hw AS (
      |  SELECT k, rn, d, y, y AS l, CAST(0 AS BIGINT) AS b, y AS pred
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y,
      |    (2 * s.y + 8 * (hw.l + hw.b)) // 10,
      |    (3 * (((2 * s.y + 8 * (hw.l + hw.b)) // 10) - hw.l)
      |     + 7 * hw.b) // 10,
      |    hw.l + hw.b
      |  FROM hw JOIN s ON s.k = hw.k AND s.rn = hw.rn + 1)
      |SELECT k AS o_orderpriority, d AS o_orderdate, y AS y_c,
      |  CAST(l AS BIGINT) AS level_c, CAST(b AS BIGINT) AS trend_c,
      |  CAST(pred AS BIGINT) AS pred_c
      |FROM hw""".stripMargin

  /** q261 — Kaplan–Meier time-to-second-order
    * ([[graft.ts.Survival.kaplanMeier]]): days from a customer's
    * first DISTINCT order date to the second, right-censored at the
    * corpus max date for single-date customers — the repeat-purchase
    * curve an "average reorder gap" biases by dropping everyone who
    * hasn't reordered. Survival on the e6 grid, one truncating
    * division per event step; the oracle replays the ordered product
    * with a recursive CTE. */
  private def q261(s: SparkSession, dir: String): DataFrame = {
    val dd = t(s, dir, "orders")
      .select(col("o_custkey").as("cust"), col("o_orderdate").as("d"))
      .distinct()
    val firsts = dd.groupBy(col("cust")).agg(min(col("d")).as("d1"))
    val seconds = dd.join(firsts, Seq("cust"))
      .filter(col("d") > col("d1"))
      .groupBy(col("cust")).agg(min(col("d")).as("d2"))
    val maxd = dd.agg(max(col("d")).as("md"))
    val subjects = firsts.join(seconds, Seq("cust"), "left")
      .crossJoin(broadcast(maxd))
      .select(
        datediff(coalesce(col("d2"), col("md")), col("d1")).cast("long")
          .as("dur"),
        col("d2").isNotNull.cast("long").as("ev"))
    graft.ts.Survival.kaplanMeier(subjects, "dur", "ev")
  }

  private val q261Sql =
    """WITH RECURSIVE dd AS (SELECT DISTINCT o_custkey AS cust,
      |                             o_orderdate AS d FROM orders),
      |f AS (SELECT cust, min(d) AS d1 FROM dd GROUP BY 1),
      |s2 AS (SELECT dd.cust, min(dd.d) AS d2
      |       FROM dd JOIN f ON f.cust = dd.cust AND dd.d > f.d1 GROUP BY 1),
      |mx AS (SELECT max(d) AS md FROM dd),
      |subj AS (SELECT CAST(date_diff('day', d1, COALESCE(d2, md)) AS BIGINT)
      |                  AS t,
      |                CASE WHEN d2 IS NULL THEN 0 ELSE 1 END AS ev
      |         FROM f LEFT JOIN s2 USING (cust) CROSS JOIN mx),
      |grid AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d_events,
      |                CAST(sum(1 - ev) AS BIGINT) AS c_censored,
      |                CAST(count(*) AS BIGINT) AS n_at
      |         FROM subj GROUP BY 1),
      |pref AS (SELECT t, d_events, c_censored, n_at,
      |           CAST(sum(n_at) OVER (ORDER BY t) - n_at AS BIGINT) AS cumb
      |         FROM grid),
      |tot AS (SELECT CAST(sum(n_at) AS BIGINT) AS n FROM grid),
      |steps AS (SELECT t, d_events, c_censored,
      |            CAST(n - cumb AS BIGINT) AS n_risk,
      |            row_number() OVER (ORDER BY t) AS rn
      |          FROM pref CROSS JOIN tot),
      |km AS (
      |  SELECT rn, t, n_risk, d_events, c_censored,
      |         (1000000 * (n_risk - d_events)) // n_risk AS sv
      |  FROM steps WHERE rn = 1
      |  UNION ALL
      |  SELECT st.rn, st.t, st.n_risk, st.d_events, st.c_censored,
      |         (km.sv * (st.n_risk - st.d_events)) // st.n_risk
      |  FROM km JOIN steps st ON st.rn = km.rn + 1)
      |SELECT t, n_risk, d_events, c_censored, CAST(sv AS BIGINT) AS s_e6
      |FROM km""".stripMargin

  /** q263 — classical additive decomposition
    * ([[graft.ts.Decompose.stlWeekly]]): daily event revenue split
    * into 7-day-MA trend + weekday seasonal + residual, the anomaly
    * triage that says WHICH component moved. Exact detrended integers
    * (7·y − Σ₇) keep every cross-row sum long; edge days emit honest
    * nulls. */
  private def q263(s: SparkSession, dir: String): DataFrame =
    graft.ts.Decompose.stlWeekly(dailyCents(s, dir), "event_type", "ds", "y")

  private val q263Sql =
    s"""WITH $dailySql,
      |win AS (SELECT event_type, ds, y,
      |          sum(y) OVER w AS s7, count(*) OVER w AS n7,
      |          dayofweek(ds) + 1 AS dow
      |        FROM daily
      |        WINDOW w AS (PARTITION BY event_type ORDER BY ds
      |                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |det AS (SELECT *, CASE WHEN n7 = 7 THEN 7 * y - s7 END AS detr_c7
      |        FROM win),
      |seas AS (SELECT event_type, dow,
      |           CAST(round(CAST(sum(detr_c7) AS DOUBLE) / count(*) / 7.0
      |                      * 1000000.0) AS BIGINT) AS s_e6
      |         FROM det WHERE detr_c7 IS NOT NULL GROUP BY 1, 2),
      |nrm AS (SELECT event_type, CAST(sum(s_e6) AS BIGINT) AS s_sum,
      |          CAST(count(*) AS BIGINT) AS s_n
      |        FROM seas GROUP BY 1),
      |adj AS (SELECT seas.event_type, dow,
      |          CAST(s_e6 - s_sum // s_n AS BIGINT) AS seasonal_e6
      |        FROM seas JOIN nrm USING (event_type))
      |SELECT det.event_type, ds, y AS y_c,
      |  CASE WHEN n7 = 7
      |    THEN CAST(round(CAST(s7 AS DOUBLE) / 7.0 * 1000000.0) AS BIGINT)
      |  END AS trend_e6,
      |  seasonal_e6,
      |  CASE WHEN n7 = 7
      |    THEN CAST(y * 1000000
      |         - CAST(round(CAST(s7 AS DOUBLE) / 7.0 * 1000000.0) AS BIGINT)
      |         - seasonal_e6 AS BIGINT)
      |  END AS resid_e6
      |FROM det LEFT JOIN adj
      |  ON adj.event_type = det.event_type AND adj.dow = det.dow""".stripMargin

  /** q264 — clamped inventory balance
    * ([[graft.ts.Inventory.clampedBalance]]): per event type, a
    * signed daily net movement (credits from even users, debits from
    * odd — deterministic from the data) folded through
    * bal′ = max(0, bal + δ) with the swallowed shortfall emitted as
    * stockout_c. A window sum CANNOT express the clamp (after a
    * stockout the balance rebuilds from zero, not from the fictitious
    * negative) — the oracle replays the recurrence with a recursive
    * CTE. */
  private def q264(s: SparkSession, dir: String): DataFrame = {
    val deltas = t(s, dir, "events")
      .groupBy(col("event_type"), dayBucket(col("ts")).as("ds"))
      .agg(sum(when(pmod(col("user_id"), lit(2)) === 0,
                    cents(col("value")))
               .otherwise(-cents(col("value")))).as("delta"))
    graft.ts.Inventory.clampedBalance(deltas, "event_type", "ds", "delta")
  }

  private val q264Sql =
    """WITH RECURSIVE deltas AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CASE WHEN user_id % 2 = 0
      |                  THEN CAST(round(value*100) AS BIGINT)
      |                  ELSE -CAST(round(value*100) AS BIGINT) END)
      |              AS BIGINT) AS delta
      |  FROM events GROUP BY 1, 2),
      |s AS (SELECT event_type, ds, delta,
      |        row_number() OVER (PARTITION BY event_type ORDER BY ds) AS rn
      |      FROM deltas),
      |bal AS (
      |  SELECT event_type, rn, ds, delta,
      |         greatest(CAST(0 AS BIGINT), delta) AS b,
      |         greatest(CAST(0 AS BIGINT), -delta) AS short
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.event_type, s.rn, s.ds, s.delta,
      |         greatest(CAST(0 AS BIGINT), bal.b + s.delta),
      |         greatest(CAST(0 AS BIGINT), -(bal.b + s.delta))
      |  FROM bal JOIN s ON s.event_type = bal.event_type
      |                 AND s.rn = bal.rn + 1)
      |SELECT event_type, ds, delta AS delta_c, b AS balance_c,
      |       short AS stockout_c
      |FROM bal""".stripMargin

  /** q267 — Holt–Winters triple exponential smoothing
    * ([[graft.ts.ExpSmooth.tripleExpSmooth]], α = 0.2, β = 0.1,
    * γ = 0.3, weekly period m = 7) of daily order revenue per
    * priority — q260's level+trend recursion plus an additive
    * seasonal state array, so the weekly rhythm is absorbed by the
    * seasonal indices instead of whipsawing the trend. The oracle
    * replays the recursion with a recursive CTE whose state carries
    * the length-7 seasonal LIST (indexed `list_transform` update —
    * the same exact-long grid as the engine's fold). */
  private def q267(s: SparkSession, dir: String): DataFrame =
    graft.ts.ExpSmooth.tripleExpSmooth(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q267Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM daily),
      |hw AS (
      |  SELECT k, rn, d, y, y AS l, CAST(0 AS BIGINT) AS b,
      |         [0,0,0,0,0,0,0]::BIGINT[] AS sv,
      |         CAST(0 AS BIGINT) AS seas, y AS pred
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y,
      |    (2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |     + 8 * (hw.l + hw.b)) // 10,
      |    (1 * (((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |            + 8 * (hw.l + hw.b)) // 10) - hw.l)
      |     + 9 * hw.b) // 10,
      |    list_transform(hw.sv, (e, i) -> CASE WHEN i = (hw.rn % 7) + 1
      |      THEN (3 * (s.y - ((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |                         + 8 * (hw.l + hw.b)) // 10))
      |            + 7 * hw.sv[(hw.rn % 7) + 1]) // 10
      |      ELSE e END),
      |    (3 * (s.y - ((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |                  + 8 * (hw.l + hw.b)) // 10))
      |     + 7 * hw.sv[(hw.rn % 7) + 1]) // 10,
      |    hw.l + hw.b + hw.sv[(hw.rn % 7) + 1]
      |  FROM hw JOIN s ON s.k = hw.k AND s.rn = hw.rn + 1)
      |SELECT k AS o_orderpriority, d AS o_orderdate, y AS y_c,
      |  CAST(l AS BIGINT) AS level_c, CAST(b AS BIGINT) AS trend_c,
      |  CAST(seas AS BIGINT) AS seas_c, CAST(pred AS BIGINT) AS pred_c
      |FROM hw""".stripMargin

  /** q296 — SEEDED Holt–Winters
    * ([[graft.ts.ExpSmooth.tripleExpSmoothSeeded]], same α/β/γ/m as
    * q267): the textbook first-cycle initialization — seed level =
    * first-week mean (truncating div), seed seasonal = first-week
    * deviations, pred NULL during the seed week — closing q267's
    * documented all-zero-init tradeoff (whose cycle 1 is just Holt).
    * The oracle replays the seed aggregates and the same recursive
    * CTE anchored at rn = 7 with the seeded state. */
  private def q296(s: SparkSession, dir: String): DataFrame =
    graft.ts.ExpSmooth.tripleExpSmoothSeeded(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q296Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM daily),
      |sd AS (SELECT k, CAST(sum(y) // 7 AS BIGINT) AS lseed
      |       FROM s WHERE rn <= 7 GROUP BY 1),
      |sv0 AS (SELECT s.k, sd.lseed,
      |          list(s.y - sd.lseed ORDER BY s.rn) AS sv
      |        FROM s JOIN sd ON sd.k = s.k WHERE s.rn <= 7
      |        GROUP BY s.k, sd.lseed),
      |hw AS (
      |  SELECT s.k, s.rn, s.d, s.y, sv0.lseed AS l,
      |         CAST(0 AS BIGINT) AS b, sv0.sv AS sv,
      |         CAST(NULL AS BIGINT) AS seas, CAST(NULL AS BIGINT) AS pred
      |  FROM s JOIN sv0 ON sv0.k = s.k WHERE s.rn = 7
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y,
      |    (2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |     + 8 * (hw.l + hw.b)) // 10,
      |    (1 * (((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |            + 8 * (hw.l + hw.b)) // 10) - hw.l)
      |     + 9 * hw.b) // 10,
      |    list_transform(hw.sv, (e, i) -> CASE WHEN i = (hw.rn % 7) + 1
      |      THEN (3 * (s.y - ((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |                         + 8 * (hw.l + hw.b)) // 10))
      |            + 7 * hw.sv[(hw.rn % 7) + 1]) // 10
      |      ELSE e END),
      |    (3 * (s.y - ((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |                  + 8 * (hw.l + hw.b)) // 10))
      |     + 7 * hw.sv[(hw.rn % 7) + 1]) // 10,
      |    hw.l + hw.b + hw.sv[(hw.rn % 7) + 1]
      |  FROM hw JOIN s ON s.k = hw.k AND s.rn = hw.rn + 1)
      |SELECT s.k AS o_orderpriority, s.d AS o_orderdate, s.y AS y_c,
      |  sd.lseed AS level_c, CAST(0 AS BIGINT) AS trend_c,
      |  CAST(s.y - sd.lseed AS BIGINT) AS seas_c,
      |  CAST(NULL AS BIGINT) AS pred_c
      |FROM s JOIN sd ON sd.k = s.k WHERE s.rn <= 7
      |UNION ALL
      |SELECT k AS o_orderpriority, d AS o_orderdate, y AS y_c,
      |  CAST(l AS BIGINT) AS level_c, CAST(b AS BIGINT) AS trend_c,
      |  CAST(seas AS BIGINT) AS seas_c, CAST(pred AS BIGINT) AS pred_c
      |FROM hw WHERE rn >= 8""".stripMargin

  /** q317 — Kruskal–Wallis H ([[graft.stats.Hypothesis
    * .kruskalWallis]]): do the five priorities' whole-dollar order
    * values differ in DISTRIBUTION — the non-parametric twin of
    * q258's ANOVA (same input, rank-based, no normality assumption),
    * with the exact doubled-midrank ledger and the standard tie
    * correction. */
  private def q317(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.kruskalWallis(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
                round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q317Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |            CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
      |ga AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM r GROUP BY 1),
      |pre AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum FROM ga),
      |r2t AS (SELECT v, c, 2*(cum - c) + c + 1 AS r2 FROM pre),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |          CAST(sum(c*c*c - c) AS BIGINT) AS tiesum FROM ga),
      |pg AS (SELECT grp, CAST(sum(cg) AS BIGINT) AS n_g,
      |         sum(CAST(cg AS HUGEINT) * r2) AS r2s
      |       FROM (SELECT grp, v, count(*) AS cg FROM r GROUP BY 1, 2) j
      |       JOIN r2t USING (v) GROUP BY 1),
      |t2 AS (SELECT grp, n_g, r2s, n, tiesum,
      |         CAST((r2s - CAST(n_g AS HUGEINT) * (n + 1))
      |              * (r2s - CAST(n_g AS HUGEINT) * (n + 1))
      |              // n_g AS BIGINT) AS h_term
      |       FROM pg CROSS JOIN tot),
      |g AS (SELECT CAST(sum(CAST(h_term AS HUGEINT)) AS BIGINT) AS h_sum,
      |        CAST(count(*) AS BIGINT) AS k FROM t2)
      |SELECT grp AS o_orderpriority, n_g,
      |  CAST(r2s AS BIGINT) AS r2_sum, h_term, n, k,
      |  CASE WHEN k < 2 OR tiesum >= n*n*n - n THEN NULL
      |    ELSE CAST(round(3.0 * h_sum
      |      / (CAST(n AS DOUBLE) * (n + 1))
      |      / (1.0 - CAST(tiesum AS DOUBLE)
      |         / (CAST(n AS DOUBLE) * n * n - n)) * 1000000)
      |      AS BIGINT) END AS h_e6
      |FROM t2 CROSS JOIN g""".stripMargin

  /** q318 — Ljung–Box portmanteau ([[graft.stats.Diagnostics
    * .ljungBox]], h = 5) over q20's daily event series: is there ANY
    * autocorrelation left — the whiteness gate composed from the
    * same biased ACF, each lag term exact on the e6 grid. */
  private def q318(s: SparkSession, dir: String): DataFrame =
    graft.stats.Diagnostics.ljungBox(
      dailyCents(s, dir).withColumnRenamed("event_type", "series"),
      "series", Some(5))
      .select(col("series").as("event_type"), col("n_obs"),
              col("h_lags"), col("q_e6"))

  private val q318Sql =
    s"""WITH $dailySql,
      |m AS (SELECT event_type, CAST(sum(y) AS DOUBLE)/count(*) AS mu,
      |        count(*) AS n FROM daily GROUP BY 1),
      |d AS (SELECT daily.event_type, ds, y - mu AS dev, n
      |      FROM daily JOIN m ON daily.event_type = m.event_type),
      |lags AS (SELECT CAST(unnest(range(0, 6)) AS INTEGER) AS k),
      |pairs AS (SELECT d1.event_type, l.k, d1.dev * d2.dev AS prod,
      |            d1.n AS n
      |          FROM d d1 CROSS JOIN lags l
      |          JOIN d d2 ON d2.event_type = d1.event_type
      |                   AND d2.ds = d1.ds + l.k),
      |sums AS (SELECT event_type, k, sum(prod) AS sm, max(n) AS n
      |         FROM pairs GROUP BY 1, 2),
      |r AS (SELECT s.event_type, s.k,
      |        CAST(round((s.sm/s.n) / (c.sm/c.n) * 1000000) AS BIGINT)
      |          AS r_e6,
      |        s.n
      |      FROM sums s JOIN sums c ON c.event_type = s.event_type
      |                             AND c.k = 0
      |      WHERE s.k >= 1),
      |t AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n_obs,
      |        CAST(count(*) AS BIGINT) AS h_lags,
      |        CAST(sum(r_e6 * r_e6 // (n - k)) AS BIGINT) AS sm2
      |      FROM r GROUP BY 1)
      |SELECT event_type, n_obs, h_lags,
      |  CAST(CAST(n_obs AS HUGEINT) * (n_obs + 2) * sm2 // 1000000
      |    AS BIGINT) AS q_e6
      |FROM t""".stripMargin

  /** q328 — Theta-method smoothing ([[graft.ts.ExpSmooth
    * .thetaSmooth]], θ = 2, α = 0.2) over daily order revenue per
    * priority: the OLS-trend / SES decomposition forecast — drift
    * from the θ = 0 line, local level from SES on the θ = 2 line,
    * one-step prediction their average; exact e6 integers end to
    * end, oracle-replayed by a recursive CTE carrying the SES
    * state. */
  private def q328(s: SparkSession, dir: String): DataFrame =
    graft.ts.ExpSmooth.thetaSmooth(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q328Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM daily),
      |cf AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(rn * y) AS BIGINT) AS sty FROM s GROUP BY 1),
      |ab AS (SELECT k, n, sy,
      |         CASE WHEN n < 2 THEN CAST(0 AS BIGINT)
      |           ELSE CAST((CAST(n AS HUGEINT) * sty
      |               - CAST(n * (n + 1) // 2 AS HUGEINT) * sy) * 1000000
      |             // (CAST(n AS HUGEINT) * n
      |                * (CAST(n AS HUGEINT) * n - 1) // 12)
      |             AS BIGINT) END AS b_e6
      |       FROM cf),
      |ab2 AS (SELECT k,
      |          CAST((CAST(sy AS HUGEINT) * 1000000
      |              - CAST(b_e6 AS HUGEINT) * (n * (n + 1) // 2)) // n
      |            AS BIGINT) AS a_e6,
      |          b_e6
      |        FROM ab),
      |th AS (
      |  SELECT s.k, rn, d, y,
      |    a_e6 + b_e6 AS line,
      |    2 * 1000000 * y - (a_e6 + b_e6) AS l,
      |    1000000 * y AS pred, a_e6, b_e6
      |  FROM s JOIN ab2 ON ab2.k = s.k WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y,
      |    th.a_e6 + th.b_e6 * s.rn,
      |    (2 * (2 * 1000000 * s.y - (th.a_e6 + th.b_e6 * s.rn))
      |     + 8 * th.l) // 10,
      |    (th.l + th.a_e6 + th.b_e6 * s.rn) // 2,
      |    th.a_e6, th.b_e6
      |  FROM th JOIN s ON s.k = th.k AND s.rn = th.rn + 1)
      |SELECT k AS o_orderpriority, d AS o_orderdate, y AS y_c,
      |  CAST(line AS BIGINT) AS line_e6, CAST(l AS BIGINT) AS ses_e6,
      |  CAST(pred AS BIGINT) AS pred_e6
      |FROM th""".stripMargin

  /** q329 — Page–Hinkley drift ledger ([[graft.ts.SeriesOps
    * .pageHinkley]], δ = 0, λ = 2·10¹¹) over q20's daily series: the
    * ONLINE change detector (running-mean deviations, cumulative U,
    * min/max envelopes, alarm flags both directions) whose streaming
    * twin carries seven longs of state per series — the batch ledger
    * is the parity reference and the oracle replays every day. */
  private def q329(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesOps.pageHinkley(
      dailyCents(s, dir), "event_type", "ds", "y",
      deltaE6 = 0L, lambdaE6 = 200000000000L)

  private val q329Sql =
    s"""WITH $dailySql,
      |seq AS (SELECT event_type, ds, y,
      |          row_number() OVER (PARTITION BY event_type ORDER BY ds)
      |            AS t,
      |          sum(y) OVER (PARTITION BY event_type ORDER BY ds) AS cum
      |        FROM daily),
      |dv AS (SELECT event_type, ds, y,
      |         CAST(CAST(t * y - cum AS HUGEINT) * 1000000 // t AS BIGINT)
      |           AS dev
      |       FROM seq),
      |uu AS (SELECT event_type, ds, y,
      |         sum(dev) OVER (PARTITION BY event_type ORDER BY ds) AS u
      |       FROM dv),
      |mm AS (SELECT event_type, ds, y, CAST(u AS BIGINT) AS u_e6,
      |         CAST(min(u) OVER (PARTITION BY event_type ORDER BY ds)
      |           AS BIGINT) AS m,
      |         CAST(max(u) OVER (PARTITION BY event_type ORDER BY ds)
      |           AS BIGINT) AS w
      |       FROM uu)
      |SELECT event_type, ds, y AS y_c, u_e6,
      |  CASE WHEN u_e6 - m > 200000000000 THEN CAST(1 AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS alarm_up,
      |  CASE WHEN w - u_e6 > 200000000000 THEN CAST(1 AS BIGINT)
      |    ELSE CAST(0 AS BIGINT) END AS alarm_down
      |FROM mm""".stripMargin

  /** q330 — pinball-loss quantile scorecard ([[graft.ts.ForecastEval
    * .pinballScorecard]], w = 28, q ∈ {0.1, 0.5, 0.9}) over daily
    * order revenue per priority: grade the trailing-28-day exact
    * order-statistic quantile forecaster by the loss whose minimizer
    * IS the quantile, plus empirical coverage — the probabilistic
    * complement to q269's point-forecast scorecard. */
  private def q330(s: SparkSession, dir: String): DataFrame =
    graft.ts.ForecastEval.pinballScorecard(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y", w = 28)

  private val q330Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |h AS (SELECT k, d, y,
      |        list_sort(list(y) OVER (PARTITION BY k ORDER BY d
      |          ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING)) AS srt,
      |        count(*) OVER (PARTITION BY k ORDER BY d
      |          ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING) AS cnt
      |      FROM daily),
      |f AS (SELECT k, y, srt FROM h WHERE cnt = 28),
      |q AS (SELECT * FROM (VALUES (1, 10, 3), (5, 10, 14), (9, 10, 25))
      |        t(qn, qd, idx)),
      |l AS (SELECT k, qn, qd, y, srt[idx] AS pred
      |      FROM f CROSS JOIN q)
      |SELECT k AS o_orderpriority, CAST(qn AS BIGINT) AS q_num,
      |  CAST(qd AS BIGINT) AS q_den,
      |  CAST(count(*) AS BIGINT) AS n_eval,
      |  CAST(CAST(sum(CASE WHEN y >= pred THEN qn * (y - pred)
      |      ELSE (qd - qn) * (pred - y) END) AS HUGEINT) * 1000000
      |    // (count(*) * qd) AS BIGINT) AS pinball_e6,
      |  CAST(sum(CASE WHEN y <= pred THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) AS cover_e6
      |FROM l GROUP BY k, qn, qd""".stripMargin

  /** q331 — Anderson–Darling k-sample test ([[graft.stats.Hypothesis
    * .andersonDarlingK]]) on q258's input: do the five priorities'
    * whole-dollar order values differ ANYWHERE in the distribution —
    * the tail-sensitive member (KS weighs the single largest gap,
    * KW only location; A² integrates squared gaps with 1/(F(1−F))
    * weight). Doubled-count exact ledger, split-division e6 cells. */
  private def q331(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.andersonDarlingK(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
                round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q331Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |             CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
      |ga AS (SELECT v, CAST(count(*) AS BIGINT) AS l FROM r GROUP BY 1),
      |g2 AS (SELECT v, l,
      |         CAST(2 * sum(l) OVER (ORDER BY v) - l AS BIGINT) AS b2
      |       FROM ga),
      |tot AS (SELECT CAST(sum(l) AS BIGINT) AS n,
      |          CAST(count(*) AS BIGINT) AS n_vals FROM ga),
      |grps AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g
      |         FROM r GROUP BY 1),
      |pergv AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c
      |          FROM r GROUP BY 1, 2),
      |dense AS (SELECT grps.grp, n_g, g2.v, l, b2,
      |            coalesce(c, 0) AS cij
      |          FROM g2 CROSS JOIN grps
      |          LEFT JOIN pergv ON pergv.grp = grps.grp
      |                         AND pergv.v = g2.v),
      |pg AS (SELECT grp, n_g, v, l, b2, cij,
      |         sum(cij) OVER (PARTITION BY grp ORDER BY v) AS cumg
      |       FROM dense),
      |cells AS (SELECT grp, n_g, l, n, n_vals,
      |            CAST(n AS HUGEINT) * (2 * cumg - cij)
      |              - CAST(n_g AS HUGEINT) * b2 AS num,
      |            CAST(b2 AS HUGEINT) * (2 * n - b2)
      |              - CAST(n AS HUGEINT) * l AS den
      |          FROM pg CROSS JOIN tot),
      |rc AS (SELECT grp, n_g, n, n_vals,
      |         CAST(l AS HUGEINT) * (CASE WHEN den <= 0 THEN 0
      |           ELSE (num * num // den) * 1000000
      |                + ((num * num) % den) * 1000000 // den END) AS cell
      |       FROM cells),
      |pgv AS (SELECT grp, CAST(max(n_g) AS BIGINT) AS n_g,
      |          CAST(max(n) AS BIGINT) AS n,
      |          CAST(max(n_vals) AS BIGINT) AS n_vals,
      |          sum(cell) AS g_sum FROM rc GROUP BY 1),
      |gi AS (SELECT grp, n_g, n, n_vals, g_sum // n_g AS gi FROM pgv),
      |t AS (SELECT sum(gi) AS t_sum, CAST(count(*) AS BIGINT) AS k
      |      FROM gi)
      |SELECT grp AS o_orderpriority, n_g, n, k,
      |  CASE WHEN k < 2 OR n_vals < 2 THEN NULL
      |    ELSE CAST((CAST(n AS HUGEINT) - 1) * t_sum
      |      // (CAST(n AS HUGEINT) * n) AS BIGINT)
      |  END AS a2_e6
      |FROM gi CROSS JOIN t""".stripMargin

  /** q332 — SPRT experiment ledger ([[graft.ts.Sprt.sprtLedger]],
    * H0: p = 0.5 vs H1: p = 0.55, α = 0.05, β = 0.2) per event type:
    * treat each event's value &gt; 500 as a Bernoulli outcome and ask,
    * day by day, whether the test can STOP — the first boundary
    * crossing freezes the decision (the sequential contract). The
    * four log terms are driver-quantized e6 literals embedded in
    * BOTH engines' plans, so neither engine evaluates a
    * transcendental. */
  private def q332(s: SparkSession, dir: String): DataFrame =
    graft.ts.Sprt.sprtLedger(
      t(s, dir, "events")
        .groupBy(col("event_type"), dayBucket(col("ts")).as("ds"))
        .agg(sum((col("value") > 500.0).cast("long")).as("succ"),
             count(lit(1)).as("n")),
      "event_type", "ds", "succ", "n", p0 = 0.5, p1 = 0.55)

  private val q332Sql = {
    val (l1, l0, a, b) = graft.ts.Sprt.literals(0.5, 0.55, 0.05, 0.2)
    s"""WITH daily AS (
      |  SELECT event_type AS k, CAST(date_trunc('day', ts) AS DATE) AS d,
      |    CAST(sum(CASE WHEN value > 500 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS s,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |led AS (SELECT k, d, s, n - s AS f,
      |    CAST(sum(s) OVER (PARTITION BY k ORDER BY d) AS BIGINT)
      |      AS s_cum,
      |    CAST(sum(n - s) OVER (PARTITION BY k ORDER BY d) AS BIGINT)
      |      AS f_cum
      |  FROM daily),
      |l2 AS (SELECT k, d, s, f,
      |    s_cum * ($l1) + f_cum * ($l0) AS llr,
      |    CASE WHEN s_cum * ($l1) + f_cum * ($l0) >= ($a) THEN 1
      |         WHEN s_cum * ($l1) + f_cum * ($l0) <= ($b) THEN -1
      |         ELSE 0 END AS crs
      |  FROM led)
      |SELECT k AS event_type, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(sum(s) AS BIGINT) AS s_tot, CAST(sum(f) AS BIGINT) AS f_tot,
      |  CAST(max_by(llr, d) AS BIGINT) AS llr_e6,
      |  CAST(coalesce(arg_min(crs, CASE WHEN crs != 0 THEN d END), 0)
      |    AS BIGINT) AS decision,
      |  min(CASE WHEN crs != 0 THEN d END) AS decided_day
      |FROM l2 GROUP BY k""".stripMargin
  }

  /** q333 — MULTIPLICATIVE Holt–Winters ([[graft.ts.ExpSmooth
    * .tripleExpSmoothMul]], m = 7) over daily order revenue per
    * priority: ratio seasonality for rhythms that scale with the
    * level — the seasonal state lives on the e6 ratio grid and the
    * oracle replays the recursion carrying the factor list. */
  private def q333(s: SparkSession, dir: String): DataFrame =
    graft.ts.ExpSmooth.tripleExpSmoothMul(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y", m = 7)

  private val q333Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM daily),
      |hw AS (
      |  SELECT k, rn, d, y, y AS l, CAST(0 AS BIGINT) AS b,
      |         [1000000,1000000,1000000,1000000,1000000,1000000,1000000]
      |           ::BIGINT[] AS sv,
      |         CAST(1000000 AS BIGINT) AS seas, y AS pred
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y,
      |    (2 * (CASE WHEN hw.sv[(hw.rn % 7) + 1] <= 0 THEN s.y
      |          ELSE (s.y * 1000000) // hw.sv[(hw.rn % 7) + 1] END)
      |     + 8 * (hw.l + hw.b)) // 10,
      |    (1 * (((2 * (CASE WHEN hw.sv[(hw.rn % 7) + 1] <= 0 THEN s.y
      |            ELSE (s.y * 1000000) // hw.sv[(hw.rn % 7) + 1] END)
      |            + 8 * (hw.l + hw.b)) // 10) - hw.l)
      |     + 9 * hw.b) // 10,
      |    list_transform(hw.sv, (e, i) -> CASE WHEN i = (hw.rn % 7) + 1
      |      THEN (CASE WHEN ((2 * (CASE WHEN hw.sv[(hw.rn % 7) + 1] <= 0
      |              THEN s.y
      |              ELSE (s.y * 1000000) // hw.sv[(hw.rn % 7) + 1] END)
      |              + 8 * (hw.l + hw.b)) // 10) <= 0
      |        THEN hw.sv[(hw.rn % 7) + 1]
      |        ELSE (3 * ((s.y * 1000000)
      |               // ((2 * (CASE WHEN hw.sv[(hw.rn % 7) + 1] <= 0
      |                    THEN s.y
      |                    ELSE (s.y * 1000000)
      |                         // hw.sv[(hw.rn % 7) + 1] END)
      |                    + 8 * (hw.l + hw.b)) // 10))
      |              + 7 * hw.sv[(hw.rn % 7) + 1]) // 10 END)
      |      ELSE e END),
      |    (CASE WHEN ((2 * (CASE WHEN hw.sv[(hw.rn % 7) + 1] <= 0
      |            THEN s.y
      |            ELSE (s.y * 1000000) // hw.sv[(hw.rn % 7) + 1] END)
      |            + 8 * (hw.l + hw.b)) // 10) <= 0
      |      THEN hw.sv[(hw.rn % 7) + 1]
      |      ELSE (3 * ((s.y * 1000000)
      |             // ((2 * (CASE WHEN hw.sv[(hw.rn % 7) + 1] <= 0
      |                  THEN s.y
      |                  ELSE (s.y * 1000000)
      |                       // hw.sv[(hw.rn % 7) + 1] END)
      |                  + 8 * (hw.l + hw.b)) // 10))
      |            + 7 * hw.sv[(hw.rn % 7) + 1]) // 10 END),
      |    ((hw.l + hw.b) * hw.sv[(hw.rn % 7) + 1]) // 1000000
      |  FROM hw JOIN s ON s.k = hw.k AND s.rn = hw.rn + 1)
      |SELECT k AS o_orderpriority, d AS o_orderdate, y AS y_c,
      |  CAST(l AS BIGINT) AS level_c, CAST(b AS BIGINT) AS trend_c,
      |  CAST(seas AS BIGINT) AS seas_e6, CAST(pred AS BIGINT) AS pred_c
      |FROM hw""".stripMargin

  /** q334 — Durbin–Watson ([[graft.stats.Diagnostics.durbinWatson]])
    * on OLS-detrended daily series: the lag-1-specific whiteness
    * gate after a trend fit — residuals on the q328 once-quantized
    * e6 coefficient grid, DW = Σ(Δr)²·10⁶ div Σr² exact. */
  private def q334(s: SparkSession, dir: String): DataFrame =
    graft.stats.Diagnostics.durbinWatson(
      dailyCents(s, dir).withColumnRenamed("event_type", "series"),
      "series")
      .select(col("series").as("event_type"), col("n_obs"), col("dw_e6"))

  private val q334Sql =
    s"""WITH $dailySql,
      |s AS (SELECT event_type AS k, ds AS d, y,
      |        row_number() OVER (PARTITION BY event_type ORDER BY ds)
      |          AS rn
      |      FROM daily),
      |cf AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(rn * y) AS BIGINT) AS sty FROM s GROUP BY 1),
      |ab AS (SELECT k, n, sy,
      |         CAST((CAST(n AS HUGEINT) * sty
      |             - CAST(n * (n + 1) // 2 AS HUGEINT) * sy) * 1000000
      |           // (CAST(n AS HUGEINT) * n
      |              * (CAST(n AS HUGEINT) * n - 1) // 12)
      |           AS HUGEINT) AS b_e6
      |       FROM cf WHERE n >= 3),
      |ab2 AS (SELECT k, n, b_e6,
      |          (CAST(sy AS HUGEINT) * 1000000
      |           - b_e6 * (n * (n + 1) // 2)) // n AS a_e6
      |        FROM ab),
      |r AS (SELECT s.k, rn,
      |        CAST(s.y AS HUGEINT) * 1000000 - (a_e6 + b_e6 * rn) AS res,
      |        n
      |      FROM s JOIN ab2 ON ab2.k = s.k),
      |dr AS (SELECT k, rn, res, n,
      |         res - lag(res) OVER (PARTITION BY k ORDER BY rn) AS d1
      |       FROM r),
      |agg AS (SELECT k, CAST(max(n) AS BIGINT) AS n_obs,
      |          sum(res * res) AS den,
      |          sum(CASE WHEN rn >= 2 THEN d1 * d1 END) AS num
      |        FROM dr GROUP BY 1)
      |SELECT cf.k AS event_type, cf.n AS n_obs,
      |  CASE WHEN den IS NULL OR den = 0 THEN NULL
      |    ELSE CAST(num * 1000000 // den AS BIGINT) END AS dw_e6
      |FROM cf LEFT JOIN agg ON agg.k = cf.k""".stripMargin

  /** q335 — Wald–Wolfowitz runs test ([[graft.stats.Diagnostics
    * .runsTest]]) vs the exact lower median of each daily series:
    * the randomness gate — too few above/below-median runs means
    * regime clustering, too many means alternation; exact counts,
    * one mirrored double tree for z. */
  private def q335(s: SparkSession, dir: String): DataFrame =
    graft.stats.Diagnostics.runsTest(
      dailyCents(s, dir).withColumnRenamed("event_type", "series"),
      "series")
      .select(col("series").as("event_type"), col("n_obs"),
        col("med_c"), col("n_above"), col("n_below"), col("runs"),
        col("z_e6"))

  private val q335Sql =
    s"""WITH $dailySql,
      |base AS (SELECT event_type AS k, ds AS d, y FROM daily),
      |rk AS (SELECT k, y, row_number() OVER (PARTITION BY k ORDER BY y)
      |         AS vr,
      |         count(*) OVER (PARTITION BY k) AS n
      |       FROM base),
      |med AS (SELECT k, CAST(max(n) AS BIGINT) AS n_obs,
      |          CAST(max(CASE WHEN vr = (n + 1) // 2 THEN y END)
      |            AS BIGINT) AS med
      |        FROM rk GROUP BY 1),
      |sg AS (SELECT b.k, d, CASE WHEN y > med THEN 1 ELSE -1 END AS sn
      |       FROM base b JOIN med ON med.k = b.k WHERE y != med),
      |sq AS (SELECT k, sn, lag(sn) OVER (PARTITION BY k ORDER BY d)
      |         AS pr FROM sg),
      |ag AS (SELECT k,
      |         CAST(sum(CASE WHEN sn = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n1,
      |         CAST(sum(CASE WHEN sn = -1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n2,
      |         CAST(1 + sum(CASE WHEN pr IS NOT NULL AND sn != pr
      |           THEN 1 ELSE 0 END) AS BIGINT) AS runs
      |       FROM sq GROUP BY 1)
      |SELECT med.k AS event_type, n_obs, med AS med_c,
      |  coalesce(n1, 0) AS n_above, coalesce(n2, 0) AS n_below,
      |  coalesce(runs, 0) AS runs,
      |  CASE WHEN n1 IS NULL OR n1 = 0 OR n2 = 0 OR n1 + n2 < 2
      |    THEN NULL
      |    ELSE CAST(round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0))
      |      / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
      |             / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
      |                * (n1 + n2 - 1.0))) * 1000000) AS BIGINT)
      |  END AS z_e6
      |FROM med LEFT JOIN ag ON ag.k = med.k""".stripMargin

  /** q336 — SEASONAL Mann–Kendall ([[graft.ts.TrendTest
    * .seasonalMannKendall]], months as seasons) over daily order
    * revenue per priority: compare only like months so the annual
    * cycle can't bury (or fake) a multi-year trend — per-season
    * trend_fold statistics combined by exact integer sums
    * (Hirsch–Slack, independent seasons). */
  private def q336(s: SparkSession, dir: String): DataFrame =
    graft.ts.TrendTest.seasonalMannKendall(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y"))
        .withColumn("mth", month(col("o_orderdate")).cast("long")),
      "o_orderpriority", "o_orderdate", "y", "mth")

  private val q336Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |ds AS (SELECT k, CAST(month(d) AS BIGINT) AS g, d, y FROM daily),
      |pr AS (SELECT a.k, a.g,
      |         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
      |              ELSE 0 END AS sg
      |       FROM ds a JOIN ds b ON a.k = b.k AND a.g = b.g
      |                          AND a.d < b.d),
      |ss AS (SELECT k, g, CAST(sum(sg) AS BIGINT) AS s_g
      |       FROM pr GROUP BY 1, 2),
      |nn AS (SELECT k, g, CAST(count(*) AS BIGINT) AS n_g
      |       FROM ds GROUP BY 1, 2),
      |ti AS (SELECT k, g, CAST(sum(CAST(t AS HUGEINT)*(t-1)*(2*t+5))
      |           AS BIGINT) AS tie18
      |       FROM (SELECT k, g, y, count(*) AS t FROM ds
      |             GROUP BY 1, 2, 3)
      |       GROUP BY 1, 2),
      |vv AS (SELECT nn.k, nn.g, n_g, coalesce(s_g, 0) AS s_g,
      |         CAST(n_g AS HUGEINT)*(n_g-1)*(2*n_g+5) - tie18 AS v_g
      |       FROM nn LEFT JOIN ss ON ss.k = nn.k AND ss.g = nn.g
      |               JOIN ti ON ti.k = nn.k AND ti.g = nn.g),
      |ag AS (SELECT k, CAST(count(*) AS BIGINT) AS n_seasons,
      |         CAST(sum(n_g) AS BIGINT) AS n_obs,
      |         CAST(sum(s_g) AS BIGINT) AS s_stat,
      |         CAST(sum(v_g) AS BIGINT) AS var18
      |       FROM vv GROUP BY 1)
      |SELECT k AS o_orderpriority, n_seasons, n_obs, s_stat, var18,
      |  CAST(CASE WHEN var18 <= 0 THEN NULL
      |    ELSE round((s_stat - CASE WHEN s_stat > 0 THEN 1
      |                              WHEN s_stat < 0 THEN -1 ELSE 0 END)
      |      / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000000.0) END
      |    AS BIGINT) AS z_e6
      |FROM ag""".stripMargin

  /** q337 — Jonckheere–Terpstra ([[graft.stats.Hypothesis
    * .jonckheereTerpstra]]): do whole-dollar order values trend with
    * the priority's dose rank — the ordered-alternative sharpening
    * of q317's Kruskal–Wallis (and q322's continuous-outcome
    * counterpart), exact doubled pair counts over the dense
    * dose × grid frame, Hollander–Wolfe tie variance. */
  private def q337(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.jonckheereTerpstra(
      t(s, dir, "orders")
        .select(substring(col("o_orderpriority"), 1, 1).cast("long")
                  .as("g"),
                round(col("o_totalprice")).cast("long").as("v")),
      "g", "v")

  private val q337Sql =
    """WITH r AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT)
      |             AS g,
      |             CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
      |ga AS (SELECT v, CAST(count(*) AS BIGINT) AS l FROM r GROUP BY 1),
      |grps AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g
      |         FROM r GROUP BY 1),
      |pergv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
      |          FROM r GROUP BY 1, 2),
      |dense AS (SELECT grps.g, n_g, ga.v, coalesce(c, 0) AS c
      |          FROM ga CROSS JOIN grps
      |          LEFT JOIN pergv ON pergv.g = grps.g AND pergv.v = ga.v),
      |pg AS (SELECT g, v, c,
      |         sum(c) OVER (PARTITION BY g ORDER BY v) AS cumc
      |       FROM dense),
      |aa AS (SELECT g, v, c, 2 * (cumc - c) + c AS a FROM pg),
      |pa AS (SELECT g, v, c,
      |         coalesce(sum(a) OVER (PARTITION BY v ORDER BY g
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS pref_a
      |       FROM aa),
      |jj AS (SELECT sum(CAST(c AS HUGEINT) * pref_a) AS j2 FROM pa),
      |tg AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |         CAST(count(*) AS BIGINT) AS k,
      |         sum(CAST(n_g AS HUGEINT) * n_g) AS sn2,
      |         sum(CAST(n_g AS HUGEINT)*(n_g-1)*(2*n_g+5)) AS g18,
      |         sum(CAST(n_g AS HUGEINT)*(n_g-1)*(n_g-2)) AS g3,
      |         CAST(sum(n_g*(n_g-1)) AS BIGINT) AS g2 FROM grps),
      |tv AS (SELECT sum(CAST(l AS HUGEINT)*(l-1)*(2*l+5)) AS t18,
      |         sum(CAST(l AS HUGEINT)*(l-1)*(l-2)) AS t3,
      |         CAST(sum(l*(l-1)) AS BIGINT) AS t2 FROM ga)
      |SELECT n, k, CAST(j2 AS BIGINT) AS j2,
      |  CAST((CAST(n AS HUGEINT) * n - sn2) // 2 AS BIGINT) AS e2,
      |  CASE WHEN k < 2 OR
      |      (CAST(CAST(n AS HUGEINT)*(n-1)*(2*n+5) - g18 - t18
      |         AS DOUBLE) / 72.0
      |       + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)
      |         / (36.0 * (CAST(n AS DOUBLE) * (n - 1.0) * (n - 2.0)))
      |       + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)
      |         / (8.0 * (CAST(n AS DOUBLE) * (n - 1.0)))) <= 0
      |    THEN NULL
      |    ELSE CAST(round(
      |      CAST(j2 - (CAST(n AS HUGEINT) * n - sn2) // 2 AS DOUBLE)
      |      / 2.0
      |      / sqrt(CAST(CAST(n AS HUGEINT)*(n-1)*(2*n+5) - g18 - t18
      |           AS DOUBLE) / 72.0
      |         + CAST(g3 AS DOUBLE) * CAST(t3 AS DOUBLE)
      |           / (36.0 * (CAST(n AS DOUBLE) * (n - 1.0) * (n - 2.0)))
      |         + CAST(g2 AS DOUBLE) * CAST(t2 AS DOUBLE)
      |           / (8.0 * (CAST(n AS DOUBLE) * (n - 1.0))))
      |      * 1000000) AS BIGINT)
      |  END AS z_e6
      |FROM jj CROSS JOIN tg CROSS JOIN tv""".stripMargin

  /** q338 — Ansari–Bradley scale test ([[graft.stats.Hypothesis
    * .ansariBradley]]) on q305's arms: do the two arms differ in
    * SPREAD, ranks only — center-heavy scores min(r, N+1−r), exact
    * permutation moments against the actual score multiset (no
    * even/odd cases, ties by construction). */
  private def q338(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.ansariBradley(
      t(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"),
                cents(col("value")).as("v")),
      "event_type", "arm", "v")

  private val q338Sql =
    """WITH o AS (
      |  SELECT event_type AS grp, user_id % 2 AS arm,
      |         CAST(round(value*100) AS BIGINT) AS v FROM events),
      |g AS (SELECT grp, v,
      |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS ca,
      |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS cb
      |      FROM o GROUP BY 1, 2),
      |r AS (SELECT grp, v, ca, cb, ca + cb AS c,
      |        2 * (sum(ca + cb) OVER (PARTITION BY grp ORDER BY v)
      |             - (ca + cb)) + (ca + cb) + 1 AS r2
      |      FROM g),
      |tt AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_all
      |       FROM r GROUP BY 1),
      |sc AS (SELECT r.grp, ca, cb, c,
      |         least(r2, 2 * n_all + 2 - r2) AS s2
      |       FROM r JOIN tt ON tt.grp = r.grp),
      |ag AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n_a,
      |         CAST(sum(cb) AS BIGINT) AS n_b,
      |         CAST(sum(ca * s2) AS BIGINT) AS w2,
      |         CAST(sum(c * s2) AS BIGINT) AS s1,
      |         sum(CAST(c AS HUGEINT) * s2 * s2) AS s2sq
      |       FROM sc GROUP BY 1)
      |SELECT grp AS event_type, n_a, n_b, w2,
      |  CASE WHEN n_a + n_b < 2 OR CAST(n_a AS HUGEINT) * n_b
      |        * (CAST(n_a + n_b AS HUGEINT) * s2sq
      |           - CAST(s1 AS HUGEINT) * s1) <= 0 THEN NULL
      |    ELSE CAST(round(
      |      CAST(CAST(n_a + n_b AS HUGEINT) * w2
      |           - CAST(n_a AS HUGEINT) * s1 AS DOUBLE)
      |      / sqrt(CAST(CAST(n_a AS HUGEINT) * n_b
      |          * (CAST(n_a + n_b AS HUGEINT) * s2sq
      |             - CAST(s1 AS HUGEINT) * s1) AS DOUBLE)
      |          / (n_a + n_b - 1))
      |      * 1000000) AS BIGINT) END AS z_e6
      |FROM ag""".stripMargin

  /** Shared frame for q341/q342: monthly revenue per priority dose —
    * blocks = months, treatments = the 5 priorities (dose = the
    * digit prefix, the q322/q337 device). Month grain keeps blocks
    * COMPLETE at every scale factor (a sparse-day grain leaves no
    * day with all five priorities at tiny SF — the complete-block
    * filter would empty the test). */
  private def prioDaily(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(substring(col("o_orderpriority"), 1, 1).cast("long")
                 .as("dose"),
               to_date(date_trunc("month", col("o_orderdate"))).as("blk"))
      .agg(sum(cents(col("o_totalprice"))).as("y"))

  private val prioDailySql =
    """daily AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS dose,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS blk,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
      |           AS BIGINT) AS y
      |  FROM orders GROUP BY 1, 2),
      |kt AS (SELECT CAST(count(DISTINCT dose) AS BIGINT) AS k
      |       FROM daily),
      |comp AS (SELECT blk FROM daily CROSS JOIN kt
      |         GROUP BY blk, k
      |         HAVING count(*) = max(k)
      |            AND count(DISTINCT dose) = max(k)),
      |ib AS (SELECT d.* FROM daily d JOIN comp USING (blk)),
      |cnt AS (SELECT blk, v, count(*) AS c
      |        FROM (SELECT blk, y AS v FROM ib) GROUP BY 1, 2),
      |r2t AS (SELECT blk, v,
      |          2 * (sum(c) OVER (PARTITION BY blk ORDER BY v) - c)
      |            + c + 1 AS r2
      |        FROM cnt),
      |rk AS (SELECT ib.dose, r2
      |       FROM ib JOIN r2t ON r2t.blk = ib.blk AND r2t.v = ib.y),
      |pt AS (SELECT dose, CAST(sum(r2) AS BIGINT) AS r2_sum,
      |         CAST(count(*) AS BIGINT) AS n_blocks
      |       FROM rk GROUP BY 1)""".stripMargin

  /** q341 — Page's trend test ([[graft.stats.Hypothesis.pageTrend]]):
    * does monthly revenue INCREASE along the priority dose, judged
    * within each month — the repeated-measures ordered sharpening
    * that completes the pair symmetry (KW → Jonckheere :: Friedman →
    * Page). Blocks = months (complete only), doubled midranks, exact
    * integer L2, one double tree for z. */
  private def q341(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.pageTrend(prioDaily(s, dir), "blk", "dose", "y")

  private val q341Sql =
    s"""WITH $prioDailySql,
      |dr AS (SELECT dose,
      |         CAST(row_number() OVER (ORDER BY dose) AS BIGINT)
      |           AS c_rank
      |       FROM (SELECT DISTINCT dose FROM daily)),
      |tot AS (SELECT CAST(sum(c_rank * r2_sum) AS BIGINT) AS l2,
      |          CAST(max(n_blocks) AS BIGINT) AS n
      |        FROM pt JOIN dr USING (dose))
      |SELECT pt.dose, c_rank, r2_sum, n_blocks, k, l2,
      |  CAST(CASE WHEN k < 3 OR n < 1 THEN NULL ELSE round(
      |    (l2 - CAST(n AS DOUBLE) * k * (k + 1) * (k + 1) / 2.0)
      |    / sqrt(CAST(n AS DOUBLE) * k * k * (k + 1) * (k + 1)
      |           * (k - 1) / 36.0) * 1000000) END AS BIGINT) AS z_e6
      |FROM pt JOIN dr USING (dose) CROSS JOIN tot CROSS JOIN kt""".stripMargin

  /** q342 — Kendall's W ([[graft.stats.Hypothesis.kendallW]]): how
    * strongly the months AGREE on the priority ranking — the
    * concordance effect size over q326's Friedman evidence,
    * tie-corrected, exact integer ledger, one truncating e6
    * division. */
  private def q342(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.kendallW(prioDaily(s, dir), "blk", "dose", "y")

  private val q342Sql =
    s"""WITH $prioDailySql,
      |ties AS (SELECT CAST(coalesce(sum(c*c*c - c), 0) AS BIGINT)
      |           AS sum_t FROM cnt),
      |tot AS (SELECT sum(CAST(r2_sum AS HUGEINT) * r2_sum) AS sr2,
      |          CAST(max(n_blocks) AS BIGINT) AS n
      |        FROM pt)
      |SELECT n AS n_blocks, k, sum_t,
      |  CASE WHEN k < 2 OR CAST(n AS HUGEINT) * n * k * (k*k - 1)
      |        - CAST(n AS HUGEINT) * sum_t <= 0 THEN NULL
      |    ELSE CAST((3 * (sr2 - CAST(n AS HUGEINT) * n * k
      |        * (k + 1) * (k + 1))) * 1000000
      |      // (CAST(n AS HUGEINT) * n * k * (k*k - 1)
      |         - CAST(n AS HUGEINT) * sum_t) AS BIGINT) END AS w_e6
      |FROM tot CROSS JOIN kt CROSS JOIN ties""".stripMargin

  /** q343 — Mood's median test ([[graft.stats.Hypothesis
    * .moodMedian]]): per event type, do the three user arms differ
    * around the pooled LOWER median — the outlier-immune k-sample
    * gate next to q317's rank-powered one; grid-prefix median, exact
    * cells, per-arm e6-rounded χ² terms. */
  private def q343(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.moodMedian(
      t(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(3L)).as("arm"),
                cents(col("value")).as("v")),
      "event_type", "arm", "v")

  private val q343Sql =
    """WITH o AS (
      |  SELECT event_type AS grp, user_id % 3 AS arm,
      |         CAST(round(value*100) AS BIGINT) AS v FROM events),
      |cnt AS (SELECT grp, v, count(*) AS c FROM o GROUP BY 1, 2),
      |cm AS (SELECT grp, v,
      |         sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum
      |       FROM cnt),
      |nn AS (SELECT grp, CAST(max(cum) AS BIGINT) AS n
      |       FROM cm GROUP BY 1),
      |med AS (SELECT cm.grp, CAST(min(v) AS BIGINT) AS med
      |        FROM cm JOIN nn USING (grp)
      |        WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |cells AS (SELECT o.grp, arm, med,
      |            CAST(sum(CASE WHEN v > med THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_above,
      |            CAST(sum(CASE WHEN v <= med THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_le
      |          FROM o JOIN med USING (grp) GROUP BY 1, 2, 3),
      |marg AS (SELECT grp, CAST(sum(n_above) AS BIGINT) AS ta,
      |           CAST(sum(n_le) AS BIGINT) AS tl,
      |           CAST(count(*) AS BIGINT) AS k
      |         FROM cells GROUP BY 1),
      |chi AS (SELECT cells.grp,
      |          CAST(sum(CAST(round((
      |            (n_above - (n_above + n_le) * CAST(ta AS DOUBLE)
      |               / (ta + tl))
      |            * (n_above - (n_above + n_le) * CAST(ta AS DOUBLE)
      |               / (ta + tl))
      |            / ((n_above + n_le) * CAST(ta AS DOUBLE) / (ta + tl))
      |            + (n_le - (n_above + n_le) * CAST(tl AS DOUBLE)
      |               / (ta + tl))
      |            * (n_le - (n_above + n_le) * CAST(tl AS DOUBLE)
      |               / (ta + tl))
      |            / ((n_above + n_le) * CAST(tl AS DOUBLE) / (ta + tl))
      |          ) * 1000000) AS BIGINT)) AS BIGINT) AS chi2_e6_sum,
      |          CAST(max(k) AS BIGINT) AS k,
      |          CAST(min(ta) AS BIGINT) AS ta,
      |          CAST(min(tl) AS BIGINT) AS tl
      |        FROM cells JOIN marg USING (grp) GROUP BY 1)
      |SELECT cells.grp AS event_type, arm, n_above, n_le,
      |  med AS med_c,
      |  CASE WHEN chi.k < 2 OR chi.ta = 0 OR chi.tl = 0 THEN NULL
      |    ELSE chi2_e6_sum END AS chi2_e6
      |FROM cells JOIN chi ON chi.grp = cells.grp""".stripMargin

  /** q322 — Cochran–Armitage trend test ([[graft.stats.Hypothesis
    * .cochranArmitage]]): does the fill rate (status 'F') move
    * monotonically with order PRIORITY (the digit prefix as the
    * ordered dose) — the one-degree sharpening of q213's
    * independence χ² for ordered groups. */
  private def q322(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.cochranArmitage(
      t(s, dir, "orders")
        .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("w"),
                (col("o_orderstatus") === "F").cast("long").as("y")),
      "w", "y")

  private val q322Sql =
    """WITH o AS (
      |  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
      |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |  FROM orders),
      |pg AS (SELECT w, CAST(count(*) AS BIGINT) AS n_g,
      |         CAST(sum(y) AS BIGINT) AS r_g FROM o GROUP BY 1),
      |ag AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |         CAST(sum(r_g) AS BIGINT) AS r,
      |         CAST(count(*) AS BIGINT) AS k,
      |         CAST(sum(w * r_g) AS BIGINT) AS u,
      |         CAST(sum(w * n_g) AS BIGINT) AS wn,
      |         CAST(sum(w * w * n_g) AS BIGINT) AS w2n FROM pg)
      |SELECT n, r, k,
      |  CASE WHEN n < 2 OR CAST(r AS HUGEINT) * (n - r)
      |        * (CAST(n AS HUGEINT) * w2n - CAST(wn AS HUGEINT) * wn) <= 0
      |    THEN NULL
      |    ELSE CAST(round(
      |      CAST(CAST(n AS HUGEINT) * u - CAST(r AS HUGEINT) * wn AS DOUBLE)
      |      / sqrt(CAST(CAST(r AS HUGEINT) * (n - r)
      |          * (CAST(n AS HUGEINT) * w2n - CAST(wn AS HUGEINT) * wn)
      |          AS DOUBLE) / (n - 1))
      |      * 1000000) AS BIGINT) END AS z_e6
      |FROM ag""".stripMargin

  /** q323 — Cliff's delta ([[graft.stats.Hypothesis.cliffsDelta]])
    * per event type on q305's arms: the EFFECT SIZE next to the
    * Welch/MWU p-values — P(a&gt;b) − P(a&lt;b) on the n-free
    * [−1, 1] scale, exact over the per-type value grid. */
  private def q323(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.cliffsDelta(
      t(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"),
                cents(col("value")).as("v")),
      "event_type", "arm", "v")

  private val q323Sql =
    """WITH o AS (
      |  SELECT event_type AS grp, user_id % 2 AS arm,
      |         CAST(round(value*100) AS BIGINT) AS v FROM events),
      |g AS (SELECT grp, v,
      |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS ca,
      |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS cb
      |      FROM o GROUP BY 1, 2),
      |pre AS (SELECT grp, v, ca, cb,
      |          sum(cb) OVER (PARTITION BY grp ORDER BY v) AS cumb
      |        FROM g),
      |ag AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n_a,
      |         CAST(sum(cb) AS BIGINT) AS n_b,
      |         sum(CAST(ca AS HUGEINT) * (cumb - cb)) AS gt,
      |         sum(CAST(ca AS HUGEINT) * cumb) AS s_le
      |       FROM pre GROUP BY 1)
      |SELECT grp AS event_type, n_a, n_b,
      |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
      |    ELSE CAST((gt - (CAST(n_a AS HUGEINT) * n_b - s_le)) * 1000000
      |      // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) END AS delta_e6
      |FROM ag""".stripMargin

  /** q326 — Friedman test ([[graft.stats.Hypothesis.friedman]]):
    * do the five event types differ in daily volume when ranked
    * WITHIN each day — the repeated-measures complement to q317
    * (blocks = days kill the day-to-day level shifts a pooled rank
    * test would drown in). Complete days only; within-day doubled
    * midranks; exact tie-corrected χ²_F. */
  private def q326(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.friedman(
      dailyCents(s, dir), "ds", "event_type", "y")

  private val q326Sql =
    s"""WITH $dailySql,
      |kt AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
      |       FROM daily),
      |cb AS (SELECT ds, count(*) AS c_rows,
      |         count(DISTINCT event_type) AS c_trt FROM daily GROUP BY 1),
      |comp AS (SELECT ds FROM cb CROSS JOIN kt
      |         WHERE c_rows = c_trt AND c_trt = kt.k),
      |ib AS (SELECT d.event_type, d.ds, d.y
      |       FROM daily d JOIN comp USING (ds)),
      |cnt AS (SELECT ds, y, CAST(count(*) AS BIGINT) AS c
      |        FROM ib GROUP BY 1, 2),
      |r2t AS (SELECT ds, y,
      |          2 * (sum(c) OVER (PARTITION BY ds ORDER BY y) - c)
      |            + c + 1 AS r2
      |        FROM cnt),
      |rk AS (SELECT ib.event_type, CAST(r2 AS BIGINT) AS r2
      |       FROM ib JOIN r2t ON r2t.ds = ib.ds AND r2t.y = ib.y),
      |pt AS (SELECT event_type, CAST(sum(r2) AS BIGINT) AS r2_sum,
      |         CAST(count(*) AS BIGINT) AS n_blocks,
      |         CAST(sum(r2 * r2) AS BIGINT) AS a2p
      |       FROM rk GROUP BY 1),
      |tt AS (SELECT CAST(sum(a2p) AS BIGINT) AS a2,
      |         CAST(max(n_blocks) AS BIGINT) AS n FROM pt),
      |terms AS (SELECT event_type, r2_sum, n_blocks, kt.k AS k,
      |            (r2_sum - CAST(n AS HUGEINT) * (kt.k + 1))
      |              * (r2_sum - CAST(n AS HUGEINT) * (kt.k + 1)) AS dev2,
      |            a2 - CAST(n AS HUGEINT) * kt.k * (kt.k + 1) * (kt.k + 1)
      |              AS den
      |          FROM pt CROSS JOIN tt CROSS JOIN kt),
      |g AS (SELECT sum(dev2) AS num, max(den) AS den FROM terms)
      |SELECT event_type, r2_sum, n_blocks, k,
      |  CASE WHEN g.den <= 0 OR k < 2 THEN NULL
      |    ELSE CAST((k - 1) * num * 1000000 // g.den AS BIGINT)
      |  END AS chi2_e6
      |FROM terms CROSS JOIN g""".stripMargin

  /** q327 — dominant-period detection ([[graft.stats.Diagnostics
    * .acfPeriod]], lags 2..10) over q20's daily series: read the
    * season length OFF the data (argmax biased ACF, earliest-lag
    * ties) with the ±1.96/√n white-noise gate — the lag-7 answer
    * the Holt–Winters queries take as config. */
  private def q327(s: SparkSession, dir: String): DataFrame =
    graft.stats.Diagnostics.acfPeriod(
      dailyCents(s, dir).withColumnRenamed("event_type", "series"),
      "series", minLag = 2, nlags = Some(10))
      .select(col("series").as("event_type"), col("n_obs"),
              col("best_lag"), col("r_e6"), col("thr_e6"),
              col("significant"))

  private val q327Sql =
    s"""WITH $dailySql,
      |m AS (SELECT event_type, CAST(sum(y) AS DOUBLE)/count(*) AS mu,
      |        count(*) AS n FROM daily GROUP BY 1),
      |d AS (SELECT daily.event_type, ds, y - mu AS dev, n
      |      FROM daily JOIN m ON daily.event_type = m.event_type),
      |lags AS (SELECT CAST(unnest(range(0, 11)) AS INTEGER) AS k),
      |pairs AS (SELECT d1.event_type, l.k, d1.dev * d2.dev AS prod,
      |            d1.n AS n
      |          FROM d d1 CROSS JOIN lags l
      |          JOIN d d2 ON d2.event_type = d1.event_type
      |                   AND d2.ds = d1.ds + l.k),
      |sums AS (SELECT event_type, k, sum(prod) AS sm, max(n) AS n
      |         FROM pairs GROUP BY 1, 2),
      |r AS (SELECT s.event_type, s.k,
      |        CAST(round((s.sm/s.n) / (c.sm/c.n) * 1000000) AS BIGINT)
      |          AS r_e6,
      |        s.n
      |      FROM sums s JOIN sums c ON c.event_type = s.event_type
      |                             AND c.k = 0
      |      WHERE s.k >= 2),
      |best AS (SELECT event_type, CAST(max(r_e6) AS BIGINT) AS best_r
      |         FROM r GROUP BY 1),
      |pick AS (SELECT r.event_type, CAST(min(r.k) AS BIGINT) AS best_lag,
      |           CAST(max(best_r) AS BIGINT) AS r_e6,
      |           CAST(max(r.n) AS BIGINT) AS n_obs
      |         FROM r JOIN best ON best.event_type = r.event_type
      |                         AND r.r_e6 = best.best_r
      |         GROUP BY 1)
      |SELECT event_type, n_obs, best_lag, r_e6,
      |  CAST(round(1.96 / sqrt(CAST(n_obs AS DOUBLE)) * 1000000)
      |    AS BIGINT) AS thr_e6,
      |  CASE WHEN r_e6 > CAST(round(1.96 / sqrt(CAST(n_obs AS DOUBLE))
      |      * 1000000) AS BIGINT)
      |    THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
      |  END AS significant
      |FROM pick""".stripMargin

  /** q316 — the composed §3.1 analyze slice
    * ([[graft.forecast.AnalyzeSlice.analyzeSlice]]): the reference's
    * flagship dataflow as one batch operator — target = daily order
    * revenue per priority, covariate = daily FILLED-order ('F'
    * status) count per priority, so the two day grids genuinely
    * diverge at sf scale: target-only days exercise the covariate's
    * h-step-ahead prediction (the C6 future-grid walk), cov-only
    * days fold state without emitting, shared days splice observed
    * over predicted (J1/J2), and the target's Holt–Winters state
    * emits per target day (the forecast the streaming twin maintains
    * live). The oracle replays the SAME union-grid recursion with a
    * recursive CTE carrying both seasonal lists and the h-gap. */
  private def q316(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    graft.forecast.AnalyzeSlice.analyzeSlice(
      o.groupBy(col("o_orderpriority"),
                dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(count(lit(1)).as("c")),
      "o_orderpriority", "o_orderdate", "y", "c")
  }

  private val q316Sql = {
    // the recursion's shared sub-expressions, interpolated at every
    // use site (mirrors AnalyzeSlice's fold fragments; α=0.2 β=0.1
    // γ=0.3, m=7, truncating // division like Spark's div)
    val sOldT = "r.svT[CAST(r.tT % 7 AS INT) + 1]"
    val lpT = s"(2 * (s.yt - $sOldT) + 8 * (r.lT + r.bT)) // 10"
    val bpT = s"(1 * (($lpT) - r.lT) + 9 * r.bT) // 10"
    val spT = s"(3 * (s.yt - ($lpT)) + 7 * $sOldT) // 10"
    val sOldC = "r.svC[CAST(r.tC % 7 AS INT) + 1]"
    val lpC = s"(2 * (s.yv - $sOldC) + 8 * (r.lC + r.bC)) // 10"
    val bpC = s"(1 * (($lpC) - r.lC) + 9 * r.bC) // 10"
    val spC = s"(3 * (s.yv - ($lpC)) + 7 * $sOldC) // 10"
    val cpred = "CASE WHEN r.tC > 0 THEN r.lC + (r.hg + 1) * r.bC" +
      " + r.svC[CAST((r.tC + r.hg) % 7 AS INT) + 1] ELSE NULL END"
    s"""WITH RECURSIVE tgt AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS yt
      |  FROM orders GROUP BY 1, 2),
      |cov AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS yv
      |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1, 2),
      |u AS (SELECT coalesce(t.k, c.k) AS k, coalesce(t.d, c.d) AS d,
      |             t.yt, c.yv
      |      FROM tgt t FULL OUTER JOIN cov c ON t.k = c.k AND t.d = c.d),
      |s AS (SELECT k, d, yt, yv,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM u),
      |r AS (
      |  SELECT k, rn, d, yt, yv,
      |    CASE WHEN yt IS NULL THEN 0 ELSE 1 END AS tT,
      |    coalesce(yt, 0) AS lT, CAST(0 AS BIGINT) AS bT,
      |    [0,0,0,0,0,0,0]::BIGINT[] AS svT,
      |    CASE WHEN yv IS NULL THEN 0 ELSE 1 END AS tC,
      |    coalesce(yv, 0) AS lC, CAST(0 AS BIGINT) AS bC,
      |    [0,0,0,0,0,0,0]::BIGINT[] AS svC,
      |    CASE WHEN yv IS NULL THEN 1 ELSE 0 END AS hg,
      |    yv AS cobs, CAST(NULL AS BIGINT) AS cpred, yv AS csp,
      |    yt AS l, CASE WHEN yt IS NULL THEN NULL ELSE 0 END AS b,
      |    CASE WHEN yt IS NULL THEN NULL ELSE 0 END AS seas,
      |    yt AS pred
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.yt, s.yv,
      |    CASE WHEN s.yt IS NULL THEN r.tT ELSE r.tT + 1 END,
      |    CASE WHEN s.yt IS NULL THEN r.lT
      |         WHEN r.tT = 0 THEN s.yt ELSE $lpT END,
      |    CASE WHEN s.yt IS NULL OR r.tT = 0 THEN r.bT ELSE $bpT END,
      |    CASE WHEN s.yt IS NULL OR r.tT = 0 THEN r.svT
      |         ELSE list_transform(r.svT, (e, i) ->
      |           CASE WHEN i = CAST(r.tT % 7 AS INT) + 1
      |                THEN $spT ELSE e END) END,
      |    CASE WHEN s.yv IS NULL THEN r.tC ELSE r.tC + 1 END,
      |    CASE WHEN s.yv IS NULL THEN r.lC
      |         WHEN r.tC = 0 THEN s.yv ELSE $lpC END,
      |    CASE WHEN s.yv IS NULL OR r.tC = 0 THEN r.bC ELSE $bpC END,
      |    CASE WHEN s.yv IS NULL OR r.tC = 0 THEN r.svC
      |         ELSE list_transform(r.svC, (e, i) ->
      |           CASE WHEN i = CAST(r.tC % 7 AS INT) + 1
      |                THEN $spC ELSE e END) END,
      |    CASE WHEN s.yv IS NULL THEN r.hg + 1 ELSE 0 END,
      |    s.yv,
      |    $cpred,
      |    coalesce(s.yv, $cpred),
      |    CASE WHEN s.yt IS NULL THEN NULL
      |         WHEN r.tT = 0 THEN s.yt ELSE $lpT END,
      |    CASE WHEN s.yt IS NULL THEN NULL
      |         WHEN r.tT = 0 THEN 0 ELSE $bpT END,
      |    CASE WHEN s.yt IS NULL THEN NULL
      |         WHEN r.tT = 0 THEN 0 ELSE $spT END,
      |    CASE WHEN s.yt IS NULL THEN NULL
      |         WHEN r.tT = 0 THEN s.yt
      |         ELSE r.lT + r.bT + $sOldT END
      |  FROM r JOIN s ON s.k = r.k AND s.rn = r.rn + 1)
      |SELECT k AS o_orderpriority, d AS o_orderdate, yt AS y_c,
      |  CAST(cobs AS BIGINT) AS cov_obs_c,
      |  CAST(cpred AS BIGINT) AS cov_pred_c,
      |  CAST(csp AS BIGINT) AS cov_c,
      |  CAST(l AS BIGINT) AS level_c, CAST(b AS BIGINT) AS trend_c,
      |  CAST(seas AS BIGINT) AS seas_c, CAST(pred AS BIGINT) AS pred_c
      |FROM r WHERE yt IS NOT NULL""".stripMargin
  }

  /** q297 — Mann–Kendall trend test ([[graft.ts.TrendTest
    * .mannKendall]]): is daily order revenue per priority trending at
    * all, assuming nothing about linearity or error shape — S from
    * all time-ordered pairs, the tie-corrected Var(S)·18 exact, z
    * with continuity correction on the e6 grid. */
  private def q297(s: SparkSession, dir: String): DataFrame =
    graft.ts.TrendTest.mannKendall(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q297Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |pr AS (SELECT a.k,
      |         CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
      |              ELSE 0 END AS sg
      |       FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d),
      |ss AS (SELECT k, CAST(sum(sg) AS BIGINT) AS s_stat FROM pr GROUP BY 1),
      |nn AS (SELECT k, CAST(count(*) AS BIGINT) AS n_obs
      |       FROM daily GROUP BY 1),
      |ti AS (SELECT k, CAST(sum(t*(t-1)*(2*t+5)) AS BIGINT) AS tie18
      |       FROM (SELECT k, y, count(*) AS t FROM daily GROUP BY 1, 2)
      |       GROUP BY 1),
      |vv AS (SELECT nn.k, n_obs, s_stat,
      |         n_obs*(n_obs-1)*(2*n_obs+5) - tie18 AS var18
      |       FROM nn JOIN ss ON ss.k = nn.k JOIN ti ON ti.k = nn.k)
      |SELECT k AS o_orderpriority, n_obs, s_stat,
      |  CAST(var18 AS BIGINT) AS var18,
      |  CAST(CASE WHEN var18 <= 0 THEN NULL
      |    ELSE round((s_stat - CASE WHEN s_stat > 0 THEN 1
      |                              WHEN s_stat < 0 THEN -1 ELSE 0 END)
      |      / sqrt(CAST(var18 AS DOUBLE) / 18.0) * 1000000.0) END
      |    AS BIGINT) AS z_e6
      |FROM vv""".stripMargin

  /** q298 — Theil–Sen slope ([[graft.ts.TrendTest.theilSen]]): the
    * robust trend estimate behind q297's test — lower median of the
    * e6-truncated pairwise slopes, ranked via the grouped grid prefix
    * (no per-key sort in one task). */
  private def q298(s: SparkSession, dir: String): DataFrame =
    graft.ts.TrendTest.theilSen(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q298Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |sl AS (SELECT a.k,
      |         CAST((CAST(b.y - a.y AS HUGEINT) * 1000000)
      |              // date_diff('day', a.d, b.d) AS BIGINT) AS slope_e6
      |       FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d),
      |grid AS (SELECT k, slope_e6, count(*) AS c FROM sl GROUP BY 1, 2),
      |cum AS (SELECT k, slope_e6,
      |          sum(c) OVER (PARTITION BY k ORDER BY slope_e6) AS cum_c
      |        FROM grid),
      |mm AS (SELECT k, CAST(sum(c) AS BIGINT) AS n_pairs
      |       FROM grid GROUP BY 1)
      |SELECT cum.k AS o_orderpriority, mm.n_pairs,
      |       CAST(min(slope_e6) AS BIGINT) AS slope_e6
      |FROM cum JOIN mm ON mm.k = cum.k
      |WHERE cum_c >= (n_pairs + 1) // 2
      |GROUP BY cum.k, mm.n_pairs""".stripMargin

  /** q268 — Croston intermittent-demand forecast
    * ([[graft.ts.Intermittent.croston]], α = 0.2) of daily shipped
    * quantity for a sparse part slice (partkey ≡ 1 mod 131 — each
    * part ships a handful of days across the corpus years, the
    * regime where plain SES decays to zero between demands). The
    * oracle replays the two-state EWMA over demand events with a
    * recursive CTE; gaps come from a keyed lag in both engines. */
  private def q268(s: SparkSession, dir: String): DataFrame =
    graft.ts.Intermittent.croston(
      t(s, dir, "lineitem")
        .filter(col("l_partkey") % 131 === 1)
        .groupBy(col("l_partkey"),
                 dayBucket(col("l_shipdate")).as("l_shipdate"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("y")),
      "l_partkey", "l_shipdate", "y")

  private val q268Sql =
    """WITH RECURSIVE ev0 AS (
      |  SELECT l_partkey AS k,
      |         CAST(date_trunc('day', l_shipdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem WHERE l_partkey % 131 = 1
      |  GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn,
      |        CAST(coalesce(d - lag(d) OVER (PARTITION BY k ORDER BY d),
      |                      1) AS BIGINT) AS g
      |      FROM ev0 WHERE y > 0),
      |cr AS (
      |  SELECT k, rn, d, y, g, y AS z, g AS p,
      |         (y * 1000000) // g AS rate
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y, s.g,
      |    (2 * s.y + 8 * cr.z) // 10,
      |    (2 * s.g + 8 * cr.p) // 10,
      |    (((2 * s.y + 8 * cr.z) // 10) * 1000000)
      |      // ((2 * s.g + 8 * cr.p) // 10)
      |  FROM cr JOIN s ON s.k = cr.k AND s.rn = cr.rn + 1)
      |SELECT k AS l_partkey, d AS l_shipdate, y AS y_q, g AS gap_d,
      |  CAST(z AS BIGINT) AS size_s, CAST(p AS BIGINT) AS interval_s,
      |  CAST(rate AS BIGINT) AS rate_e6
      |FROM cr""".stripMargin

  /** q269 — seasonal-naive forecast scorecard
    * ([[graft.ts.ForecastEval.seasonalNaiveScorecard]], m = 7,
    * holdout from 1997-01-01): MASE + sMAPE of the lag-7 baseline on
    * daily order revenue per priority — the floor any forecast model
    * must beat, staged in exact truncating longs so the oracle
    * replays it. */
  private def q269(s: SparkSession, dir: String): DataFrame =
    graft.ts.ForecastEval.seasonalNaiveScorecard(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y", m = 7, cutoff = "1997-01-01")

  private val q269Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |lagged AS (
      |  SELECT k, d, y,
      |         lag(y, 7) OVER (PARTITION BY k ORDER BY d) AS f
      |  FROM daily),
      |ae AS (SELECT k, d, y, f, abs(y - f) AS ae
      |       FROM lagged WHERE f IS NOT NULL),
      |train AS (SELECT k, CAST(sum(ae) AS BIGINT) AS s_t,
      |                 CAST(count(*) AS BIGINT) AS n_train
      |          FROM ae WHERE d < DATE '1997-01-01' GROUP BY k),
      |hold AS (SELECT k, CAST(sum(ae) AS BIGINT) AS s_h,
      |                CAST(count(*) AS BIGINT) AS n_hold,
      |                CAST(sum(CASE WHEN abs(y) + abs(f) = 0 THEN 0
      |                  ELSE (2000000 * ae) // (abs(y) + abs(f)) END)
      |                  AS BIGINT) AS sm_sum
      |         FROM ae WHERE d >= DATE '1997-01-01' GROUP BY k)
      |SELECT train.k AS o_orderpriority, n_train, n_hold,
      |  CAST(s_h // n_hold AS BIGINT) AS mae_hold_c,
      |  CAST(CASE WHEN s_t = 0 THEN NULL
      |    ELSE ((s_h * 1000000) // n_hold) * n_train // s_t END
      |    AS BIGINT) AS mase_e6,
      |  CAST(sm_sum // n_hold AS BIGINT) AS smape_e6
      |FROM train JOIN hold ON train.k = hold.k""".stripMargin

  /** q270 — per-series feature vector
    * ([[graft.ts.SeriesFeatures.extract]]): moments, extremes, lag-1
    * autocorrelation, OLS slope, and mean-crossing count of daily
    * order revenue per priority, in WHOLE currency units (Σy² must
    * fit int64 at sf0.1 — the q258 convention). */
  private def q270(s: SparkSession, dir: String): DataFrame =
    graft.ts.SeriesFeatures.extract(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(round(col("o_totalprice")).cast("long")).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q270Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |r0 AS (SELECT k, d, y,
      |         CAST(row_number() OVER w AS BIGINT) AS t,
      |         lead(y, 1) OVER w AS yn
      |       FROM daily WINDOW w AS (PARTITION BY k ORDER BY d)),
      |aggd AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
      |           CAST(sum(y) AS BIGINT) AS s,
      |           CAST(sum(y*y) AS BIGINT) AS q,
      |           min(y) AS min_v, max(y) AS max_v,
      |           CAST(sum(y*yn) AS BIGINT) AS p,
      |           CAST(sum(CASE WHEN yn IS NOT NULL THEN y END) AS BIGINT)
      |             AS sh,
      |           CAST(sum(yn) AS BIGINT) AS st,
      |           CAST(sum(t) AS BIGINT) AS tt,
      |           CAST(sum(t*t) AS BIGINT) AS t2,
      |           CAST(sum(t*y) AS BIGINT) AS ty
      |         FROM r0 GROUP BY k),
      |cr AS (SELECT k, CAST(count(*) AS BIGINT) AS crossings FROM (
      |         SELECT r0.k, r0.d,
      |           CAST(r0.y * a.n > a.s AS INT) AS abv,
      |           lag(CAST(r0.y * a.n > a.s AS INT)) OVER
      |             (PARTITION BY r0.k ORDER BY r0.d) AS prv
      |         FROM r0 JOIN aggd a ON r0.k = a.k) x
      |       WHERE prv IS NOT NULL AND prv <> abv GROUP BY k)
      |SELECT aggd.k AS o_orderpriority, n, min_v, max_v,
      |  round(CAST(s AS DOUBLE) / n, 6) AS mean_v,
      |  round(sqrt((q - CAST(s AS DOUBLE) * s / n) / n), 6) AS std_v,
      |  CASE WHEN CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / n <= 0.0
      |    THEN NULL
      |    ELSE round((p - (CAST(s AS DOUBLE) / n) * (sh + st)
      |                + (n - 1) * (CAST(s AS DOUBLE) / n)
      |                  * (CAST(s AS DOUBLE) / n))
      |               / (q - CAST(s AS DOUBLE) * s / n), 6) END AS acf1,
      |  CASE WHEN n <= 1 THEN NULL
      |    ELSE round((CAST(n AS DOUBLE) * ty - CAST(tt AS DOUBLE) * s)
      |               / (CAST(n AS DOUBLE) * t2
      |                  - CAST(tt AS DOUBLE) * tt), 6) END AS slope,
      |  CAST(coalesce(crossings, 0) AS BIGINT) AS crossings
      |FROM aggd LEFT JOIN cr ON aggd.k = cr.k""".stripMargin

  /** q278 — two-feature OLS via Gram aggregation
    * ([[graft.stats.Ridge.ridge2]], λ = 0): extended price regressed
    * on quantity and discount points over all lineitems. One
    * corpus aggregate reduces to nine exact long sums; Cramer's rule
    * solves the 3×3 system in a formula string SHARED verbatim by
    * engine and oracle, so the IEEE shape is identical by
    * construction. */
  private def q278(s: SparkSession, dir: String): DataFrame =
    graft.stats.Ridge.ridge2(
      t(s, dir, "lineitem").select(
        round(col("l_extendedprice")).cast("long").as("y"),
        round(col("l_quantity")).cast("long").as("x1"),
        round(col("l_discount") * 100).cast("long").as("x2")),
      "y", "x1", "x2")

  private val q278Sql = {
    val f = graft.stats.Ridge.detFormulas(0L)
    s"""WITH r AS (SELECT
      |    CAST(round(l_extendedprice) AS BIGINT) AS y,
      |    CAST(round(l_quantity) AS BIGINT) AS x1,
      |    CAST(round(l_discount * 100) AS BIGINT) AS x2
      |  FROM lineitem),
      |g AS (SELECT
      |${graft.stats.Ridge.gramSql}
      |FROM r)
      |SELECT n,
      |  CASE WHEN abs(${f("det")}) < 1e-9 THEN NULL
      |    ELSE round(${f("det0")} / ${f("det")}, 6) END AS b0,
      |  CASE WHEN abs(${f("det")}) < 1e-9 THEN NULL
      |    ELSE round(${f("det1")} / ${f("det")}, 6) END AS b1,
      |  CASE WHEN abs(${f("det")}) < 1e-9 THEN NULL
      |    ELSE round(${f("det2")} / ${f("det")}, 6) END AS b2
      |FROM g""".stripMargin
  }

  /** q279 — pairwise DTW distance ([[graft.ts.Dtw.dtwPairs]]):
    * dynamic-time-warping between every pair of priorities' MONTHLY
    * revenue series (whole currency, L1 local cost) — the
    * shift-tolerant series similarity. Exact integer min-plus DP: the
    * engine folds row-by-row inside one codegen'd expression; the
    * oracle replays ANTI-DIAGONALLY with a recursive CTE (order-free
    * algebra, identical longs). */
  private def q279(s: SparkSession, dir: String): DataFrame =
    graft.ts.Dtw.dtwPairs(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
        .agg(sum(round(col("o_totalprice")).cast("long")).as("y")),
      "o_orderpriority", "mo", "y")

  private val q279Sql =
    """WITH RECURSIVE monthly AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
      |         CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |ser AS (SELECT k, list(y ORDER BY mo) AS v,
      |          CAST(count(*) AS BIGINT) AS n
      |        FROM monthly GROUP BY k),
      |pairs AS (SELECT a.k AS ka, b.k AS kb, a.v AS va, b.v AS vb,
      |            a.n AS n, b.n AS m
      |          FROM ser a JOIN ser b ON a.k < b.k),
      |rec AS (
      |  SELECT ka, kb, va, vb, n, m, CAST(0 AS BIGINT) AS dg,
      |    list_transform(generate_series(0, CAST(n AS INT)),
      |      i -> CASE WHEN i = 0 THEN CAST(0 AS BIGINT)
      |           ELSE CAST(4000000000000000 AS BIGINT) END) AS cur,
      |    list_transform(generate_series(0, CAST(n AS INT)),
      |      i -> CAST(4000000000000000 AS BIGINT)) AS prv
      |  FROM pairs
      |  UNION ALL
      |  SELECT ka, kb, va, vb, n, m, dg + 1,
      |    list_transform(generate_series(0, CAST(n AS INT)), i ->
      |      CASE WHEN i = 0 THEN CAST(4000000000000000 AS BIGINT)
      |           WHEN (dg + 1) - i < 1 OR (dg + 1) - i > m OR i > n
      |             THEN CAST(4000000000000000 AS BIGINT)
      |           ELSE abs(va[CAST(i AS INT)]
      |                    - vb[CAST((dg + 1) - i AS INT)]) +
      |                least(cur[CAST(i AS INT)], cur[CAST(i + 1 AS INT)],
      |                      prv[CAST(i AS INT)])
      |      END) AS cur,
      |    cur AS prv
      |  FROM rec WHERE dg < n + m)
      |SELECT ka AS key_a, kb AS key_b, n AS n_a, m AS n_b,
      |  cur[CAST(n + 1 AS INT)] AS dtw
      |FROM rec WHERE dg = n + m""".stripMargin

  /** q284 — MoM/YoY growth ledger
    * ([[graft.ts.GrowthLedger.momYoy]]): monthly revenue per priority
    * with calendar-joined month-over-month and year-over-year shares
    * in exact micros; missing base periods are honest nulls. */
  private def q284(s: SparkSession, dir: String): DataFrame =
    graft.ts.GrowthLedger.momYoy(
      t(s, dir, "orders").select(col("o_orderpriority"),
        col("o_orderdate"), cents(col("o_totalprice")).as("v_c")),
      "o_orderpriority", "o_orderdate", "v_c")

  private val q284Sql =
    """WITH monthly AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
      |           AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1, 2)
      |SELECT m.k AS o_orderpriority, m.mo, m.rev_c,
      |  CAST(CASE WHEN pm.rev_c IS NULL OR pm.rev_c = 0 THEN NULL
      |    ELSE ((m.rev_c - pm.rev_c) * 1000000) // abs(pm.rev_c) END
      |    AS BIGINT) AS mom_e6,
      |  CAST(CASE WHEN py.rev_c IS NULL OR py.rev_c = 0 THEN NULL
      |    ELSE ((m.rev_c - py.rev_c) * 1000000) // abs(py.rev_c) END
      |    AS BIGINT) AS yoy_e6
      |FROM monthly m
      |LEFT JOIN monthly pm ON pm.k = m.k
      |  AND (pm.mo + INTERVAL 1 MONTH) = m.mo
      |LEFT JOIN monthly py ON py.k = m.k
      |  AND (py.mo + INTERVAL 12 MONTH) = m.mo""".stripMargin

  /** q285 — new-vs-returning revenue split
    * ([[graft.ts.GrowthLedger.newVsReturning]]): each month's order
    * revenue split by whether the customer's first-ever order landed
    * that month — acquisition vs retention, exact-micro new share. */
  private def q285(s: SparkSession, dir: String): DataFrame =
    graft.ts.GrowthLedger.newVsReturning(
      t(s, dir, "orders").select(col("o_custkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("v_c")),
      "o_custkey", "o_orderdate", "v_c")

  private val q285Sql =
    """WITH rows0 AS (
      |  SELECT o_custkey AS c,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
      |         CAST(round(o_totalprice*100) AS BIGINT) AS v
      |  FROM orders),
      |f AS (SELECT c, min(mo) AS mo0 FROM rows0 GROUP BY 1),
      |j AS (SELECT rows0.c, mo, v,
      |        CASE WHEN mo = mo0 THEN 1 ELSE 0 END AS is_new
      |      FROM rows0 JOIN f ON rows0.c = f.c),
      |g AS (SELECT mo,
      |  CAST(sum(CASE WHEN is_new = 1 THEN v ELSE 0 END) AS BIGINT)
      |    AS new_rev_c,
      |  CAST(sum(CASE WHEN is_new = 0 THEN v ELSE 0 END) AS BIGINT)
      |    AS ret_rev_c,
      |  CAST(count(DISTINCT CASE WHEN is_new = 1 THEN c END) AS BIGINT)
      |    AS new_custs,
      |  CAST(count(DISTINCT CASE WHEN is_new = 0 THEN c END) AS BIGINT)
      |    AS ret_custs
      |FROM j GROUP BY 1)
      |SELECT mo, new_rev_c, ret_rev_c, new_custs, ret_custs,
      |  CAST(CASE WHEN new_rev_c + ret_rev_c = 0 THEN NULL
      |    ELSE (new_rev_c * 1000000) // (new_rev_c + ret_rev_c) END
      |    AS BIGINT) AS new_share_e6
      |FROM g""".stripMargin

  /** q288 — Holt–Winters 14-day forecast
    * ([[graft.ts.ExpSmooth.tripleExpForecast]]): the out-of-sample
    * projection from q267's final state — pred_h = l + h·b +
    * s[(t+h−1) mod 7] in exact longs; the oracle reruns the q267
    * recursion and projects from each series' LAST row. */
  private def q288(s: SparkSession, dir: String): DataFrame =
    graft.ts.ExpSmooth.tripleExpForecast(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y", horizon = 14)

  private val q288Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM daily),
      |hw AS (
      |  SELECT k, rn, d, y, y AS l, CAST(0 AS BIGINT) AS b,
      |         [0,0,0,0,0,0,0]::BIGINT[] AS sv
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y,
      |    (2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |     + 8 * (hw.l + hw.b)) // 10,
      |    (1 * (((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |            + 8 * (hw.l + hw.b)) // 10) - hw.l)
      |     + 9 * hw.b) // 10,
      |    list_transform(hw.sv, (e, i) -> CASE WHEN i = (hw.rn % 7) + 1
      |      THEN (3 * (s.y - ((2 * (s.y - hw.sv[(hw.rn % 7) + 1])
      |                         + 8 * (hw.l + hw.b)) // 10))
      |            + 7 * hw.sv[(hw.rn % 7) + 1]) // 10
      |      ELSE e END)
      |  FROM hw JOIN s ON s.k = hw.k AND s.rn = hw.rn + 1),
      |fin AS (SELECT * FROM (
      |    SELECT hw.*, row_number() OVER (PARTITION BY k
      |      ORDER BY rn DESC) AS rr FROM hw) x WHERE rr = 1)
      |SELECT k AS o_orderpriority,
      |  fin.d + CAST(h AS INT) AS o_orderdate,
      |  CAST(h AS BIGINT) AS h,
      |  CAST(l + h * b + sv[CAST((rn + h - 1) % 7 AS INT) + 1]
      |    AS BIGINT) AS pred_c
      |FROM fin, LATERAL (SELECT unnest(generate_series(1, 14)) AS h)""".stripMargin

  /** q294 — log-rank survival test
    * ([[graft.ts.Survival.logRank]]): do BUILDING-segment customers
    * reorder on a different clock? q261's time-to-second-order
    * durations split by segment, χ² = (Σ(O−E))²/ΣV with exact-integer
    * expectations and e6-rounded hypergeometric variances. */
  private def q294(s: SparkSession, dir: String): DataFrame = {
    val dd = t(s, dir, "orders")
      .select(col("o_custkey").as("cust"), col("o_orderdate").as("d"))
      .distinct()
    val firsts = dd.groupBy(col("cust")).agg(min(col("d")).as("d1"))
    val seconds = dd.join(firsts, Seq("cust"))
      .filter(col("d") > col("d1"))
      .groupBy(col("cust")).agg(min(col("d")).as("d2"))
    val maxd = dd.agg(max(col("d")).as("md"))
    val arms = t(s, dir, "customer")
      .select(col("c_custkey").as("cust"),
              (col("c_mktsegment") === "BUILDING").cast("long").as("arm"))
    val subjects = firsts.join(seconds, Seq("cust"), "left")
      .crossJoin(broadcast(maxd))
      .join(arms, Seq("cust"))
      .select(
        datediff(coalesce(col("d2"), col("md")), col("d1")).cast("long")
          .as("dur"),
        col("d2").isNotNull.cast("long").as("ev"), col("arm"))
    graft.ts.Survival.logRank(subjects, "dur", "ev", "arm")
  }

  private val q294Sql =
    """WITH dd AS (SELECT DISTINCT o_custkey AS cust,
      |              o_orderdate AS d FROM orders),
      |f AS (SELECT cust, min(d) AS d1 FROM dd GROUP BY 1),
      |s2 AS (SELECT dd.cust, min(dd.d) AS d2
      |       FROM dd JOIN f ON f.cust = dd.cust AND dd.d > f.d1
      |       GROUP BY 1),
      |mx AS (SELECT max(d) AS md FROM dd),
      |subj AS (SELECT CAST(date_diff('day', d1, COALESCE(d2, md))
      |                  AS BIGINT) AS t,
      |                CASE WHEN d2 IS NULL THEN 0 ELSE 1 END AS ev,
      |                CASE WHEN c.c_mktsegment = 'BUILDING'
      |                  THEN 1 ELSE 0 END AS arm
      |         FROM f LEFT JOIN s2 USING (cust) CROSS JOIN mx
      |         JOIN customer c ON c.c_custkey = f.cust),
      |grid AS (SELECT t,
      |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS na1,
      |    CAST(sum(CASE WHEN arm <> 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS na0,
      |    CAST(sum(CASE WHEN arm = 1 THEN ev ELSE 0 END) AS BIGINT)
      |      AS d1,
      |    CAST(sum(CASE WHEN arm <> 1 THEN ev ELSE 0 END) AS BIGINT)
      |      AS d0
      |  FROM subj GROUP BY 1),
      |pre AS (SELECT t, d1, d0,
      |    CAST(sum(na1) OVER (ORDER BY t) - na1 AS BIGINT) AS cb1,
      |    CAST(sum(na0) OVER (ORDER BY t) - na0 AS BIGINT) AS cb0
      |  FROM grid),
      |tot AS (SELECT CAST(sum(na1) AS BIGINT) AS nt1,
      |               CAST(sum(na0) AS BIGINT) AS nt0 FROM grid),
      |steps AS (SELECT d1, d0, nt1, nt0,
      |    nt1 - cb1 AS n1, nt0 - cb0 AS n0,
      |    nt1 - cb1 + nt0 - cb0 AS n, d1 + d0 AS d
      |  FROM pre CROSS JOIN tot),
      |terms AS (SELECT nt1, nt0, d1, d0,
      |    d1 * 1000000 - CAST((CAST(d AS HUGEINT) * n1 * 1000000) // n
      |      AS BIGINT) AS oe_e6,
      |    CAST(round(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / n)
      |      * (CAST(n0 AS DOUBLE) / n) * (n - d) / (n - 1)
      |      * 1000000.0) AS BIGINT) AS v_e6
      |  FROM steps WHERE d > 0 AND n > 1),
      |agg AS (SELECT CAST(max(nt1) AS BIGINT) AS n_1,
      |          CAST(max(nt0) AS BIGINT) AS n_2,
      |          CAST(sum(d1) AS BIGINT) AS events_1,
      |          CAST(sum(d0) AS BIGINT) AS events_2,
      |          CAST(sum(oe_e6) AS BIGINT) AS sum_oe_e6,
      |          CAST(sum(v_e6) AS BIGINT) AS sum_v_e6
      |        FROM terms)
      |SELECT n_1, n_2, events_1, events_2, sum_oe_e6, sum_v_e6,
      |  CAST(CASE WHEN sum_v_e6 <= 0 THEN NULL
      |    ELSE round((CAST(sum_oe_e6 AS DOUBLE) / 1000000.0)
      |      * (CAST(sum_oe_e6 AS DOUBLE) / 1000000.0)
      |      / (CAST(sum_v_e6 AS DOUBLE) / 1000000.0) * 1000000.0) END
      |    AS BIGINT) AS chi2_e6
      |FROM agg""".stripMargin

  /** q293 — STL strength indices
    * ([[graft.ts.Decompose.strengths]]): trend and seasonality
    * strength of q263's decomposition — the forecastability
    * diagnostics F_T/F_S in [0, 1], DECIMAL(38) moment sums and one
    * rounded variance ratio each. */
  private def q293(s: SparkSession, dir: String): DataFrame =
    graft.ts.Decompose.strengths(
      graft.ts.Decompose.stlWeekly(dailyCents(s, dir),
        "event_type", "ds", "y"),
      "event_type")

  private val q293Sql =
    s"""WITH stl AS ($q263Sql),
      |rows0 AS (SELECT event_type AS k, trend_e6 AS t, seasonal_e6 AS s,
      |            resid_e6 AS r, trend_e6 + resid_e6 AS tr,
      |            seasonal_e6 + resid_e6 AS sr
      |          FROM stl
      |          WHERE trend_e6 IS NOT NULL AND seasonal_e6 IS NOT NULL
      |            AND resid_e6 IS NOT NULL),
      |a AS (SELECT k, CAST(count(*) AS BIGINT) AS n,
      |        sum(CAST(r AS HUGEINT)) AS r1,
      |        sum(CAST(r AS HUGEINT) * r) AS r2,
      |        sum(CAST(tr AS HUGEINT)) AS t1,
      |        sum(CAST(tr AS HUGEINT) * tr) AS t2,
      |        sum(CAST(sr AS HUGEINT)) AS s1,
      |        sum(CAST(sr AS HUGEINT) * sr) AS s2
      |      FROM rows0 GROUP BY 1)
      |SELECT k AS event_type, n,
      |  CASE WHEN (CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE)
      |        * CAST(t1 AS DOUBLE) / n) / n <= 0.0 THEN NULL
      |    ELSE round(greatest(0.0, 1.0 -
      |      ((CAST(r2 AS DOUBLE) - CAST(r1 AS DOUBLE)
      |        * CAST(r1 AS DOUBLE) / n) / n) /
      |      ((CAST(t2 AS DOUBLE) - CAST(t1 AS DOUBLE)
      |        * CAST(t1 AS DOUBLE) / n) / n)), 6) END AS trend_strength,
      |  CASE WHEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
      |        * CAST(s1 AS DOUBLE) / n) / n <= 0.0 THEN NULL
      |    ELSE round(greatest(0.0, 1.0 -
      |      ((CAST(r2 AS DOUBLE) - CAST(r1 AS DOUBLE)
      |        * CAST(r1 AS DOUBLE) / n) / n) /
      |      ((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
      |        * CAST(s1 AS DOUBLE) / n) / n)), 6) END AS seasonal_strength
      |FROM a""".stripMargin

  /** q291 — pairwise Wasserstein-1 drift
    * ([[graft.stats.Wasserstein.emd1dPairs]], 100-unit buckets):
    * earth-mover distance between priorities' order-value
    * distributions — unlike KS it weighs how FAR mass moved. Exact
    * cross-multiplied integer cell terms summed in DECIMAL(38), one
    * final rounded division. */
  private def q291(s: SparkSession, dir: String): DataFrame =
    graft.stats.Wasserstein.emd1dPairs(
      t(s, dir, "orders").select(col("o_orderpriority"),
        round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v", bucketWidth = 100L)

  private val q291Sql =
    """WITH r AS (SELECT o_orderpriority AS g,
      |    (CAST(round(o_totalprice) AS BIGINT) // 100) * 100 AS vb
      |  FROM orders),
      |grid AS (SELECT g, vb, CAST(count(*) AS BIGINT) AS c
      |         FROM r GROUP BY 1, 2),
      |tot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n
      |        FROM grid GROUP BY 1),
      |pairs AS (SELECT a.g AS ka, b.g AS kb
      |          FROM tot a, tot b WHERE a.g < b.g),
      |merged AS (SELECT ka, kb, vb, CAST(sum(ca) AS BIGINT) AS ca,
      |             CAST(sum(cb) AS BIGINT) AS cb FROM (
      |    SELECT p.ka, p.kb, grid.vb, grid.c AS ca,
      |           CAST(0 AS BIGINT) AS cb
      |    FROM pairs p JOIN grid ON grid.g = p.ka
      |    UNION ALL
      |    SELECT p.ka, p.kb, grid.vb, CAST(0 AS BIGINT), grid.c
      |    FROM pairs p JOIN grid ON grid.g = p.kb) x
      |  GROUP BY 1, 2, 3),
      |pre AS (SELECT ka, kb, vb,
      |    CAST(sum(ca) OVER w AS BIGINT) AS cum_ca,
      |    CAST(sum(cb) OVER w AS BIGINT) AS cum_cb
      |  FROM merged WINDOW w AS (PARTITION BY ka, kb ORDER BY vb
      |    ROWS UNBOUNDED PRECEDING)),
      |j AS (SELECT pre.ka, pre.kb, pre.vb, cum_ca, cum_cb,
      |        ta.n AS n_a, tb.n AS n_b,
      |        lead(pre.vb) OVER (PARTITION BY pre.ka, pre.kb
      |          ORDER BY pre.vb) - pre.vb AS dv
      |      FROM pre JOIN tot ta ON ta.g = pre.ka
      |                JOIN tot tb ON tb.g = pre.kb),
      |t2 AS (SELECT ka, kb, n_a, n_b,
      |         abs(cum_ca * n_b - cum_cb * n_a) * dv AS term
      |       FROM j WHERE dv IS NOT NULL)
      |SELECT ka AS key_a, kb AS key_b,
      |  CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
      |  CAST(count(*) + 1 AS BIGINT) AS n_cells,
      |  round(CAST(sum(term) AS DOUBLE) /
      |        (CAST(max(n_a) AS DOUBLE) * max(n_b)), 6) AS emd
      |FROM t2 GROUP BY 1, 2""".stripMargin

  /** q290 — Nelson–Aalen cumulative hazard
    * ([[graft.ts.Survival.nelsonAalen]]): q261's time-to-second-order
    * data through the ADDITIVE hazard estimator — per-step (d·1e6)
    * div n_risk increments, cumulated by a distributed prefix sum
    * (no recursion; the oracle is a plain running-sum window). */
  private def q290(s: SparkSession, dir: String): DataFrame = {
    val dd = t(s, dir, "orders")
      .select(col("o_custkey").as("cust"), col("o_orderdate").as("d"))
      .distinct()
    val firsts = dd.groupBy(col("cust")).agg(min(col("d")).as("d1"))
    val seconds = dd.join(firsts, Seq("cust"))
      .filter(col("d") > col("d1"))
      .groupBy(col("cust")).agg(min(col("d")).as("d2"))
    val maxd = dd.agg(max(col("d")).as("md"))
    val subjects = firsts.join(seconds, Seq("cust"), "left")
      .crossJoin(broadcast(maxd))
      .select(
        datediff(coalesce(col("d2"), col("md")), col("d1")).cast("long")
          .as("dur"),
        col("d2").isNotNull.cast("long").as("ev"))
    graft.ts.Survival.nelsonAalen(subjects, "dur", "ev")
  }

  private val q290Sql =
    """WITH dd AS (SELECT DISTINCT o_custkey AS cust,
      |              o_orderdate AS d FROM orders),
      |f AS (SELECT cust, min(d) AS d1 FROM dd GROUP BY 1),
      |s2 AS (SELECT dd.cust, min(dd.d) AS d2
      |       FROM dd JOIN f ON f.cust = dd.cust AND dd.d > f.d1
      |       GROUP BY 1),
      |mx AS (SELECT max(d) AS md FROM dd),
      |subj AS (SELECT CAST(date_diff('day', d1, COALESCE(d2, md))
      |                  AS BIGINT) AS t,
      |                CASE WHEN d2 IS NULL THEN 0 ELSE 1 END AS ev
      |         FROM f LEFT JOIN s2 USING (cust) CROSS JOIN mx),
      |grid AS (SELECT t, CAST(sum(ev) AS BIGINT) AS d_events,
      |                CAST(count(*) AS BIGINT) AS n_at
      |         FROM subj GROUP BY 1),
      |pref AS (SELECT t, d_events, n_at,
      |           CAST(sum(n_at) OVER (ORDER BY t) - n_at AS BIGINT)
      |             AS cumb
      |         FROM grid),
      |tot AS (SELECT CAST(sum(n_at) AS BIGINT) AS n FROM grid),
      |steps AS (SELECT t, d_events,
      |            CAST(n - cumb AS BIGINT) AS n_risk,
      |            CAST((d_events * 1000000) // (n - cumb) AS BIGINT)
      |              AS h_e6
      |          FROM pref CROSS JOIN tot)
      |SELECT t, n_risk, d_events, h_e6,
      |  CAST(sum(h_e6) OVER (ORDER BY t) AS BIGINT) AS cum_h_e6
      |FROM steps""".stripMargin

  /** q289 — event-rate spike detection
    * ([[graft.ts.RateSpike.rateSpikes]], 28-observation baseline,
    * z ≥ 4): per (event type, day) Poisson-approx z against the
    * trailing active-day mean — the "errors just jumped" monitor. */
  private def q289(s: SparkSession, dir: String): DataFrame =
    graft.ts.RateSpike.rateSpikes(
      t(s, dir, "events"), "event_type", "ts")

  private val q289Sql =
    """WITH daily AS (
      |  SELECT event_type AS s, CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(count(*) AS BIGINT) AS x
      |  FROM events GROUP BY 1, 2),
      |b AS (SELECT s, d, x,
      |        CAST(coalesce(sum(x) OVER w, 0) AS BIGINT) AS base_sum,
      |        CAST(count(x) OVER w AS BIGINT) AS base_n
      |      FROM daily WINDOW w AS (PARTITION BY s ORDER BY d
      |        ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING))
      |SELECT s AS event_type, d, x, base_sum, base_n,
      |  CAST(CASE WHEN base_n = 0 OR base_sum = 0 THEN NULL
      |    ELSE round((x - CAST(base_sum AS DOUBLE) / base_n)
      |         / sqrt(CAST(base_sum AS DOUBLE) / base_n) * 1000000.0)
      |    END AS BIGINT) AS z_e6,
      |  CAST(CASE WHEN base_n > 0 AND base_sum > 0
      |    AND round((x - CAST(base_sum AS DOUBLE) / base_n)
      |        / sqrt(CAST(base_sum AS DOUBLE) / base_n) * 1000000.0)
      |        >= 4000000 THEN 1 ELSE 0 END AS BIGINT) AS is_spike
      |FROM b""".stripMargin

  /** q301 — Yule–Walker AR(2) fit + one-step forecast
    * ([[graft.ts.ArModel.yuleWalkerAr2]]) of daily order revenue per
    * priority (whole currency — the q240 overflow discipline). The
    * oracle replays the n-scaled deviation sums exactly (HUGEINT
    * products) and the identical double tree for φ and the forecast. */
  private def q301(s: SparkSession, dir: String): DataFrame =
    graft.ts.ArModel.yuleWalkerAr2(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(round(col("o_totalprice")).cast("long")).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q301Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |st AS (SELECT k, d, y,
      |         CAST(row_number() OVER (PARTITION BY k ORDER BY d)
      |              AS BIGINT) AS idx,
      |         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
      |         CAST(sum(y) OVER (PARTITION BY k) AS BIGINT) AS total
      |       FROM daily),
      |zz AS (SELECT *, n*y - total AS z FROM st),
      |lg AS (SELECT *, lag(z, 1) OVER (PARTITION BY k ORDER BY d) AS z1,
      |               lag(z, 2) OVER (PARTITION BY k ORDER BY d) AS z2
      |       FROM zz),
      |ag AS (SELECT k, n, total,
      |         sum(CAST(z AS HUGEINT) * z) AS s0,
      |         sum(CAST(z AS HUGEINT) * z1) AS s1,
      |         sum(CAST(z AS HUGEINT) * z2) AS s2,
      |         max(CASE WHEN idx = n THEN y END) AS yn,
      |         max(CASE WHEN idx = n - 1 THEN y END) AS yn1
      |       FROM lg GROUP BY 1, 2, 3),
      |co AS (SELECT *,
      |         CAST(s1 AS DOUBLE) / CAST(s0 AS DOUBLE) AS r1,
      |         CAST(s2 AS DOUBLE) / CAST(s0 AS DOUBLE) AS r2,
      |         CAST(total AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |         (n >= 4 AND s0 > 0 AND abs(s1) <> s0) AS ok
      |       FROM ag),
      |ph AS (SELECT *,
      |         r1 * (1.0 - r2) / (1.0 - r1 * r1) AS phi1,
      |         (r2 - r1 * r1) / (1.0 - r1 * r1) AS phi2
      |       FROM co)
      |SELECT k AS o_orderpriority, n AS n_obs,
      |  CAST(CASE WHEN ok THEN round(phi1 * 1000000.0) END AS BIGINT)
      |    AS phi1_e6,
      |  CAST(CASE WHEN ok THEN round(phi2 * 1000000.0) END AS BIGINT)
      |    AS phi2_e6,
      |  CAST(CASE WHEN ok THEN round(mu + phi1 * (CAST(yn AS DOUBLE) - mu)
      |    + phi2 * (CAST(yn1 AS DOUBLE) - mu)) END AS BIGINT) AS pred_v
      |FROM ph""".stripMargin

  /** q302 — Dickey–Fuller unit-root t-statistic
    * ([[graft.ts.ArModel.dickeyFuller]]) of daily event revenue per
    * event type: is the series mean-reverting (t ≪ 0) or a random
    * walk (t ≈ 0)? The gate before pointing AR/trend machinery at a
    * series at all. */
  private def q302(s: SparkSession, dir: String): DataFrame =
    graft.ts.ArModel.dickeyFuller(
      t(s, dir, "events")
        .groupBy(col("event_type"), dayBucket(col("ts")).as("d"))
        .agg(sum(round(col("value")).cast("long")).as("y")),
      "event_type", "d", "y")

  private val q302Sql =
    """WITH daily AS (
      |  SELECT event_type AS k,
      |         CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |lg AS (SELECT k, y,
      |         lag(y, 1) OVER (PARTITION BY k ORDER BY d) AS x
      |       FROM daily),
      |p AS (SELECT k, x, y - x AS dy FROM lg WHERE x IS NOT NULL),
      |ag AS (SELECT k, CAST(count(*) AS BIGINT) AS m,
      |         CAST(sum(x) AS BIGINT) AS sx,
      |         CAST(sum(dy) AS BIGINT) AS sy,
      |         sum(CAST(x AS HUGEINT) * x) AS sxx,
      |         sum(CAST(x AS HUGEINT) * dy) AS sxy,
      |         sum(CAST(dy AS HUGEINT) * dy) AS syy
      |       FROM p GROUP BY 1),
      |ce AS (SELECT *,
      |         CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
      |             / CAST(m AS DOUBLE) AS sxxc,
      |         CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
      |             / CAST(m AS DOUBLE) AS sxyc,
      |         CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
      |             / CAST(m AS DOUBLE) AS syyc,
      |         (m >= 3 AND CAST(m AS HUGEINT) * sxx
      |            <> CAST(sx AS HUGEINT) * sx) AS ok
      |       FROM ag),
      |be AS (SELECT *, sxyc / sxxc AS beta FROM ce)
      |SELECT k AS event_type, m AS n_pairs,
      |  CAST(CASE WHEN ok THEN round(beta * 1000000.0) END AS BIGINT)
      |    AS beta_e6,
      |  CAST(CASE WHEN ok AND (syyc - beta * sxyc) > 0.0
      |    THEN round(beta / sqrt((syyc - beta * sxyc)
      |    / (CAST(m AS DOUBLE) - 2.0) / sxxc) * 1000000.0) END AS BIGINT)
      |    AS t_e6
      |FROM be""".stripMargin

  /** q304 — fixed-period periodogram ([[graft.ts.Periodogram
    * .periodogram]]) of daily event revenue per event type at
    * candidate cycles 7/30/91 days: which seasonality actually
    * exists before any seasonal model assumes one. The oracle embeds
    * the identical e6 trig literals and replays the exact z-sums. */
  private def q304(s: SparkSession, dir: String): DataFrame =
    graft.ts.Periodogram.periodogram(
      t(s, dir, "events")
        .groupBy(col("event_type"), dayBucket(col("ts")).as("d"))
        .agg(sum(round(col("value")).cast("long")).as("y")),
      "event_type", "d", "y", Seq(7, 30, 91))

  private val q304Sql =
    s"""WITH daily AS (
      |  SELECT event_type AS k,
      |         CAST(date_trunc('day', ts) AS DATE) AS d,
      |         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |st AS (SELECT k, d, y,
      |         CAST(d - DATE '1970-01-01' AS BIGINT) AS tt,
      |         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n,
      |         CAST(sum(y) OVER (PARTITION BY k) AS BIGINT) AS total
      |       FROM daily),
      |zz AS (SELECT k, n, tt, n*y - total AS z FROM st),
      |tb(period, phase, cos_e6, sin_e6) AS (VALUES
      |  ${graft.ts.Periodogram.phaseTableSql(Seq(7, 30, 91))}),
      |ag AS (SELECT k, period, n,
      |         sum(CAST(z AS HUGEINT) * cos_e6) AS az,
      |         sum(CAST(z AS HUGEINT) * sin_e6) AS bz
      |       FROM zz JOIN tb ON tb.phase = zz.tt % tb.period
      |       GROUP BY 1, 2, 3),
      |am AS (SELECT k, period, n,
      |         CAST(round(sqrt(CAST(az AS DOUBLE) * CAST(az AS DOUBLE)
      |             + CAST(bz AS DOUBLE) * CAST(bz AS DOUBLE))
      |           / CAST(n AS DOUBLE) / CAST(n AS DOUBLE)
      |           / 1000000.0 * 2.0) AS BIGINT) AS amp_v
      |       FROM ag)
      |SELECT k AS event_type, CAST(period AS BIGINT) AS period,
      |  n AS n_obs, amp_v,
      |  CAST(CASE WHEN amp_v = max(amp_v) OVER (PARTITION BY k)
      |       THEN 1 ELSE 0 END AS BIGINT) AS dominant
      |FROM am""".stripMargin

  /** q305 — Welch's unequal-variance t-test
    * ([[graft.stats.Hypothesis.welchT]]) of per-event value (cents)
    * between the user-parity arms, per event type — the MEANS member
    * of the two-sample family next to q214 (proportions), q225 (KS)
    * and q226 (ranks). Exact integer/decimal moments; t and the
    * Welch–Satterthwaite df replayed as identical double trees. */
  private def q305(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.welchT(
      t(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"),
                cents(col("value")).as("v")),
      "event_type", "arm", "v")

  private val q305Sql =
    """WITH o AS (
      |  SELECT event_type AS k, user_id % 2 AS arm,
      |         CAST(round(value*100) AS BIGINT) AS v
      |  FROM events),
      |ag AS (SELECT k,
      |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_a,
      |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS n_b,
      |         CAST(sum(CASE WHEN arm = 0 THEN v ELSE 0 END) AS BIGINT)
      |           AS s_a,
      |         CAST(sum(CASE WHEN arm = 1 THEN v ELSE 0 END) AS BIGINT)
      |           AS s_b,
      |         sum(CASE WHEN arm = 0 THEN CAST(v AS HUGEINT) * v END)
      |           AS q_a,
      |         sum(CASE WHEN arm = 1 THEN CAST(v AS HUGEINT) * v END)
      |           AS q_b
      |       FROM o GROUP BY 1),
      |va AS (SELECT *,
      |         (CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE)
      |            * CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      |           / (CAST(n_a AS DOUBLE) - 1.0) AS v_a,
      |         (CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE)
      |            * CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |           / (CAST(n_b AS DOUBLE) - 1.0) AS v_b
      |       FROM ag),
      |se AS (SELECT *, v_a / CAST(n_a AS DOUBLE) AS se_a,
      |               v_b / CAST(n_b AS DOUBLE) AS se_b
      |       FROM va),
      |fin AS (SELECT *, se_a + se_b AS se2,
      |          (n_a >= 2 AND n_b >= 2 AND se_a + se_b > 0.0) AS ok
      |        FROM se)
      |SELECT k AS event_type, n_a, n_b,
      |  CAST(CASE WHEN ok THEN round(
      |    (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |     - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)) / sqrt(se2)
      |    * 1000000.0) END AS BIGINT) AS t_e6,
      |  CAST(CASE WHEN ok THEN round(
      |    se2 * se2 / (se_a * se_a / (CAST(n_a AS DOUBLE) - 1.0)
      |      + se_b * se_b / (CAST(n_b AS DOUBLE) - 1.0))
      |    * 1000000.0) END AS BIGINT) AS df_e6
      |FROM fin""".stripMargin

  /** q311 — Brown–Forsythe variance-equality test
    * ([[graft.stats.Anova.brownForsythe]]) of order value across the
    * five priorities: do the SPREADS differ (q258 already asks about
    * the means)? Deviations from exact per-group lower medians, then
    * the same per-group ANOVA ledger; whole dollars (the q258
    * overflow rule). */
  private def q311(s: SparkSession, dir: String): DataFrame =
    graft.stats.Anova.brownForsythe(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
                round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q311Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |             CAST(round(o_totalprice) AS BIGINT) AS v
      |           FROM orders),
      |md AS (SELECT grp, v AS med FROM (
      |         SELECT grp, v,
      |           row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
      |           count(*) OVER (PARTITION BY grp) AS n_tot
      |         FROM r) x
      |       WHERE rn = (n_tot + 1) // 2),
      |z AS (SELECT r.grp, abs(r.v - md.med) AS v
      |      FROM r JOIN md ON md.grp = r.grp),
      |perg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_g,
      |           CAST(sum(v) AS BIGINT) AS t_sum, sum(v * v) AS s2
      |         FROM z GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
      |          CAST(sum(t_sum) AS BIGINT) AS t,
      |          CAST(count(*) AS BIGINT) AS k FROM perg),
      |terms AS (SELECT grp, n_g, t_sum, k, n,
      |            CAST(t_sum AS DOUBLE) / n_g AS mean_g,
      |            CAST(t AS DOUBLE) / n AS mean_all, s2
      |          FROM perg CROSS JOIN tot),
      |t2 AS (SELECT grp, n_g, t_sum, k, n,
      |         CAST(round(mean_g * 100.0) AS BIGINT) AS mean_e2,
      |         CAST(round(CAST(n_g AS DOUBLE) * (mean_g - mean_all)
      |           * (mean_g - mean_all)) AS BIGINT) AS ssb_term,
      |         CAST(round(CAST(s2 AS DOUBLE) - CAST(t_sum AS DOUBLE)
      |           * CAST(t_sum AS DOUBLE) / n_g) AS BIGINT)
      |           AS ssw_term
      |       FROM terms),
      |gl AS (SELECT CAST(sum(ssb_term) AS BIGINT) AS ssb,
      |         CAST(sum(ssw_term) AS BIGINT) AS ssw FROM t2)
      |SELECT grp AS o_orderpriority, n_g, t_sum, mean_e2, ssb_term,
      |  ssb, ssw, k, n,
      |  CASE WHEN k > 1 AND n > k THEN
      |    round((CAST(ssb AS DOUBLE) / (k - 1)) /
      |          (CAST(ssw AS DOUBLE) / (n - k)), 6)
      |  END AS f
      |FROM t2 CROSS JOIN gl""".stripMargin

  /** q312 — Hurst exponent by rescaled range
    * ([[graft.ts.Hurst.hurstRS]]) of daily order revenue per
    * priority at chunk sizes 8/16/32/64: long-memory vs
    * mean-reversion in one number, next to q20's ACF and q302's
    * unit root. The oracle replays the w-scaled deviations, the
    * per-chunk R/S double tree, and the e6-quantized log-log slope
    * with identical ln(w) literals. */
  private def q312(s: SparkSession, dir: String): DataFrame =
    graft.ts.Hurst.hurstRS(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(round(col("o_totalprice")).cast("long")).as("y")),
      "o_orderpriority", "o_orderdate", "y", Seq(8, 16, 32, 64))

  private val q312Sql: String = {
    val wVals = Seq(8, 16, 32, 64)
      .map(w => s"($w, ${math.round(math.log(w) * 1e6)})").mkString(", ")
    s"""WITH daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |st AS (SELECT k, y,
      |         CAST(row_number() OVER (PARTITION BY k ORDER BY d)
      |              AS BIGINT) AS idx
      |       FROM daily),
      |wt(w, x_e6) AS (VALUES $wVals),
      |ex AS (SELECT st.k, st.idx, st.y, wt.w, wt.x_e6,
      |         (idx - 1) // w AS chunk, (idx - 1) % w + 1 AS pos
      |       FROM st CROSS JOIN wt),
      |dv AS (SELECT *,
      |         CAST(sum(y) OVER (PARTITION BY k, w, chunk) AS BIGINT)
      |           AS total,
      |         CAST(count(*) OVER (PARTITION BY k, w, chunk) AS BIGINT)
      |           AS n_c,
      |         CAST(sum(y) OVER (PARTITION BY k, w, chunk ORDER BY pos)
      |              AS BIGINT) AS cum
      |       FROM ex),
      |wz AS (SELECT *, w * cum - pos * total AS wz FROM dv
      |       WHERE n_c = w),
      |ch AS (SELECT k, w, x_e6, chunk,
      |         CAST(max(wz) AS BIGINT) AS wz_max,
      |         CAST(min(wz) AS BIGINT) AS wz_min,
      |         CAST(max(total) AS BIGINT) AS total,
      |         sum(CAST(y AS HUGEINT) * y) AS s2
      |       FROM wz GROUP BY 1, 2, 3, 4
      |       HAVING CAST(w AS HUGEINT) * sum(CAST(y AS HUGEINT) * y)
      |          <> CAST(max(total) AS HUGEINT) * max(total)),
      |rs AS (SELECT k, w, x_e6,
      |         CAST(round((CAST(greatest(wz_max, 0) - least(wz_min, 0)
      |             AS DOUBLE) / w)
      |           / sqrt((CAST(s2 AS DOUBLE) - CAST(total AS DOUBLE)
      |               * CAST(total AS DOUBLE) / w) / w)
      |           * 1000000.0) AS BIGINT) AS rs_e6
      |       FROM ch),
      |pw AS (SELECT k, w, x_e6, CAST(count(*) AS BIGINT) AS n_chunks,
      |         CAST(sum(rs_e6) // count(*) AS BIGINT) AS rs_mean_e6
      |       FROM rs GROUP BY 1, 2, 3),
      |pt AS (SELECT *,
      |         CAST(round(ln(CAST(rs_mean_e6 AS DOUBLE) / 1000000.0)
      |           * 1000000.0) AS BIGINT) AS yl
      |       FROM pw),
      |ag AS (SELECT k, CAST(count(*) AS BIGINT) AS m,
      |         CAST(sum(x_e6) AS BIGINT) AS sx,
      |         CAST(sum(yl) AS BIGINT) AS sy,
      |         sum(CAST(x_e6 AS HUGEINT) * x_e6) AS sxx,
      |         sum(CAST(x_e6 AS HUGEINT) * yl) AS sxy
      |       FROM pt GROUP BY 1),
      |hh AS (SELECT k,
      |         CASE WHEN m >= 2 AND CAST(m AS HUGEINT) * sxx
      |                - CAST(sx AS HUGEINT) * sx <> 0 THEN
      |           CAST(round(CAST(CAST(m AS HUGEINT) * sxy
      |               - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |             / CAST(CAST(m AS HUGEINT) * sxx
      |               - CAST(sx AS HUGEINT) * sx AS DOUBLE)
      |             * 1000000.0) AS BIGINT) END AS h_e6
      |       FROM ag)
      |SELECT pw.k AS o_orderpriority, CAST(pw.w AS BIGINT) AS w,
      |  n_chunks, rs_mean_e6, h_e6
      |FROM pw JOIN hh ON hh.k = pw.k""".stripMargin
  }

  /** q313 — damped-trend Holt ([[graft.ts.ExpSmooth
    * .dampedExpSmooth]], φ = 9/10) of daily order revenue per
    * priority: q260's Holt with the Gardner–McKenzie trend damping —
    * the carried trend shrinks each step instead of extrapolating
    * linearly forever. Oracle replays the recursion with the same
    * truncated φ·b term. */
  private def q313(s: SparkSession, dir: String): DataFrame =
    graft.ts.ExpSmooth.dampedExpSmooth(
      t(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
                 dayBucket(col("o_orderdate")).as("o_orderdate"))
        .agg(sum(cents(col("o_totalprice"))).as("y")),
      "o_orderpriority", "o_orderdate", "y")

  private val q313Sql =
    """WITH RECURSIVE daily AS (
      |  SELECT o_orderpriority AS k,
      |         CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |           AS y
      |  FROM orders GROUP BY 1, 2),
      |s AS (SELECT k, d, y,
      |        row_number() OVER (PARTITION BY k ORDER BY d) AS rn
      |      FROM daily),
      |hw AS (
      |  SELECT k, rn, d, y, y AS l, CAST(0 AS BIGINT) AS b, y AS pred
      |  FROM s WHERE rn = 1
      |  UNION ALL
      |  SELECT s.k, s.rn, s.d, s.y,
      |    (2 * s.y + 8 * (hw.l + ((9 * hw.b) // 10))) // 10,
      |    (3 * (((2 * s.y + 8 * (hw.l + ((9 * hw.b) // 10))) // 10)
      |          - hw.l)
      |     + 7 * ((9 * hw.b) // 10)) // 10,
      |    hw.l + ((9 * hw.b) // 10)
      |  FROM hw JOIN s ON s.k = hw.k AND s.rn = hw.rn + 1)
      |SELECT k AS o_orderpriority, d AS o_orderdate, y AS y_c,
      |  CAST(l AS BIGINT) AS level_c, CAST(b AS BIGINT) AS trend_c,
      |  CAST(pred AS BIGINT) AS pred_c
      |FROM hw""".stripMargin

  // ---- paired monthly frame shared by q344/q345/q346/q349: per
  // nation, URGENT vs LOW monthly order revenue (cents) — the same
  // unit (nation-month) measured under two conditions, the paired
  // shape the PairedRank tier exists for. Customer is a broadcast
  // dimension; the aggregate shuffles once on (nation, month).
  private def pairedUrgLow(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
               to_date(date_trunc("month", col("o_orderdate"))).as("m"))
      .agg(sum(when(col("o_orderpriority") === "1-URGENT",
             cents(col("o_totalprice"))).otherwise(0L)).as("su"),
           sum(when(col("o_orderpriority") === "5-LOW",
             cents(col("o_totalprice"))).otherwise(0L)).as("sl"))

  private val pairSql =
    """pair AS (
      |  SELECT c_nationkey,
      |         CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |           THEN CAST(round(o_totalprice*100) AS BIGINT)
      |           ELSE 0 END) AS BIGINT) AS su,
      |         CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
      |           THEN CAST(round(o_totalprice*100) AS BIGINT)
      |           ELSE 0 END) AS BIGINT) AS sl
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |  GROUP BY 1, 2)""".stripMargin

  /** q344 — Wilcoxon signed-rank ([[graft.stats.PairedRank
    * .wilcoxonSignedRank]]) on the paired nation-month frame: does
    * URGENT revenue beat LOW revenue within the same nation-month —
    * the non-parametric paired t-test, where q305's Welch t compares
    * unpaired arms. Doubled-midrank |d| grid, exact tie ledger, one
    * z double tree. */
  private def q344(s: SparkSession, dir: String): DataFrame =
    graft.stats.PairedRank.wilcoxonSignedRank(
      pairedUrgLow(s, dir).select(col("c_nationkey"),
        (col("su") - col("sl")).as("d")),
      "c_nationkey", "d")

  private val q344Sql =
    s"""WITH $pairSql,
      |d AS (SELECT c_nationkey AS nat, su - sl AS d FROM pair
      |      WHERE su <> sl),
      |g AS (SELECT nat, abs(d) AS u,
      |        CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS cpos,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM d GROUP BY 1, 2),
      |pre AS (SELECT *, sum(c) OVER w - c AS pc FROM g
      |        WINDOW w AS (PARTITION BY nat ORDER BY u)),
      |rk AS (SELECT nat, cpos, c, 2*pc + c + 1 AS r2 FROM pre),
      |ag AS (SELECT nat, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(sum(cpos * r2) AS BIGINT) AS w2,
      |         CAST(sum(CAST(c AS HUGEINT)*c*c - c) AS BIGINT) AS tiesum
      |       FROM rk GROUP BY 1)
      |SELECT nat AS c_nationkey, n AS n_pairs, w2 AS w2_plus, tiesum,
      |  CASE WHEN CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
      |         * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
      |         - CAST(tiesum AS DOUBLE) / 12.0 <= 0.0 THEN NULL
      |  ELSE CAST(round(
      |    (CAST(w2 AS DOUBLE)
      |      - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 2.0)
      |    / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
      |           * (2.0 * CAST(n AS DOUBLE) + 1.0) / 6.0
      |           - CAST(tiesum AS DOUBLE) / 12.0)
      |    * 1000000.0) AS BIGINT) END AS z_e6
      |FROM ag""".stripMargin

  /** q345 — exact sign test ([[graft.stats.PairedRank
    * .signTestExact]]) on the same paired frame: direction-only,
    * assumption-free, and the p-value is an exact rational num/2ⁿ —
    * the only p in the suite that needs no approximation, replayed
    * by a HUGEINT recursive-CTE binomial prefix. */
  private def q345(s: SparkSession, dir: String): DataFrame =
    graft.stats.PairedRank.signTestExact(
      pairedUrgLow(s, dir).select(col("c_nationkey"),
        (col("su") - col("sl")).as("d")),
      "c_nationkey", "d")
      .select(col("c_nationkey").cast("long").as("c_nationkey"),
        col("n_nonzero"), col("n_pos"), col("p_e6"))

  private val q345Sql =
    s"""WITH RECURSIVE $pairSql,
      |d AS (SELECT c_nationkey AS nat, su - sl AS d FROM pair
      |      WHERE su <> sl),
      |tc AS (SELECT nat, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS s
      |       FROM d GROUP BY 1),
      |mm AS (SELECT nat, n, s, least(s, n - s) AS m FROM tc),
      |bin AS (
      |  SELECT nat, n, m, CAST(0 AS BIGINT) AS k,
      |         CAST(1 AS HUGEINT) AS c, CAST(1 AS HUGEINT) AS tail
      |  FROM mm
      |  UNION ALL
      |  SELECT nat, n, m, k + 1, c*(n-k)//(k+1), tail + c*(n-k)//(k+1)
      |  FROM bin WHERE k < m)
      |SELECT mm.nat AS c_nationkey, mm.n AS n_nonzero, mm.s AS n_pos,
      |  CASE WHEN mm.n > 120 THEN NULL
      |    ELSE CAST(least(bin.tail*2,
      |        CAST(1 AS HUGEINT) << CAST(mm.n AS INTEGER)) * 1000000
      |      // (CAST(1 AS HUGEINT) << CAST(mm.n AS INTEGER)) AS BIGINT)
      |    END AS p_e6
      |FROM mm JOIN bin ON bin.nat = mm.nat AND bin.k = mm.m""".stripMargin

  /** q346 — Benjamini–Hochberg FDR ([[graft.stats.Multiplicity
    * .bhAdjust]]) over q345's 25-nation sign-test battery: the
    * step-up ledger that turns 25 simultaneous p-values into
    * rejections with expected false-discovery ≤ 5% — integer-exact
    * on the e6-quantized p's, battery-bounded windows. */
  private def q346(s: SparkSession, dir: String): DataFrame =
    graft.stats.Multiplicity.bhAdjust(
      q345(s, dir).select(col("c_nationkey"), col("p_e6")),
      "c_nationkey", "p_e6")

  private val q346Sql =
    s"""WITH RECURSIVE $pairSql,
      |d AS (SELECT c_nationkey AS nat, su - sl AS d FROM pair
      |      WHERE su <> sl),
      |tc AS (SELECT nat, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS s
      |       FROM d GROUP BY 1),
      |mm AS (SELECT nat, n, s, least(s, n - s) AS m FROM tc),
      |bin AS (
      |  SELECT nat, n, m, CAST(0 AS BIGINT) AS k,
      |         CAST(1 AS HUGEINT) AS c, CAST(1 AS HUGEINT) AS tail
      |  FROM mm
      |  UNION ALL
      |  SELECT nat, n, m, k + 1, c*(n-k)//(k+1), tail + c*(n-k)//(k+1)
      |  FROM bin WHERE k < m),
      |p AS (SELECT mm.nat,
      |        CASE WHEN mm.n > 120 THEN NULL
      |          ELSE CAST(least(bin.tail*2,
      |              CAST(1 AS HUGEINT) << CAST(mm.n AS INTEGER)) * 1000000
      |            // (CAST(1 AS HUGEINT) << CAST(mm.n AS INTEGER))
      |            AS BIGINT) END AS p_e6
      |      FROM mm JOIN bin ON bin.nat = mm.nat AND bin.k = mm.m),
      |b AS (SELECT nat, p_e6,
      |        CAST(count(*) OVER () AS BIGINT) AS m,
      |        CAST(row_number() OVER (ORDER BY p_e6, nat) AS BIGINT)
      |          AS rank
      |      FROM p WHERE p_e6 IS NOT NULL),
      |adj AS (SELECT *, least(1000000, p_e6 * m // rank) AS raw_adj
      |        FROM b),
      |sf AS (SELECT *, min(raw_adj) OVER (ORDER BY p_e6 DESC, nat DESC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS p_adj_e6
      |       FROM adj)
      |SELECT nat AS c_nationkey, m, rank, p_e6, p_adj_e6,
      |  CASE WHEN p_adj_e6 <= 50000 THEN 1 ELSE 0 END AS reject
      |FROM sf""".stripMargin

  /** q347 — two-sample Cramér–von Mises ([[graft.stats.Hypothesis
    * .cramerVonMises]]): do finished ('F') and open ('O') orders
    * draw the same whole-dollar price distribution within each
    * priority — the whole-curve companion to q225's KS and q331's
    * AD over the same grid discipline. */
  private def q347(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.cramerVonMises(
      t(s, dir, "orders")
        .where(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderpriority"),
          when(col("o_orderstatus") === "F", 0L).otherwise(1L).as("arm"),
          round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "arm", "v")

  private val q347Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |            CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS arm,
      |            CAST(round(o_totalprice) AS BIGINT) AS v
      |          FROM orders WHERE o_orderstatus IN ('F', 'O')),
      |g AS (SELECT grp, v,
      |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS ca,
      |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS cb,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM r GROUP BY 1, 2),
      |pre AS (SELECT *, sum(c) OVER w - c AS pc,
      |          sum(ca) OVER w - ca AS pa, sum(cb) OVER w - cb AS pb
      |        FROM g WINDOW w AS (PARTITION BY grp ORDER BY v)),
      |blk AS (SELECT grp, ca, cb, 2*pc + c + 1 AS r2, pa, pb FROM pre),
      |sq AS (SELECT grp, ca, cb,
      |         CAST(ca AS HUGEINT)*(r2-2*pa)*(r2-2*pa)
      |           - CAST(2 AS HUGEINT)*(r2-2*pa)*ca*(ca+1)
      |           + 4*(CAST(ca AS HUGEINT)*(ca+1)*(2*ca+1)//6) AS sqa,
      |         CAST(cb AS HUGEINT)*(r2-2*pb)*(r2-2*pb)
      |           - CAST(2 AS HUGEINT)*(r2-2*pb)*cb*(cb+1)
      |           + 4*(CAST(cb AS HUGEINT)*(cb+1)*(2*cb+1)//6) AS sqb
      |       FROM blk),
      |ag AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n_a,
      |         CAST(sum(cb) AS BIGINT) AS n_b,
      |         sum(sqa) AS sa, sum(sqb) AS sb
      |       FROM sq GROUP BY 1),
      |u AS (SELECT grp, n_a, n_b,
      |        CAST(n_a AS HUGEINT) * sa + CAST(n_b AS HUGEINT) * sb
      |          AS u4
      |      FROM ag)
      |SELECT grp AS o_orderpriority, n_a, n_b,
      |  CAST(u4 AS BIGINT) AS u4,
      |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
      |    ELSE CAST(round((CAST(u4 AS DOUBLE) / 4.0
      |        / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
      |           * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
      |      - (4.0 * CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) - 1.0)
      |        / (6.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))))
      |      * 1000000.0) AS BIGINT) END AS t_e6
      |FROM u""".stripMargin

  /** q348 — Mantel–Haenszel ([[graft.stats.Hypothesis
    * .mantelHaenszel]]): is high priority (URGENT/HIGH) associated
    * with finished status, POOLED ACROSS NATIONS — the
    * Simpson's-paradox-proof version of q235's chi-square, with the
    * common odds ratio as the effect size. */
  private def q348(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.mantelHaenszel(
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("e"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("o")),
      "c_nationkey", "e", "o")

  private val q348Sql =
    """WITH r AS (SELECT c_nationkey AS st,
      |            CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |              THEN 1 ELSE 0 END AS e,
      |            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o
      |          FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT st, CAST(count(*) AS BIGINT) AS n,
      |            CAST(sum(CASE WHEN e = 1 AND o = 1 THEN 1 ELSE 0 END)
      |              AS BIGINT) AS a,
      |            CAST(sum(e) AS BIGINT) AS n1,
      |            CAST(sum(o) AS BIGINT) AS m1
      |          FROM r GROUP BY 1),
      |x AS (SELECT *, n1 - a AS b, m1 - a AS c,
      |        n - n1 - (m1 - a) AS d, n - n1 AS n0, n - m1 AS m0
      |      FROM cells),
      |q AS (SELECT *,
      |        CAST(CAST(n1 AS HUGEINT) * m1 * 1000000 // n AS BIGINT)
      |          AS e_e6,
      |        CASE WHEN n < 2 THEN 0 ELSE
      |          CAST(CAST(n1 AS HUGEINT) * n0 * m1 * m0 * 1000000
      |            // (CAST(n AS HUGEINT) * n * (n - 1)) AS BIGINT) END
      |          AS v_e6,
      |        CAST(CAST(a AS HUGEINT) * d * 1000000 // n AS BIGINT)
      |          AS ad_e6,
      |        CAST(CAST(b AS HUGEINT) * c * 1000000 // n AS BIGINT)
      |          AS bc_e6
      |      FROM x),
      |gl AS (SELECT CAST(sum(a) AS BIGINT) AS sum_a,
      |         CAST(sum(e_e6) AS BIGINT) AS sum_e6,
      |         CAST(sum(v_e6) AS BIGINT) AS sum_v6,
      |         CAST(sum(ad_e6) AS BIGINT) AS sum_ad6,
      |         CAST(sum(bc_e6) AS BIGINT) AS sum_bc6
      |       FROM q),
      |gv AS (SELECT *,
      |         greatest(abs(sum_a * 1000000 - sum_e6) - 500000, 0)
      |           AS cc
      |       FROM gl)
      |SELECT q.st AS c_nationkey, q.a, q.n1, q.m1, q.n,
      |  CASE WHEN gv.sum_v6 <= 0 THEN NULL
      |    ELSE CAST(round(CAST(gv.cc AS DOUBLE) * CAST(gv.cc AS DOUBLE)
      |      / (CAST(gv.sum_v6 AS DOUBLE) * 1000000.0) * 1000000.0)
      |      AS BIGINT) END AS chi2_e6,
      |  CASE WHEN gv.sum_bc6 <= 0 THEN NULL
      |    ELSE CAST(round(CAST(gv.sum_ad6 AS DOUBLE)
      |      / CAST(gv.sum_bc6 AS DOUBLE) * 1000000.0) AS BIGINT)
      |    END AS or_e6
      |FROM q CROSS JOIN gv""".stripMargin

  /** q349 — Hodges–Lehmann shift ([[graft.stats.Hypothesis
    * .hodgesLehmannShift]]) between each nation's URGENT and LOW
    * monthly revenue series: q344 says they differ; this says by
    * HOW MANY cents — the robust effect size, exact lower median of
    * the 80×80 month-pair differences (calendar-bounded grid). */
  private def q349(s: SparkSession, dir: String): DataFrame = {
    val pair = pairedUrgLow(s, dir)
    graft.stats.Hypothesis.hodgesLehmannShift(
      pair.select(col("c_nationkey"), lit(0L).as("arm"),
          col("su").as("v"))
        .unionAll(pair.select(col("c_nationkey"), lit(1L).as("arm"),
          col("sl").as("v"))),
      "c_nationkey", "arm", "v")
  }

  private val q349Sql =
    s"""WITH $pairSql,
      |ga AS (SELECT c_nationkey AS nat, su AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |       FROM pair GROUP BY 1, 2),
      |gb AS (SELECT c_nationkey AS nat, sl AS v,
      |         CAST(count(*) AS BIGINT) AS c
      |       FROM pair GROUP BY 1, 2),
      |dd AS (SELECT ga.nat, ga.v - gb.v AS d,
      |         CAST(sum(ga.c * gb.c) AS BIGINT) AS w
      |       FROM ga JOIN gb ON gb.nat = ga.nat GROUP BY 1, 2),
      |cum AS (SELECT nat, d, w,
      |          CAST(sum(w) OVER (PARTITION BY nat ORDER BY d)
      |            AS BIGINT) AS cw
      |        FROM dd),
      |tot AS (SELECT nat, CAST(sum(w) AS BIGINT) AS n_pairs FROM dd
      |        GROUP BY 1),
      |cnt AS (SELECT c_nationkey AS nat,
      |          CAST(count(*) AS BIGINT) AS n_a,
      |          CAST(count(*) AS BIGINT) AS n_b
      |        FROM pair GROUP BY 1),
      |med AS (SELECT cum.nat, min(cum.d) AS hl_c,
      |          CAST(max(tot.n_pairs) AS BIGINT) AS n_pairs
      |        FROM cum JOIN tot ON tot.nat = cum.nat
      |        WHERE cum.cw >= (tot.n_pairs + 1) // 2
      |        GROUP BY 1)
      |SELECT cnt.nat AS c_nationkey, cnt.n_a, cnt.n_b,
      |  coalesce(med.n_pairs, 0) AS n_pairs, med.hl_c
      |FROM cnt LEFT JOIN med ON med.nat = cnt.nat""".stripMargin

  /** q350 — turning-point randomness gate ([[graft.stats.Diagnostics
    * .turningPointTest]]) over the daily event series: the
    * derivative-level complement to q335's runs test — strict local
    * extrema counted exactly, Kendall's E/Var, one z tree. */
  private def q350(s: SparkSession, dir: String): DataFrame =
    graft.stats.Diagnostics.turningPointTest(dailyCents(s, dir),
      "event_type")

  private val q350Sql =
    s"""WITH $dailySql,
      |s AS (SELECT event_type, ds, y,
      |        lag(y) OVER w AS yp, lead(y) OVER w AS yn
      |      FROM daily
      |      WINDOW w AS (PARTITION BY event_type ORDER BY ds)),
      |ag AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN (yp < y AND y > yn)
      |             OR (yp > y AND y < yn) THEN 1 ELSE 0 END)
      |           AS BIGINT) AS t
      |       FROM s GROUP BY 1)
      |SELECT event_type, n AS n_obs, t AS n_turns,
      |  CASE WHEN n < 3 THEN NULL
      |    ELSE CAST(round((CAST(t AS DOUBLE) - 2.0 * (n - 2) / 3.0)
      |      / sqrt((16.0 * CAST(n AS DOUBLE) - 29.0) / 90.0)
      |      * 1000000.0) AS BIGINT) END AS z_e6
      |FROM ag""".stripMargin

  /** q351 — Bartels rank von Neumann ([[graft.stats.Diagnostics
    * .bartelsRvn]]) over the same series: the rank-robust
    * Durbin–Watson — serial dependence read off time-ordered ranks,
    * RVN quantized by one truncating division, exact finite-sample
    * variance. */
  private def q351(s: SparkSession, dir: String): DataFrame =
    graft.stats.Diagnostics.bartelsRvn(dailyCents(s, dir), "event_type")

  private val q351Sql =
    s"""WITH $dailySql,
      |rk AS (SELECT event_type, ds, y,
      |         CAST(2 * (rank() OVER (PARTITION BY event_type
      |             ORDER BY y) - 1)
      |           + count(*) OVER (PARTITION BY event_type, y) + 1
      |           AS BIGINT) AS r2
      |       FROM daily),
      |sq AS (SELECT event_type, r2,
      |         lead(r2) OVER (PARTITION BY event_type ORDER BY ds)
      |           AS r2n,
      |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
      |           AS n
      |       FROM rk),
      |ag AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN r2n IS NULL THEN 0
      |           ELSE CAST(r2 - r2n AS HUGEINT) * (r2 - r2n) END)
      |           AS BIGINT) AS nm4,
      |         CAST(sum(CAST(r2 - (n + 1) AS HUGEINT) * (r2 - (n + 1)))
      |           AS BIGINT) AS d4
      |       FROM sq GROUP BY 1)
      |SELECT event_type, n AS n_obs, nm4, d4,
      |  CASE WHEN n < 3 OR d4 = 0 THEN NULL
      |    ELSE CAST(CAST(nm4 AS HUGEINT) * 1000000 // d4 AS BIGINT)
      |    END AS rvn_e6,
      |  CASE WHEN n < 3 OR d4 = 0 THEN NULL
      |    ELSE CAST(round(
      |      (CAST(CAST(nm4 AS HUGEINT) * 1000000 // d4 AS DOUBLE)
      |          / 1000000.0 - 2.0)
      |      / sqrt(4.0 * (n - 2)
      |          * (5.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |             - 2.0 * CAST(n AS DOUBLE) - 9.0)
      |        / (5.0 * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
      |           * (CAST(n AS DOUBLE) - 1.0)
      |           * (CAST(n AS DOUBLE) - 1.0)))
      |      * 1000000.0) AS BIGINT) END AS z_e6
      |FROM ag""".stripMargin

  /** q352 — Quade test ([[graft.stats.PairedRank.quadeTest]]):
    * blocks = complete days, treatments = the five event types —
    * the range-weighted Friedman next to q326 (days that
    * discriminate harder count more). Only days observing every
    * event type enter (the complete-block contract). */
  private def q352(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyCents(s, dir)
    val kdf = daily.agg(countDistinct(col("event_type")).as("kk"))
    val full = daily.groupBy(col("ds"))
      .agg(count(lit(1)).as("nt"))
      .crossJoin(broadcast(kdf))
      .where(col("nt") === col("kk"))
      .select(col("ds"))
    graft.stats.PairedRank.quadeTest(daily.join(full, Seq("ds")),
      "ds", "event_type", "y")
  }

  private val q352Sql =
    s"""WITH $dailySql,
      |bl AS (SELECT ds FROM daily GROUP BY ds
      |       HAVING count(*) = (SELECT count(DISTINCT event_type)
      |                          FROM daily)),
      |rows_ AS (SELECT d.event_type AS t, d.ds AS b, d.y
      |          FROM daily d JOIN bl ON bl.ds = d.ds),
      |kk AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS k FROM rows_),
      |rk AS (SELECT t, b, y,
      |         CAST(2 * (rank() OVER (PARTITION BY b ORDER BY y) - 1)
      |           + count(*) OVER (PARTITION BY b, y) + 1 AS BIGINT)
      |           AS r2
      |       FROM rows_),
      |rng AS (SELECT b, CAST(max(y) - min(y) AS BIGINT) AS rng
      |        FROM rows_ GROUP BY 1),
      |rg AS (SELECT rng, CAST(count(*) AS BIGINT) AS c FROM rng
      |       GROUP BY 1),
      |rq AS (SELECT rng,
      |         CAST(2 * (sum(c) OVER (ORDER BY rng) - c) + c + 1
      |           AS BIGINT) AS q2
      |       FROM rg),
      |bq AS (SELECT rng.b, rq.q2 FROM rng JOIN rq USING (rng)),
      |sc AS (SELECT rk.t, bq.q2 * (rk.r2 - (kk.k + 1)) AS s4
      |       FROM rk JOIN bq ON bq.b = rk.b CROSS JOIN kk),
      |pt AS (SELECT t, CAST(sum(s4) AS BIGINT) AS s4_j,
      |         sum(CAST(s4 AS HUGEINT) * s4) AS sq_ij
      |       FROM sc GROUP BY 1),
      |gl AS (SELECT sum(CAST(s4_j AS HUGEINT) * s4_j) AS sb,
      |         sum(sq_ij) AS sa
      |       FROM pt),
      |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks FROM rng)
      |SELECT pt.t AS event_type, pt.s4_j, nb.n_blocks, kk.k,
      |  CASE WHEN CAST(nb.n_blocks AS HUGEINT) * gl.sa - gl.sb <= 0
      |    THEN NULL
      |  ELSE CAST(round(CAST(nb.n_blocks - 1 AS DOUBLE)
      |      * CAST(gl.sb AS DOUBLE)
      |      / CAST(CAST(nb.n_blocks AS HUGEINT) * gl.sa - gl.sb
      |          AS DOUBLE)
      |      * 1000000.0) AS BIGINT) END AS f_e6
      |FROM pt CROSS JOIN gl CROSS JOIN nb CROSS JOIN kk""".stripMargin

  /** q353 — EWMA control chart ([[graft.ts.ControlChart.ewmaChart]]):
    * each event type calibrates mean/σ on its first 14 days, then
    * charts the exact floor-division EWMA recursion against the
    * steady-state ±3σ·√(λ/(2−λ)) band — the SPC view of drift next
    * to q329's Page–Hinkley. The oracle replays the recursion as a
    * recursive CTE (floor `//` ≡ the engine's Math.floorDiv) and the
    * limits as the same double tree. */
  private def q353(s: SparkSession, dir: String): DataFrame =
    graft.ts.ControlChart.ewmaChart(dailyCents(s, dir), "event_type")

  private val q353Sql =
    s"""WITH RECURSIVE $dailySql,
      |s AS (SELECT event_type, ds, y,
      |        CAST(row_number() OVER (PARTITION BY event_type
      |          ORDER BY ds) AS BIGINT) AS rn
      |      FROM daily),
      |cal AS (SELECT event_type, CAST(sum(y) AS BIGINT) AS s1,
      |          sum(CAST(y AS HUGEINT) * y) AS q
      |        FROM s WHERE rn <= 14 GROUP BY 1
      |        HAVING count(*) = 14),
      |lim AS (SELECT event_type, s1, s1 // 14 AS mu_c,
      |          (CAST(q AS DOUBLE)
      |            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 14.0)
      |            / 13.0 AS va
      |        FROM cal),
      |lv AS (SELECT event_type, mu_c,
      |         CAST(round((CAST(s1 AS DOUBLE) / 14.0
      |             - 3.0 * sqrt(va)
      |               * sqrt((2.0 / 10.0) / (2.0 - 2.0 / 10.0)))
      |           * 1000000.0) AS BIGINT) AS lim_lo_e6,
      |         CAST(round((CAST(s1 AS DOUBLE) / 14.0
      |             + 3.0 * sqrt(va)
      |               * sqrt((2.0 / 10.0) / (2.0 - 2.0 / 10.0)))
      |           * 1000000.0) AS BIGINT) AS lim_hi_e6
      |       FROM lim WHERE va > 0.0),
      |rec AS (
      |  SELECT s.event_type, rn, ds, y, lv.mu_c AS z
      |  FROM s JOIN lv USING (event_type) WHERE rn = 14
      |  UNION ALL
      |  SELECT s.event_type, s.rn, s.ds, s.y,
      |    (2 * s.y + 8 * rec.z) // 10
      |  FROM rec JOIN s ON s.event_type = rec.event_type
      |                 AND s.rn = rec.rn + 1)
      |SELECT rec.event_type,
      |  CAST(epoch(rec.ds) AS BIGINT) AS ds_sec, rec.y AS y_c,
      |  rec.z AS z_c, lv.mu_c, lv.lim_lo_e6, lv.lim_hi_e6,
      |  CASE WHEN rec.z * 1000000 < lv.lim_lo_e6
      |         OR rec.z * 1000000 > lv.lim_hi_e6 THEN 1 ELSE 0 END
      |    AS alarm
      |FROM rec JOIN lv USING (event_type) WHERE rn > 14""".stripMargin

  /** q354 — Grubbs' maximum studentized deviate
    * ([[graft.stats.Hypothesis.grubbsMax]]) of whole-dollar order
    * values per priority: is each priority's most extreme price an
    * outlier against its own distribution — the group-level audit
    * next to the row-level quality gates; exact integer argmax,
    * smallest-value tie rule, one double tree. */
  private def q354(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.grubbsMax(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q354Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |            CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
      |mom AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
      |          CAST(sum(v) AS BIGINT) AS s1,
      |          sum(CAST(v AS HUGEINT) * v) AS q
      |        FROM r GROUP BY 1),
      |d AS (SELECT r.grp, v, n, s1, q,
      |        abs(CAST(v AS HUGEINT) * n - s1) AS dnum
      |      FROM r JOIN mom ON mom.grp = r.grp),
      |mx AS (SELECT grp, max(dnum) AS dmax FROM d GROUP BY 1)
      |SELECT d.grp AS o_orderpriority, n,
      |  min(v) AS x_at,
      |  CASE WHEN n < 3 OR (CAST(q AS DOUBLE)
      |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
      |      <= 0.0 THEN NULL
      |    ELSE CAST(round(CAST(dmax AS DOUBLE) / CAST(n AS DOUBLE)
      |      / sqrt((CAST(q AS DOUBLE)
      |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0))
      |      * 1000000.0) AS BIGINT) END AS g_e6
      |FROM d JOIN mx ON mx.grp = d.grp AND d.dnum = mx.dmax
      |GROUP BY d.grp, n, s1, q, dmax""".stripMargin

  /** q355 — Cox–Stuart trend test ([[graft.stats.Diagnostics
    * .coxStuart]]) over the daily event series: back half vs front
    * half, pair by pair, with the exact rational sign-test p — the
    * assumption-free trend gate next to q297's Mann–Kendall. */
  private def q355(s: SparkSession, dir: String): DataFrame =
    graft.stats.Diagnostics.coxStuart(dailyCents(s, dir), "event_type")

  private val q355Sql =
    s"""WITH RECURSIVE $dailySql,
      |s AS (SELECT event_type, ds, y,
      |        CAST(row_number() OVER (PARTITION BY event_type
      |          ORDER BY ds) AS BIGINT) AS rn
      |      FROM daily),
      |cn AS (SELECT event_type, CAST(max(rn) AS BIGINT) AS n FROM s
      |       GROUP BY 1),
      |pr AS (SELECT a.event_type, b.y - a.y AS d
      |       FROM s a JOIN cn ON cn.event_type = a.event_type
      |       JOIN s b ON b.event_type = a.event_type
      |               AND b.rn = a.rn + (cn.n + 1) // 2),
      |tc AS (SELECT event_type,
      |         CAST(sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS np,
      |         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |           AS pos
      |       FROM pr GROUP BY 1),
      |mm AS (SELECT event_type, np, pos, least(pos, np - pos) AS m
      |       FROM tc),
      |bin AS (
      |  SELECT event_type, np, m, CAST(0 AS BIGINT) AS k,
      |         CAST(1 AS HUGEINT) AS c, CAST(1 AS HUGEINT) AS tail
      |  FROM mm
      |  UNION ALL
      |  SELECT event_type, np, m, k + 1, c*(np-k)//(k+1),
      |         tail + c*(np-k)//(k+1)
      |  FROM bin WHERE k < m)
      |SELECT cn.event_type, cn.n AS n_obs, mm.np AS n_pairs,
      |  mm.pos AS n_pos,
      |  CASE WHEN mm.np > 120 THEN NULL
      |    ELSE CAST(least(bin.tail*2,
      |        CAST(1 AS HUGEINT) << CAST(mm.np AS INTEGER)) * 1000000
      |      // (CAST(1 AS HUGEINT) << CAST(mm.np AS INTEGER))
      |      AS BIGINT) END AS p_e6
      |FROM cn JOIN mm ON mm.event_type = cn.event_type
      |JOIN bin ON bin.event_type = mm.event_type AND bin.k = mm.m""".stripMargin

  /** q356 — median absolute deviation ([[graft.stats.Robust
    * .madScale]]) of whole-dollar order values per priority: the
    * 50%-breakdown scale next to q16's stddev ceiling — two exact
    * lower-median grid passes, no moments, no floats. */
  private def q356(s: SparkSession, dir: String): DataFrame =
    graft.stats.Robust.madScale(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q356Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |            CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
      |g AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM r
      |      GROUP BY 1, 2),
      |tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM g
      |        GROUP BY 1),
      |cum AS (SELECT g.grp, v, c, n,
      |          CAST(sum(c) OVER (PARTITION BY g.grp ORDER BY v)
      |            AS BIGINT) AS cc
      |        FROM g JOIN tot ON tot.grp = g.grp),
      |med AS (SELECT grp, min(v) AS med, CAST(max(n) AS BIGINT) AS n
      |        FROM cum WHERE cc >= (n + 1) // 2 GROUP BY 1),
      |fold AS (SELECT g.grp, abs(v - med) AS d,
      |           CAST(sum(c) AS BIGINT) AS c
      |         FROM g JOIN med ON med.grp = g.grp GROUP BY 1, 2),
      |cum2 AS (SELECT fold.grp, d, c, med.n AS n,
      |           CAST(sum(c) OVER (PARTITION BY fold.grp ORDER BY d)
      |             AS BIGINT) AS cc
      |         FROM fold JOIN med ON med.grp = fold.grp)
      |SELECT cum2.grp AS o_orderpriority,
      |  CAST(max(cum2.n) AS BIGINT) AS n,
      |  max(med.med) AS med_c, min(d) AS mad_c
      |FROM cum2 JOIN med ON med.grp = cum2.grp
      |WHERE cc >= (cum2.n + 1) // 2 GROUP BY 1""".stripMargin

  /** q357 — 10%-trimmed mean ([[graft.stats.Robust.trimmedMean]])
    * of the same values: the bounded-influence location — exact
    * tie-block splitting at the trim boundaries, kept mass exactly
    * n − 2k, one truncating e6 division. */
  private def q357(s: SparkSession, dir: String): DataFrame =
    graft.stats.Robust.trimmedMean(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q357Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |            CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
      |g AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM r
      |      GROUP BY 1, 2),
      |tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM g
      |        GROUP BY 1),
      |cum AS (SELECT g.grp, v, c, n, n * 1 // 10 AS k,
      |          CAST(sum(c) OVER (PARTITION BY g.grp ORDER BY v)
      |            AS BIGINT) AS cc
      |        FROM g JOIN tot ON tot.grp = g.grp),
      |kc AS (SELECT *, greatest(0, least(cc, n - k)
      |         - greatest(cc - c, k)) AS kc
      |       FROM cum)
      |SELECT grp AS o_orderpriority, CAST(max(n) AS BIGINT) AS n,
      |  CAST(max(k) AS BIGINT) AS k_trim,
      |  min(CASE WHEN kc > 0 THEN v END) AS lo_c,
      |  max(CASE WHEN kc > 0 THEN v END) AS hi_c,
      |  CASE WHEN max(n) - 2 * max(k) <= 0 THEN NULL
      |    ELSE CAST(sum(CAST(v AS HUGEINT) * kc) * 1000000
      |      // (max(n) - 2 * max(k)) AS BIGINT) END AS trimmed_mean_e6
      |FROM kc GROUP BY 1""".stripMargin

  /** q358 — rank-biased overlap ([[graft.stats.RankCompare.rbo]],
    * p = 9/10, D = 20): per event type, do revenue and volume agree
    * on the TOP days — the top-weighted agreement between the
    * rank-by-daily-revenue and rank-by-daily-count orderings, every
    * per-depth term an exact rational. */
  private def q358(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("y"), count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val ranked = daily
      .withColumn("posA", row_number().over(
        w.orderBy(col("y").desc, col("ds"))).cast("long"))
      .withColumn("posB", row_number().over(
        w.orderBy(col("cnt").desc, col("ds"))).cast("long"))
    graft.stats.RankCompare.rbo(ranked, "event_type", "posA", "posB")
  }

  private val q358Sql = {
    val depthRows = (1 to 20).map(d =>
      s"($d, ${BigInt(9).pow(d - 1)}, ${BigInt(10).pow(d)})")
      .mkString(", ")
    s"""WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
      |           AS y,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |rk AS (SELECT event_type,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |           ORDER BY y DESC, ds) AS BIGINT) AS pa,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |           ORDER BY cnt DESC, ds) AS BIGINT) AS pb
      |       FROM daily),
      |m AS (SELECT event_type, greatest(pa, pb) AS m,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM rk WHERE greatest(pa, pb) <= 20 GROUP BY 1, 2),
      |dep(d, p9, p10) AS (VALUES $depthRows),
      |terms AS (SELECT event_type, CAST(d AS BIGINT) AS d,
      |            CAST(sum(c) AS BIGINT) AS o_d,
      |            CAST(CAST(p9 AS HUGEINT) * sum(c) * 1000000
      |              // (CAST(p10 AS HUGEINT) * d) AS BIGINT)
      |              AS term_e6
      |          FROM m JOIN dep ON m.m <= dep.d
      |          GROUP BY event_type, d, p9, p10),
      |ag AS (SELECT event_type,
      |         CAST(max(CASE WHEN d = 20 THEN o_d END) AS BIGINT)
      |           AS n_common,
      |         CAST(sum(term_e6) AS BIGINT) AS rbo_e6
      |       FROM terms GROUP BY 1)
      |SELECT rk2.event_type, CAST(20 AS BIGINT) AS depth,
      |  coalesce(ag.n_common, 0) AS n_common,
      |  coalesce(ag.rbo_e6, 0) AS rbo_e6
      |FROM (SELECT DISTINCT event_type FROM rk) rk2
      |LEFT JOIN ag ON ag.event_type = rk2.event_type""".stripMargin
  }

  /** q359 — Theil T inequality ([[graft.stats.Concentration
    * .theilIndex]]) of customer revenue per nation: the
    * entropy-decomposable twin of q231-style Gini audits — is each
    * nation's revenue spread or captured by a few customers;
    * per-row e6-rounded ln terms (gTest discipline), exact moments. */
  private def q359(s: SparkSession, dir: String): DataFrame =
    graft.stats.Concentration.theilIndex(
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("x")),
      "c_nationkey", "x")

  private val q359Sql =
    """WITH cust AS (
      |  SELECT c_nationkey, o_custkey,
      |         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
      |           AS BIGINT) AS x
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |nt AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS total
      |       FROM cust GROUP BY 1),
      |tm AS (SELECT cust.c_nationkey,
      |         CAST(sum(CAST(round((CAST(x AS DOUBLE) / total)
      |           * ln(CAST(x AS DOUBLE) * n / total) * 1000000.0)
      |           AS BIGINT)) AS BIGINT) AS tsum
      |       FROM cust JOIN nt ON nt.c_nationkey = cust.c_nationkey
      |       WHERE x > 0 GROUP BY 1)
      |SELECT nt.c_nationkey, nt.n, nt.total,
      |  CASE WHEN nt.total = 0 THEN NULL ELSE tm.tsum END AS theil_e6
      |FROM nt LEFT JOIN tm ON tm.c_nationkey = nt.c_nationkey""".stripMargin

  /** Complete-day event matrix shared by q360/q361: one row per day
    * observing ALL FIVE event types, daily cents per type as
    * columns. */
  private def eventMatrix(s: SparkSession, dir: String): DataFrame =
    dailyCents(s, dir)
      .groupBy(col("ds"))
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(first(col("y")))
      .na.drop()

  private val eventMatrixSql =
    s"""$dailySql,
      |mat AS (
      |  SELECT ds,
      |    max(CASE WHEN event_type = 'click' THEN y END) AS click,
      |    max(CASE WHEN event_type = 'error' THEN y END) AS error,
      |    max(CASE WHEN event_type = 'purchase' THEN y END) AS purchase,
      |    max(CASE WHEN event_type = 'signup' THEN y END) AS signup,
      |    max(CASE WHEN event_type = 'view' THEN y END) AS view
      |  FROM daily GROUP BY 1
      |  HAVING count(*) = 5)""".stripMargin

  /** q360 — Cronbach's alpha ([[graft.stats.Agreement
    * .cronbachAlpha]]) over the five event types' daily volumes: do
    * they move as one underlying activity level — the reliability
    * read next to q342's Kendall W, exact integer variance rational,
    * one double tree. */
  private def q360(s: SparkSession, dir: String): DataFrame =
    graft.stats.Agreement.cronbachAlpha(eventMatrix(s, dir),
      Seq("click", "error", "purchase", "signup", "view"))

  private val q360Sql =
    s"""WITH $eventMatrixSql,
      |rows_ AS (SELECT click AS x0, error AS x1, purchase AS x2,
      |            signup AS x3, view AS x4,
      |            click + error + purchase + signup + view AS t
      |          FROM mat),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x0) AS BIGINT) AS s0,
      |        CAST(sum(x1) AS BIGINT) AS s1,
      |        CAST(sum(x2) AS BIGINT) AS s2,
      |        CAST(sum(x3) AS BIGINT) AS s3,
      |        CAST(sum(x4) AS BIGINT) AS s4,
      |        sum(CAST(x0 AS HUGEINT) * x0) AS q0,
      |        sum(CAST(x1 AS HUGEINT) * x1) AS q1,
      |        sum(CAST(x2 AS HUGEINT) * x2) AS q2,
      |        sum(CAST(x3 AS HUGEINT) * x3) AS q3,
      |        sum(CAST(x4 AS HUGEINT) * x4) AS q4,
      |        CAST(sum(t) AS BIGINT) AS st,
      |        sum(CAST(t AS HUGEINT) * t) AS qt
      |      FROM rows_),
      |nd AS (SELECT n,
      |         (CAST(n AS HUGEINT) * q0 - CAST(s0 AS HUGEINT) * s0)
      |         + (CAST(n AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
      |         + (CAST(n AS HUGEINT) * q2 - CAST(s2 AS HUGEINT) * s2)
      |         + (CAST(n AS HUGEINT) * q3 - CAST(s3 AS HUGEINT) * s3)
      |         + (CAST(n AS HUGEINT) * q4 - CAST(s4 AS HUGEINT) * s4)
      |           AS num,
      |         CAST(n AS HUGEINT) * qt - CAST(st AS HUGEINT) * st
      |           AS den
      |       FROM a)
      |SELECT n, CAST(5 AS BIGINT) AS k,
      |  CASE WHEN den <= 0 THEN NULL
      |    ELSE CAST(round(1.25 * (1.0 - CAST(num AS DOUBLE)
      |      / CAST(den AS DOUBLE)) * 1000000.0) AS BIGINT) END
      |    AS alpha_e6
      |FROM nd""".stripMargin

  /** q361 — partial correlation ([[graft.stats.RankCorr
    * .partialCorr]]): does purchase volume track view volume once
    * click volume is held fixed — the one-confounder deconfounding
    * over the same complete-day matrix; three e6-quantized pairwise
    * r's, one small tree for the partial. */
  private def q361(s: SparkSession, dir: String): DataFrame =
    graft.stats.RankCorr.partialCorr(
      eventMatrix(s, dir).withColumn("g", lit("all")),
      "g", "purchase", "view", "click")

  private val q361Sql =
    s"""WITH $eventMatrixSql,
      |rows_ AS (SELECT purchase AS x, view AS y, click AS z FROM mat),
      |a AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(x) AS BIGINT) AS sx,
      |        CAST(sum(y) AS BIGINT) AS sy,
      |        CAST(sum(z) AS BIGINT) AS sz,
      |        sum(CAST(x AS HUGEINT) * x) AS qx,
      |        sum(CAST(y AS HUGEINT) * y) AS qy,
      |        sum(CAST(z AS HUGEINT) * z) AS qz,
      |        sum(CAST(x AS HUGEINT) * y) AS pxy,
      |        sum(CAST(x AS HUGEINT) * z) AS pxz,
      |        sum(CAST(y AS HUGEINT) * z) AS pyz
      |      FROM rows_),
      |r AS (SELECT n,
      |        CASE WHEN CAST(n AS HUGEINT) * qx
      |            - CAST(sx AS HUGEINT) * sx <= 0
      |          OR CAST(n AS HUGEINT) * qy
      |            - CAST(sy AS HUGEINT) * sy <= 0 THEN NULL
      |        ELSE CAST(round(
      |          CAST(CAST(n AS HUGEINT) * pxy
      |            - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |          / (sqrt(CAST(CAST(n AS HUGEINT) * qx
      |              - CAST(sx AS HUGEINT) * sx AS DOUBLE))
      |           * sqrt(CAST(CAST(n AS HUGEINT) * qy
      |              - CAST(sy AS HUGEINT) * sy AS DOUBLE)))
      |          * 1000000.0) AS BIGINT) END AS rxy_e6,
      |        CASE WHEN CAST(n AS HUGEINT) * qx
      |            - CAST(sx AS HUGEINT) * sx <= 0
      |          OR CAST(n AS HUGEINT) * qz
      |            - CAST(sz AS HUGEINT) * sz <= 0 THEN NULL
      |        ELSE CAST(round(
      |          CAST(CAST(n AS HUGEINT) * pxz
      |            - CAST(sx AS HUGEINT) * sz AS DOUBLE)
      |          / (sqrt(CAST(CAST(n AS HUGEINT) * qx
      |              - CAST(sx AS HUGEINT) * sx AS DOUBLE))
      |           * sqrt(CAST(CAST(n AS HUGEINT) * qz
      |              - CAST(sz AS HUGEINT) * sz AS DOUBLE)))
      |          * 1000000.0) AS BIGINT) END AS rxz_e6,
      |        CASE WHEN CAST(n AS HUGEINT) * qy
      |            - CAST(sy AS HUGEINT) * sy <= 0
      |          OR CAST(n AS HUGEINT) * qz
      |            - CAST(sz AS HUGEINT) * sz <= 0 THEN NULL
      |        ELSE CAST(round(
      |          CAST(CAST(n AS HUGEINT) * pyz
      |            - CAST(sy AS HUGEINT) * sz AS DOUBLE)
      |          / (sqrt(CAST(CAST(n AS HUGEINT) * qy
      |              - CAST(sy AS HUGEINT) * sy AS DOUBLE))
      |           * sqrt(CAST(CAST(n AS HUGEINT) * qz
      |              - CAST(sz AS HUGEINT) * sz AS DOUBLE)))
      |          * 1000000.0) AS BIGINT) END AS ryz_e6
      |      FROM a)
      |SELECT 'all' AS g, n, rxy_e6, rxz_e6, ryz_e6,
      |  CASE WHEN rxy_e6 IS NULL OR rxz_e6 IS NULL OR ryz_e6 IS NULL
      |      OR sqrt((1.0 - (CAST(rxz_e6 AS DOUBLE) / 1000000.0)
      |           * (CAST(rxz_e6 AS DOUBLE) / 1000000.0))
      |        * (1.0 - (CAST(ryz_e6 AS DOUBLE) / 1000000.0)
      |           * (CAST(ryz_e6 AS DOUBLE) / 1000000.0))) <= 0.0
      |    THEN NULL
      |  ELSE CAST(round((CAST(rxy_e6 AS DOUBLE) / 1000000.0
      |      - (CAST(rxz_e6 AS DOUBLE) / 1000000.0)
      |        * (CAST(ryz_e6 AS DOUBLE) / 1000000.0))
      |    / sqrt((1.0 - (CAST(rxz_e6 AS DOUBLE) / 1000000.0)
      |         * (CAST(rxz_e6 AS DOUBLE) / 1000000.0))
      |      * (1.0 - (CAST(ryz_e6 AS DOUBLE) / 1000000.0)
      |         * (CAST(ryz_e6 AS DOUBLE) / 1000000.0)))
      |    * 1000000.0) AS BIGINT) END AS pr_e6
      |FROM r""".stripMargin

  /** q362 — isotonic regression ([[graft.ts.Isotonic.pava]]) of each
    * event type's daily revenue: the best monotone-nondecreasing
    * trend under squared loss — calibration-grade trend extraction
    * with no linearity assumption. The oracle replays PAVA through
    * the minimax characterization fit_i = max_{j≤i} min_{l≥i}
    * avg(y[j..l]) (O(n³) interval scan, oracle-side only — the
    * engine is one linear stack pass per series). */
  private def q362(s: SparkSession, dir: String): DataFrame =
    graft.ts.Isotonic.pava(dailyCents(s, dir), "event_type")

  private val q362Sql =
    s"""WITH $dailySql,
      |s AS (SELECT event_type, ds, y,
      |        CAST(row_number() OVER (PARTITION BY event_type
      |          ORDER BY ds) AS BIGINT) AS rn,
      |        CAST(sum(y) OVER (PARTITION BY event_type ORDER BY ds)
      |          AS BIGINT) AS p
      |      FROM daily),
      |iv AS (SELECT a.event_type, a.rn AS j, b.rn AS l,
      |         CAST(b.p - (a.p - a.y) AS DOUBLE) / (b.rn - a.rn + 1)
      |           AS a
      |       FROM s a JOIN s b ON b.event_type = a.event_type
      |                        AND b.rn >= a.rn),
      |mn AS (SELECT iv.event_type, i.rn AS i, iv.j, min(iv.a) AS m
      |       FROM iv JOIN s i ON i.event_type = iv.event_type
      |                       AND iv.j <= i.rn AND iv.l >= i.rn
      |       GROUP BY 1, 2, 3),
      |ft AS (SELECT event_type, i, max(m) AS fit FROM mn
      |       GROUP BY 1, 2)
      |SELECT s.event_type, CAST(epoch(s.ds) AS BIGINT) AS ds_sec,
      |  s.y AS y_c,
      |  CAST(round(ft.fit * 1000000.0) AS BIGINT) AS fit_e6
      |FROM s JOIN ft ON ft.event_type = s.event_type
      |               AND ft.i = s.rn""".stripMargin

  /** q363 — Brunner–Munzel ([[graft.stats.Hypothesis
    * .brunnerMunzel]]) on q226's arms: the rank test that stays
    * honest when the two user cohorts differ in SPREAD, not just
    * location — per-arm placement variances, Welch-type df, the
    * integer u-ledger on the same grouped grid prefix. */
  private def q363(s: SparkSession, dir: String): DataFrame =
    graft.stats.Hypothesis.brunnerMunzel(
      t(s, dir, "events")
        .select(col("event_type"), pmod(col("user_id"), lit(2L)).as("arm"),
                cents(col("value")).as("v")),
      "event_type", "arm", "v")

  private val q363Sql =
    """WITH o AS (SELECT event_type AS grp, user_id % 2 AS arm,
      |            CAST(round(value*100) AS BIGINT) AS v FROM events),
      |g AS (SELECT grp, v,
      |        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS ca,
      |        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |          AS cb,
      |        CAST(count(*) AS BIGINT) AS c
      |      FROM o GROUP BY 1, 2),
      |pre AS (SELECT *, sum(c) OVER w - c AS pc,
      |          sum(ca) OVER w - ca AS pa, sum(cb) OVER w - cb AS pb
      |        FROM g WINDOW w AS (PARTITION BY grp ORDER BY v)),
      |rk AS (SELECT grp, ca, cb, 2*pc + c + 1 AS r2c,
      |         2*pa + ca + 1 AS r2wa, 2*pb + cb + 1 AS r2wb
      |       FROM pre),
      |sm AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n_a,
      |         CAST(sum(cb) AS BIGINT) AS n_b,
      |         sum(CAST(ca AS HUGEINT) * r2c) AS sr2a,
      |         sum(CAST(cb AS HUGEINT) * r2c) AS sr2b
      |       FROM rk GROUP BY 1),
      |u AS (SELECT rk.grp, ca, cb,
      |        CAST(n_a AS HUGEINT) * (r2c - r2wa)
      |          - (sr2a - CAST(n_a AS HUGEINT) * (n_a + 1)) AS ua,
      |        CAST(n_b AS HUGEINT) * (r2c - r2wb)
      |          - (sr2b - CAST(n_b AS HUGEINT) * (n_b + 1)) AS ub
      |      FROM rk JOIN sm ON sm.grp = rk.grp),
      |ag AS (SELECT u.grp, max(n_a) AS n_a, max(n_b) AS n_b,
      |         max(sr2a) AS sr2a, max(sr2b) AS sr2b,
      |         sum(CAST(ca AS HUGEINT) * ua * ua) AS su2a,
      |         sum(CAST(cb AS HUGEINT) * ub * ub) AS su2b
      |       FROM u JOIN sm ON sm.grp = u.grp GROUP BY 1),
      |tv AS (SELECT grp, n_a, n_b,
      |         CAST(su2a AS DOUBLE)
      |           / (4.0 * CAST(n_a AS DOUBLE)
      |              * (CAST(n_a AS DOUBLE) - 1.0)) AS vx,
      |         CAST(su2b AS DOUBLE)
      |           / (4.0 * CAST(n_b AS DOUBLE)
      |              * (CAST(n_b AS DOUBLE) - 1.0)) AS vy,
      |         CAST(n_a AS HUGEINT) * sr2b
      |           - CAST(n_b AS HUGEINT) * sr2a AS num2
      |       FROM ag)
      |SELECT grp AS event_type, n_a, n_b,
      |  CASE WHEN n_a < 2 OR n_b < 2 OR vx + vy <= 0.0 THEN NULL
      |    ELSE CAST(round(CAST(num2 AS DOUBLE)
      |      / (2.0 * (n_a + n_b) * sqrt(vx + vy)) * 1000000.0)
      |      AS BIGINT) END AS w_e6,
      |  CASE WHEN n_a < 2 OR n_b < 2 OR vx + vy <= 0.0 THEN NULL
      |    ELSE CAST(round(((vx + vy) * (vx + vy))
      |      / (vx * vx / (CAST(n_a AS DOUBLE) - 1.0)
      |         + vy * vy / (CAST(n_b AS DOUBLE) - 1.0)) * 1000000.0)
      |      AS BIGINT) END AS df_e6
      |FROM tv""".stripMargin

  /** q364 — Yuen's trimmed t ([[graft.stats.Robust.yuenT]]) on
    * q347's arms (finished vs open order prices per priority): the
    * robust two-sample means test — 10% trimmed means studentized by
    * winsorized variances, so a few extreme prices can't decide the
    * comparison the way they would q305's Welch t. */
  private def q364(s: SparkSession, dir: String): DataFrame =
    graft.stats.Robust.yuenT(
      t(s, dir, "orders")
        .where(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderpriority"),
          when(col("o_orderstatus") === "F", 0L).otherwise(1L).as("arm"),
          round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "arm", "v")

  private val q364Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |            CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS arm,
      |            CAST(round(o_totalprice) AS BIGINT) AS v
      |          FROM orders WHERE o_orderstatus IN ('F', 'O')),
      |g AS (SELECT grp, arm, v, CAST(count(*) AS BIGINT) AS c FROM r
      |      GROUP BY 1, 2, 3),
      |tot AS (SELECT grp, arm, CAST(sum(c) AS BIGINT) AS n FROM g
      |        GROUP BY 1, 2),
      |cum AS (SELECT g.grp, g.arm, v, c, n, n * 1 // 10 AS k,
      |          CAST(sum(c) OVER (PARTITION BY g.grp, g.arm ORDER BY v)
      |            AS BIGINT) AS cc
      |        FROM g JOIN tot ON tot.grp = g.grp AND tot.arm = g.arm),
      |kc AS (SELECT *, greatest(0, least(cc, n - k)
      |         - greatest(cc - c, k)) AS kc
      |       FROM cum),
      |bd AS (SELECT grp, arm,
      |         min(CASE WHEN kc > 0 THEN v END) AS lo,
      |         max(CASE WHEN kc > 0 THEN v END) AS hi
      |       FROM kc GROUP BY 1, 2),
      |pa AS (SELECT kc.grp, kc.arm, max(n) AS n, max(k) AS k,
      |         max(n) - 2 * max(k) AS h,
      |         CAST(sum(CAST(v AS HUGEINT) * kc) * 1000000
      |           // (max(n) - 2 * max(k)) AS BIGINT) AS tm_e6,
      |         CAST(sum(CAST(greatest(lo, least(hi, v)) AS HUGEINT) * c)
      |           AS BIGINT) AS ws,
      |         sum(CAST(greatest(lo, least(hi, v)) AS HUGEINT)
      |           * greatest(lo, least(hi, v)) * c) AS wq
      |       FROM kc JOIN bd ON bd.grp = kc.grp AND bd.arm = kc.arm
      |       GROUP BY 1, 2),
      |wide AS (SELECT a.grp, a.n AS n_a, b.n AS n_b, a.h AS h_a,
      |           b.h AS h_b, a.tm_e6 AS tm_a, b.tm_e6 AS tm_b,
      |           a.ws AS ws_a, a.wq AS wq_a, b.ws AS ws_b,
      |           b.wq AS wq_b
      |         FROM pa a JOIN pa b ON b.grp = a.grp
      |         WHERE a.arm = 0 AND b.arm = 1),
      |dd AS (SELECT *,
      |         (CAST(wq_a AS DOUBLE) - CAST(ws_a AS DOUBLE)
      |            * CAST(ws_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      |           / (CAST(n_a AS DOUBLE) - 1.0)
      |           * (CAST(n_a AS DOUBLE) - 1.0)
      |           / (CAST(h_a AS DOUBLE) * (CAST(h_a AS DOUBLE) - 1.0))
      |           AS da,
      |         (CAST(wq_b AS DOUBLE) - CAST(ws_b AS DOUBLE)
      |            * CAST(ws_b AS DOUBLE) / CAST(n_b AS DOUBLE))
      |           / (CAST(n_b AS DOUBLE) - 1.0)
      |           * (CAST(n_b AS DOUBLE) - 1.0)
      |           / (CAST(h_b AS DOUBLE) * (CAST(h_b AS DOUBLE) - 1.0))
      |           AS db
      |       FROM wide)
      |SELECT grp AS o_orderpriority, n_a, n_b, h_a, h_b,
      |  tm_a AS tm_a_e6, tm_b AS tm_b_e6,
      |  CASE WHEN h_a <= 1 OR h_b <= 1 OR da + db <= 0.0 THEN NULL
      |    ELSE CAST(round(CAST(tm_a - tm_b AS DOUBLE) / 1000000.0
      |      / sqrt(da + db) * 1000000.0) AS BIGINT) END AS t_e6,
      |  CASE WHEN h_a <= 1 OR h_b <= 1 OR da + db <= 0.0 THEN NULL
      |    ELSE CAST(round(((da + db) * (da + db))
      |      / (da * da / (CAST(h_a AS DOUBLE) - 1.0)
      |         + db * db / (CAST(h_b AS DOUBLE) - 1.0)) * 1000000.0)
      |      AS BIGINT) END AS df_e6
      |FROM dd""".stripMargin

  /** q365 — winsorized mean/variance ([[graft.stats.Robust
    * .winsorizedStats]]) of whole-dollar order values per priority:
    * the clamp-don't-delete robust summary completing the triple
    * with q356's MAD and q357's trimmed mean — the same exact
    * tie-block boundary machinery, tails pinned to the kept range. */
  private def q365(s: SparkSession, dir: String): DataFrame =
    graft.stats.Robust.winsorizedStats(
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice")).cast("long").as("v")),
      "o_orderpriority", "v")

  private val q365Sql =
    """WITH r AS (SELECT o_orderpriority AS grp,
      |            CAST(round(o_totalprice) AS BIGINT) AS v FROM orders),
      |g AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM r
      |      GROUP BY 1, 2),
      |tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM g
      |        GROUP BY 1),
      |cum AS (SELECT g.grp, v, c, n, n * 1 // 10 AS k,
      |          CAST(sum(c) OVER (PARTITION BY g.grp ORDER BY v)
      |            AS BIGINT) AS cc
      |        FROM g JOIN tot ON tot.grp = g.grp),
      |kc AS (SELECT *, greatest(0, least(cc, n - k)
      |         - greatest(cc - c, k)) AS kc
      |       FROM cum),
      |bd AS (SELECT grp, min(CASE WHEN kc > 0 THEN v END) AS lo,
      |         max(CASE WHEN kc > 0 THEN v END) AS hi
      |       FROM kc GROUP BY 1),
      |ag AS (SELECT kc.grp, max(n) AS n, max(k) AS k,
      |         max(lo) AS lo, max(hi) AS hi,
      |         CAST(sum(CAST(greatest(lo, least(hi, v)) AS HUGEINT) * c)
      |           AS BIGINT) AS ws,
      |         sum(CAST(greatest(lo, least(hi, v)) AS HUGEINT)
      |           * greatest(lo, least(hi, v)) * c) AS wq
      |       FROM kc JOIN bd ON bd.grp = kc.grp GROUP BY 1)
      |SELECT grp AS o_orderpriority, n, k AS k_wins, lo AS lo_c,
      |  hi AS hi_c,
      |  CAST(CAST(ws AS HUGEINT) * 1000000 // n AS BIGINT)
      |    AS wins_mean_e6,
      |  CASE WHEN n < 2 THEN NULL
      |    ELSE CAST(round((CAST(wq AS DOUBLE)
      |      - CAST(ws AS DOUBLE) * CAST(ws AS DOUBLE)
      |        / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
      |      * 1000000.0) AS BIGINT) END AS wins_var_e6
      |FROM ag""".stripMargin

  /** q366 — Kendall tau distance ([[graft.stats.RankCompare
    * .kendallTauDistance]]) between q358's two top-20 day rankings:
    * of the days BOTH rankings keep, what fraction of pairs do
    * revenue and volume order differently — the unweighted
    * complement to RBO's top-weighted agreement. */
  private def q366(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"), dayBucket(col("ts")).as("ds"))
      .agg(sum(cents(col("value"))).as("y"), count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    val ranked = daily
      .withColumn("posA", row_number().over(
        w.orderBy(col("y").desc, col("ds"))).cast("long"))
      .withColumn("posB", row_number().over(
        w.orderBy(col("cnt").desc, col("ds"))).cast("long"))
    graft.stats.RankCompare.kendallTauDistance(ranked, "event_type",
      "posA", "posB")
  }

  private val q366Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS ds,
      |         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
      |           AS y,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |rk AS (SELECT event_type,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |           ORDER BY y DESC, ds) AS BIGINT) AS pa,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |           ORDER BY cnt DESC, ds) AS BIGINT) AS pb
      |       FROM daily),
      |cm AS (SELECT event_type, pa, pb FROM rk
      |       WHERE pa <= 20 AND pb <= 20),
      |pr AS (SELECT x.event_type,
      |         CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(sum(CASE WHEN x.pb > y.pb THEN 1 ELSE 0 END)
      |           AS BIGINT) AS n_disc
      |       FROM cm x JOIN cm y ON y.event_type = x.event_type
      |                          AND x.pa < y.pa
      |       GROUP BY 1),
      |mm AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_common
      |       FROM cm GROUP BY 1)
      |SELECT rk2.event_type, CAST(20 AS BIGINT) AS depth,
      |  coalesce(mm.n_common, 0) AS n_common,
      |  coalesce(pr.n_disc, 0) AS n_discordant,
      |  CASE WHEN coalesce(mm.n_common, 0) < 2 THEN NULL
      |    ELSE coalesce(pr.n_disc, 0) * 1000000
      |      // (mm.n_common * (mm.n_common - 1) // 2) END
      |    AS tau_dist_e6
      |FROM (SELECT DISTINCT event_type FROM rk) rk2
      |LEFT JOIN mm ON mm.event_type = rk2.event_type
      |LEFT JOIN pr ON pr.event_type = rk2.event_type""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q304_periodogram", q304, Some(q304Sql)),
    QueryDef("q305_welch_t", q305, Some(q305Sql)),
    QueryDef("q311_brown_forsythe", q311, Some(q311Sql)),
    QueryDef("q312_hurst", q312, Some(q312Sql)),
    QueryDef("q313_damped_holt", q313, Some(q313Sql)),
    QueryDef("q301_ar2_forecast", q301, Some(q301Sql)),
    QueryDef("q302_unit_root", q302, Some(q302Sql)),
    QueryDef("q284_growth_ledger", q284, Some(q284Sql)),
    QueryDef("q288_hw_forecast", q288, Some(q288Sql)),
    QueryDef("q289_rate_spikes", q289, Some(q289Sql)),
    QueryDef("q290_nelson_aalen", q290, Some(q290Sql)),
    QueryDef("q291_wasserstein", q291, Some(q291Sql)),
    QueryDef("q293_stl_strengths", q293, Some(q293Sql)),
    QueryDef("q294_log_rank", q294, Some(q294Sql)),
    QueryDef("q285_new_vs_returning", q285, Some(q285Sql)),
    QueryDef("q279_dtw_pairs", q279, Some(q279Sql)),
    QueryDef("q267_holt_winters", q267, Some(q267Sql)),
    QueryDef("q296_hw_seeded", q296, Some(q296Sql)),
    QueryDef("q316_analyze_slice", q316, Some(q316Sql)),
    QueryDef("q317_kruskal_wallis", q317, Some(q317Sql)),
    QueryDef("q318_ljung_box", q318, Some(q318Sql)),
    QueryDef("q322_cochran_armitage", q322, Some(q322Sql)),
    QueryDef("q323_cliffs_delta", q323, Some(q323Sql)),
    QueryDef("q326_friedman", q326, Some(q326Sql)),
    QueryDef("q327_acf_period", q327, Some(q327Sql)),
    QueryDef("q328_theta", q328, Some(q328Sql)),
    QueryDef("q329_page_hinkley", q329, Some(q329Sql)),
    QueryDef("q330_pinball", q330, Some(q330Sql)),
    QueryDef("q331_anderson_darling", q331, Some(q331Sql)),
    QueryDef("q332_sprt", q332, Some(q332Sql)),
    QueryDef("q333_hw_mul", q333, Some(q333Sql)),
    QueryDef("q334_durbin_watson", q334, Some(q334Sql)),
    QueryDef("q335_runs_test", q335, Some(q335Sql)),
    QueryDef("q336_seasonal_mk", q336, Some(q336Sql)),
    QueryDef("q337_jonckheere", q337, Some(q337Sql)),
    QueryDef("q338_ansari_bradley", q338, Some(q338Sql)),
    QueryDef("q341_page_trend", q341, Some(q341Sql)),
    QueryDef("q342_kendall_w", q342, Some(q342Sql)),
    QueryDef("q343_mood_median", q343, Some(q343Sql)),
    QueryDef("q344_wilcoxon_signed_rank", q344, Some(q344Sql)),
    QueryDef("q345_sign_test", q345, Some(q345Sql)),
    QueryDef("q346_bh_fdr", q346, Some(q346Sql)),
    QueryDef("q347_cvm_two_sample", q347, Some(q347Sql)),
    QueryDef("q348_mantel_haenszel", q348, Some(q348Sql)),
    QueryDef("q349_hodges_lehmann", q349, Some(q349Sql)),
    QueryDef("q350_turning_points", q350, Some(q350Sql)),
    QueryDef("q351_bartels_rvn", q351, Some(q351Sql)),
    QueryDef("q352_quade", q352, Some(q352Sql)),
    QueryDef("q353_ewma_chart", q353, Some(q353Sql)),
    QueryDef("q354_grubbs", q354, Some(q354Sql)),
    QueryDef("q355_cox_stuart", q355, Some(q355Sql)),
    QueryDef("q356_mad", q356, Some(q356Sql)),
    QueryDef("q357_trimmed_mean", q357, Some(q357Sql)),
    QueryDef("q358_rbo", q358, Some(q358Sql)),
    QueryDef("q359_theil", q359, Some(q359Sql)),
    QueryDef("q360_cronbach_alpha", q360, Some(q360Sql)),
    QueryDef("q361_partial_corr", q361, Some(q361Sql)),
    QueryDef("q362_isotonic", q362, Some(q362Sql)),
    QueryDef("q363_brunner_munzel", q363, Some(q363Sql)),
    QueryDef("q364_yuen_t", q364, Some(q364Sql)),
    QueryDef("q365_winsorized", q365, Some(q365Sql)),
    QueryDef("q366_tau_distance", q366, Some(q366Sql)),
    QueryDef("q297_mann_kendall", q297, Some(q297Sql)),
    QueryDef("q298_theil_sen", q298, Some(q298Sql)),
    QueryDef("q268_croston", q268, Some(q268Sql)),
    QueryDef("q269_forecast_scorecard", q269, Some(q269Sql)),
    QueryDef("q270_series_features", q270, Some(q270Sql)),
    QueryDef("q278_gram_ols", q278, Some(q278Sql)),
    QueryDef("q263_stl_decompose", q263, Some(q263Sql)),
    QueryDef("q264_inventory_balance", q264, Some(q264Sql)),
    QueryDef("q256_spearman", q256, Some(q256Sql)),
    QueryDef("q257_kendall_tau", q257, Some(q257Sql)),
    QueryDef("q258_anova", q258, Some(q258Sql)),
    QueryDef("q259_cramers_v", q259, Some(q259Sql)),
    QueryDef("q260_holt_smooth", q260, Some(q260Sql)),
    QueryDef("q261_kaplan_meier", q261, Some(q261Sql)),
    QueryDef("q235_chi2_independence", q235, Some(q235Sql)),
    QueryDef("q245_psi_drift", q245, Some(q245Sql)),
    QueryDef("q246_mutual_information", q246, Some(q246Sql)),
    QueryDef("q225_ks_test", q225, Some(q225Sql)),
    QueryDef("q226_mann_whitney", q226, Some(q226Sql)),
    QueryDef("q230_benford_audit", q230, Some(q230Sql)),
    QueryDef("q16_floor_ceiling", q16, Some(q16Sql)),
    QueryDef("q17_detrend_ols", q17, Some(q17Sql)),
    QueryDef("q18_quantiles", q18, Some(q18Sql)),
    QueryDef("q19_moment_stats", q19, Some(q19Sql)),
    QueryDef("q20_acf", q20, Some(q20Sql)),
    QueryDef("q21_pacf", q21, Some(q21Sql))
  )
}
