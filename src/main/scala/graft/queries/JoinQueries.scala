package graft.queries

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function and multi-join queries (SURVEY §2.5-§2.6 + the
  * optimizer-exercising TPC-H-style shapes).
  *
  * Scale posture: dimension tables (region/nation/customer/supplier) are
  * broadcast — no shuffle for the dim side at any SF; the fact-side
  * aggregates use map-side partials. Window queries partition by the
  * series key so rank computation parallelizes per key.
  */
object JoinQueries {

  /** q13 — ranking window: top-3 events per type by value with a
    * deterministic (value desc, event_id) tiebreak. The positional-slice
    * op O2 (`app.py:186`) re-expressed order-safely via `row_number`. */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value_c").desc, col("event_id"))
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"), cents(col("value")).as("value_c"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
  }

  private val q13Sql =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |         CAST(round(value*100) AS BIGINT) AS value_c
      |  FROM events)
      |SELECT event_type, event_id, value_c, rn FROM (
      |  SELECT event_type, event_id, value_c,
      |         CAST(row_number() OVER (PARTITION BY event_type
      |               ORDER BY value_c DESC, event_id) AS INTEGER) AS rn
      |  FROM e) r
      |WHERE rn <= 3""".stripMargin

  /** q14 — TPC-H Q3 shape (shipping priority): 3-way join with filters on
    * all three tables, revenue top-10. Only the true dimension (customer)
    * carries a broadcast hint; lineitem⋈orders is fact⋈fact and is left to
    * AQE, which picks sort-merge/shuffled-hash by runtime size — a forced
    * broadcast of the 2-year orders slice would OOM at 100× SF. */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"),
              cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("rev_c")).as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q14Sql =
    """SELECT l.l_orderkey, o.o_orderdate,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |  AND l.l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue_c DESC, l.l_orderkey
      |LIMIT 10""".stripMargin

  /** q15 — TPC-H Q5 shape (local supplier revenue by nation): 6-way join
    * through region→nation→customer/supplier with the co-nationality
    * predicate. Dims (customer/supplier/nation/region) broadcast;
    * lineitem⋈orders is fact⋈fact and left to AQE — the shuffles are that
    * join and the final per-nation aggregate. */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    val region = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = t(s, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val supp = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
              cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_c"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey") &&
                             col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_c")).as("revenue_c"), count(lit(1)).as("n_items"))
  }

  private val q15Sql =
    """SELECT n.n_name,
      |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
      |  count(*) AS n_items
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n.n_name""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q13_window_topk", q13, Some(q13Sql)),
    QueryDef("q14_tpch_q3_shape", q14, Some(q14Sql)),
    QueryDef("q15_tpch_q5_shape", q15, Some(q15Sql))
  )
}
