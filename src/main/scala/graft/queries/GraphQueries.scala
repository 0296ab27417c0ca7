package graft.queries

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph centrality + dimensional-history operators: PageRank over a
  * co-occurrence graph, SCD Type-2 history build, and the salted
  * skew-join — warehouse-tier machinery the curation pipeline leans
  * on (link-authority quality priors, attribute validity intervals,
  * hot-key joins).
  */
object GraphQueries {

  /** q192 — PageRank ([[graft.graphs.PageRank.pageRank]], 5 power
    * iterations, d = 0.85 on the e6 integer grid) over the part
    * co-purchase graph ([[graft.graphs.PageRank.coOccurrenceEdges]]
    * of order→part membership — basket-sized groups, so the keyed
    * self-join is |basket|²-bounded per order). The oracle unrolls
    * all five iterations as CTEs over the identical integer update
    * rule, so every rank hash-matches bit-for-bit. */
  /** The unthresholded co-occurrence graph shared by q192/q215/q233
    * (one cacheOnce entry, the [[coPurchasePairs]] convention): the
    * walk/traversal queries each localCheckpoint their edge list, and
    * with the cache in place that checkpoint scan reads the
    * materialized pairs instead of re-running the basket self-join. */
  private def coOccurrenceGraph(s: SparkSession, dir: String): DataFrame =
    cacheOnce(graft.graphs.PageRank.coOccurrenceEdges(
      t(s, dir, "lineitem")
        .select(col("l_orderkey").as("g"), col("l_partkey").as("item")),
      "g", "item"))

  private def q192(s: SparkSession, dir: String): DataFrame =
    graft.graphs.PageRank.pageRank(coOccurrenceGraph(s, dir), "src", "dst",
      iters = 5)

  private val q192Sql = {
    val iters = (1 to 5).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
        |         CAST(sum(r${i - 1}.rank_e6 // deg.outdeg) AS BIGINT) AS in_share
        |       FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src
        |              JOIN deg ON deg.node = e.src
        |       GROUP BY 1),
        |r$i AS (SELECT n.node,
        |          CAST(150000 + (85 * COALESCE(c$i.in_share, 0)) // 100
        |               AS BIGINT) AS rank_e6
        |        FROM nodes n LEFT JOIN c$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |e AS (SELECT DISTINCT a.item AS src, b.item AS dst
      |      FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
      |        FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS node FROM e
      |          UNION SELECT DISTINCT dst FROM e),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_e6 FROM nodes),
      |$iters
      |SELECT r5.node, r5.rank_e6, deg.outdeg
      |FROM r5 JOIN deg USING (node)""".stripMargin
  }

  /** q193 — SCD Type-2 history ([[graft.ts.Scd.scd2]]): each
    * customer's order-priority change stream collapsed to
    * effective-dated versions (half-open [valid_from, valid_to),
    * open-ended current row, 1-based version counter). Total order
    * inside a day by o_orderkey. The oracle replays the lag-filter
    * and the lead/row_number window on the identical order. */
  private def q193(s: SparkSession, dir: String): DataFrame =
    graft.ts.Scd.scd2(
      t(s, dir, "orders").select(col("o_custkey"),
        dayBucket(col("o_orderdate")).as("d"),
        col("o_orderpriority"), col("o_orderkey")),
      "o_custkey", "d", "o_orderpriority", "o_orderkey")

  /** The SCD2 build as reusable CTEs (q193 emits it; q204 joins
    * through it). */
  private val scdCtes =
    """o AS (
      |  SELECT o_custkey, CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
      |         o_orderpriority, o_orderkey
      |  FROM orders),
      |marked AS (
      |  SELECT *, lag(o_orderpriority) OVER (PARTITION BY o_custkey
      |            ORDER BY d, o_orderkey) AS prev_attr
      |  FROM o),
      |kept AS (SELECT * FROM marked
      |         WHERE prev_attr IS NULL OR prev_attr <> o_orderpriority),
      |scd AS (
      |  SELECT o_custkey, o_orderpriority, d AS valid_from,
      |         lead(d) OVER w AS valid_to,
      |         CAST(row_number() OVER w AS BIGINT) AS version,
      |         CAST(CASE WHEN lead(d) OVER w IS NULL THEN 1 ELSE 0 END
      |              AS BIGINT) AS is_current
      |  FROM kept
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey))""".stripMargin

  private val q193Sql = s"WITH $scdCtes\nSELECT * FROM scd"

  /** q195 — salted skew join ([[graft.scale.ScaleOps.saltedJoin]]
    * with a deterministic event_id-derived salt): events ⋈ per-type
    * dim on the 5-value (i.e. maximally hot) event_type key, spread
    * 8 ways — each hot key's rows land in 8 tasks instead of 1. The
    * oracle is the PLAIN join + aggregate: salting must be
    * result-invisible, and the hash compare proves it row-exactly. */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("event_id"), col("event_type"), cents(col("value")).as("v"))
    val dim = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_type"))
    graft.scale.ScaleOps.saltedJoin(ev, dim, "event_type", salts = 8,
        saltSrc = Some("event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_c"),
           max(col("n_type")).as("n_type"))
  }

  private val q195Sql =
    """WITH ev AS (SELECT event_id, event_type,
      |              CAST(round(value*100) AS BIGINT) AS v FROM events),
      |dim AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_type
      |        FROM ev GROUP BY 1)
      |SELECT ev.event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(ev.v) AS BIGINT) AS sum_c, max(dim.n_type) AS n_type
      |FROM ev JOIN dim USING (event_type) GROUP BY 1""".stripMargin

  /** q197 — pairwise association rules ([[graft.graphs.Assoc
    * .pairRules]]): support / confidence / lift for part pairs
    * co-purchased in ≥ 2 orders, exact e6-grid statistics with the
    * overflow-safe lift factoring. The oracle recomputes every
    * margin and the identical integer-div expression order. */
  private def q197(s: SparkSession, dir: String): DataFrame =
    graft.graphs.Assoc.pairRules(
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey", minSupport = 2L)

  private val q197Sql =
    """WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |nb AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_baskets FROM m),
      |sup AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item
      |        FROM m GROUP BY 1),
      |pr AS (SELECT a.item AS item_a, b.item AS item_b,
      |              CAST(count(*) AS BIGINT) AS n_ab
      |       FROM m a JOIN m b ON a.g = b.g AND a.item < b.item
      |       GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT pr.item_a, pr.item_b, pr.n_ab,
      |       sa.n_item AS n_a, sb.n_item AS n_b, nb.n_baskets,
      |       pr.n_ab * 1000000 // sa.n_item AS conf_ab_e6,
      |       pr.n_ab * 1000000 // sb.n_item AS conf_ba_e6,
      |       (pr.n_ab * 1000000 // sa.n_item) * nb.n_baskets // sb.n_item
      |         AS lift_e6
      |FROM pr JOIN sup sa ON sa.item = pr.item_a
      |        JOIN sup sb ON sb.item = pr.item_b
      |        CROSS JOIN nb""".stripMargin

  /** q198 — column profiling ([[graft.pipeline.TableProfile
    * .profile]]): per-column row/null/exact-distinct counts over the
    * orders table in long format — the trust-the-drop report. The
    * oracle is the naive per-column UNION ALL. */
  private def q198(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TableProfile.profile(t(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
          "o_orderdate", "o_orderpriority"))

  private val q198Sql =
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority").map { c =>
      s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** q203 — HITS hubs and authorities ([[graft.graphs.Hits.hits]],
    * 2 iterations) over the bipartite supplier → part supply graph
    * (distinct lineitem edges): hub suppliers point at
    * widely-supplied parts, authority parts are supplied by strong
    * hubs. The oracle unrolls both iterations — four half-steps,
    * each a keyed sum + max-normalize — with identical integer
    * arithmetic. */
  private def q203(s: SparkSession, dir: String): DataFrame =
    graft.graphs.Hits.hits(
      t(s, dir, "lineitem").select(col("l_suppkey"), col("l_partkey")),
      "l_suppkey", "l_partkey", iters = 2)

  private val q203Sql = {
    val steps = (1 to 2).map { i =>
      val hp = if (i == 1) "h0" else s"h${i - 1}"
      s"""ar$i AS (SELECT e.dst AS node, CAST(sum($hp.h) AS BIGINT) AS raw
        |        FROM e JOIN $hp ON $hp.node = e.src GROUP BY 1),
        |am$i AS (SELECT max(raw) AS mx FROM ar$i),
        |a$i AS (SELECT node, raw * 1000000 // mx AS a
        |        FROM ar$i CROSS JOIN am$i),
        |hr$i AS (SELECT e.src AS node, CAST(sum(a$i.a) AS BIGINT) AS raw
        |        FROM e JOIN a$i ON a$i.node = e.dst GROUP BY 1),
        |hm$i AS (SELECT max(raw) AS mx FROM hr$i),
        |h$i AS (SELECT node, raw * 1000000 // mx AS h
        |        FROM hr$i CROSS JOIN hm$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (SELECT DISTINCT l_suppkey AS src, l_partkey AS dst
      |           FROM lineitem),
      |h0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS h
      |       FROM e),
      |$steps
      |SELECT 'hub' AS kind, node, h AS score_e6 FROM h2
      |UNION ALL
      |SELECT 'authority' AS kind, node, a AS score_e6 FROM a2""".stripMargin
  }

  /** q204 — point-in-time (SCD2) lookup: every lineitem enriched
    * with the customer's order-priority version ACTIVE AT ITS SHIP
    * DATE — the effective-dated dimension join every Kimball
    * warehouse runs. Plan: a keyed equi-join on the entity key with
    * the half-open interval as residual filter (per-entity version
    * chains are short — the interval predicate never becomes a
    * nested-loop join). Ship ≥ order date ≥ first valid_from, so
    * exactly one version matches per row. */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    val scd = graft.ts.Scd.scd2(
      t(s, dir, "orders").select(col("o_custkey"),
        dayBucket(col("o_orderdate")).as("d"),
        col("o_orderpriority"), col("o_orderkey")),
      "o_custkey", "d", "o_orderpriority", "o_orderkey")
      .select(col("o_custkey").as("ck"),
        col("o_orderpriority").as("active_priority"),
        col("valid_from"), col("valid_to"), col("version"))
    val fact = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        dayBucket(col("l_shipdate")).as("ship_d"))
      .join(t(s, dir, "orders")
              .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
            Seq("l_orderkey"))
    fact.join(scd,
        fact("o_custkey") === scd("ck") &&
        col("ship_d") >= col("valid_from") &&
        (col("valid_to").isNull || col("ship_d") < col("valid_to")))
      .select(col("o_custkey"), col("l_orderkey"), col("l_linenumber"),
        col("ship_d"), col("active_priority"), col("version"))
  }

  private val q204Sql =
    s"""WITH $scdCtes,
      |fact AS (SELECT l.l_orderkey, l.l_linenumber,
      |                CAST(date_trunc('day', l.l_shipdate) AS DATE) AS ship_d,
      |                od.o_custkey
      |         FROM lineitem l JOIN orders od ON od.o_orderkey = l.l_orderkey)
      |SELECT f.o_custkey, f.l_orderkey, f.l_linenumber, f.ship_d,
      |       s.o_orderpriority AS active_priority, s.version
      |FROM fact f JOIN scd s ON s.o_custkey = f.o_custkey
      |  AND f.ship_d >= s.valid_from
      |  AND (s.valid_to IS NULL OR f.ship_d < s.valid_to)""".stripMargin

  /** q209 — join-key skew report ([[graft.scale.SkewReport
    * .keySkew]]): exact key cardinality, hottest-key share, and Gini
    * concentration for the two candidate join keys of the events
    * fact — computed from the count-of-counts grid (≤ √(2n) rows, so
    * the one ungrouped window never sorts anything corpus-sized).
    * The oracle replays the grid, the grouped rank-sum Gini, and the
    * identical double expression per column. */
  private def q209(s: SparkSession, dir: String): DataFrame =
    graft.scale.SkewReport.keySkew(t(s, dir, "events"),
      Seq("user_id", "event_type"))

  private val q209Sql =
    Seq("user_id", "event_type").map { c =>
      s"""SELECT '$c' AS col_name, n_rows, n_keys, max_c,
        |  max_c * 1000000 // n_rows AS top1_share_e6,
        |  CAST(round(1000000.0 * (2.0 * CAST(s AS DOUBLE)
        |       / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
        |       - CAST(n_keys + 1 AS DOUBLE) / CAST(n_keys AS DOUBLE)))
        |    AS BIGINT) AS gini_e6
        |FROM (
        |  SELECT CAST(sum(f) AS BIGINT) AS n_keys,
        |         CAST(sum(cnt * f) AS BIGINT) AS n_rows,
        |         CAST(sum(cnt * (f * fp + f * (f + 1) // 2)) AS BIGINT) AS s,
        |         max(cnt) AS max_c
        |  FROM (
        |    SELECT cnt, f,
        |           COALESCE(sum(f) OVER (ORDER BY cnt
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fp
        |    FROM (SELECT cnt, CAST(count(*) AS BIGINT) AS f
        |          FROM (SELECT CAST($c AS VARCHAR) AS k,
        |                       CAST(count(*) AS BIGINT) AS cnt
        |                FROM events GROUP BY 1)
        |          GROUP BY 1)))""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** q211 — hierarchical revenue shares through the full dimension
    * chain (region ← nation ← customer ← orders): per (region,
    * nation) revenue, its share of the region, and of the grand
    * total. Plan showcase: the three dim tables are BROADCAST (tiny
    * and bounded — the legitimate broadcast case, vs the unbounded
    * vocabularies the repo joins unhinted); the fact aggregates
    * FIRST (map-side partials on o_custkey), so the joins ship
    * customer-count rows, not order-count. Shares derive from exact
    * cents with single-expression integer div. */
  private def q211(s: SparkSession, dir: String): DataFrame = {
    val perCust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
    val joined = perCust
      .join(broadcast(t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))),
        Seq("o_custkey"))
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("c_nationkey"), col("n_name"),
                col("n_regionkey"))), Seq("c_nationkey"))
      .join(broadcast(t(s, dir, "region")
        .select(col("r_regionkey").as("n_regionkey"), col("r_name"))),
        Seq("n_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("rev_c")).as("rev_c"), count(lit(1)).as("n_cust"))
    // (region, nation)-grain frame: both windows run over ≤ |nations|
    // rows — dimension-bounded, never fact-sized
    val wReg = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    joined
      .withColumn("region_rev_c", sum(col("rev_c")).over(wReg))
      .withColumn("total_rev_c", sum(col("rev_c")).over(wAll))
      .select(col("r_name"), col("n_name"), col("rev_c"), col("n_cust"),
        expr("rev_c * 1000000 div region_rev_c").as("share_of_region_e6"),
        expr("rev_c * 1000000 div total_rev_c").as("share_of_total_e6"))
  }

  private val q211Sql =
    """WITH pc AS (SELECT o_custkey,
      |              CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
      |                   AS BIGINT) AS rev_c
      |            FROM orders GROUP BY 1),
      |g AS (SELECT r.r_name, nt.n_name,
      |        CAST(sum(pc.rev_c) AS BIGINT) AS rev_c,
      |        CAST(count(*) AS BIGINT) AS n_cust
      |      FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey
      |              JOIN nation nt ON nt.n_nationkey = c.c_nationkey
      |              JOIN region r ON r.r_regionkey = nt.n_regionkey
      |      GROUP BY 1, 2)
      |SELECT r_name, n_name, rev_c, n_cust,
      |  CAST(rev_c * 1000000 // sum(rev_c) OVER (PARTITION BY r_name)
      |       AS BIGINT) AS share_of_region_e6,
      |  CAST(rev_c * 1000000 // sum(rev_c) OVER () AS BIGINT)
      |    AS share_of_total_e6
      |FROM g""".stripMargin

  /** q212 — anti/semi join reconciliation: customers with orders but
    * ZERO orders above 350k cents (anti join against the
    * qualifying set), counted per market segment next to the segment
    * total — the referential-integrity / audit query shape
    * (LeftAnti plans as a broadcast/hash anti join, no row
    * explosion). */
  private def q212(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    val withOrders = cust.join(
      t(s, dir, "orders").select(col("o_custkey").as("c_custkey")).distinct(),
      Seq("c_custkey"), "left_semi")
    val bigSpenders = t(s, dir, "orders")
      .filter(cents(col("o_totalprice")) > 35000000L)
      .select(col("o_custkey").as("c_custkey")).distinct()
    withOrders.join(bigSpenders, Seq("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_small_spenders"))
      .join(cust.groupBy(col("c_mktsegment"))
              .agg(count(lit(1)).as("n_segment")), Seq("c_mktsegment"))
  }

  private val q212Sql =
    """WITH wo AS (SELECT c_custkey, c_mktsegment FROM customer
      |            WHERE c_custkey IN (SELECT o_custkey FROM orders)),
      |big AS (SELECT DISTINCT o_custkey FROM orders
      |        WHERE CAST(round(o_totalprice*100) AS BIGINT) > 35000000),
      |small AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT)
      |            AS n_small_spenders
      |          FROM wo WHERE c_custkey NOT IN (SELECT o_custkey FROM big)
      |          GROUP BY 1),
      |seg AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_segment
      |        FROM customer GROUP BY 1)
      |SELECT small.c_mktsegment, small.n_small_spenders, seg.n_segment
      |FROM small JOIN seg USING (c_mktsegment)""".stripMargin

  /** q215 — multi-source BFS ([[graft.graphs.PageRank
    * .bfsDistances]], 3 hops): hop distance from every 500th part
    * over the co-purchase graph — the blast-radius query (which
    * items are within k association hops of a recalled SKU). The
    * oracle unrolls the three frontiers with NOT-IN settlement. */
  private def q215(s: SparkSession, dir: String): DataFrame = {
    val seeds = t(s, dir, "lineitem")
      .select(col("l_partkey").as("item")).distinct()
      .filter(col("item") % 500 === 0)
    graft.graphs.PageRank.bfsDistances(coOccurrenceGraph(s, dir),
      "src", "dst", seeds, "item", maxDepth = 3)
  }

  private val q215Sql =
    """WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |e AS (SELECT DISTINCT a.item AS src, b.item AS dst
      |      FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item),
      |d0 AS (SELECT DISTINCT item AS node FROM m WHERE item % 500 = 0),
      |f1 AS (SELECT DISTINCT e.dst AS node FROM e
      |       JOIN d0 ON e.src = d0.node
      |       WHERE e.dst NOT IN (SELECT node FROM d0)),
      |f2 AS (SELECT DISTINCT e.dst AS node FROM e
      |       JOIN f1 ON e.src = f1.node
      |       WHERE e.dst NOT IN (SELECT node FROM d0
      |                           UNION SELECT node FROM f1)),
      |f3 AS (SELECT DISTINCT e.dst AS node FROM e
      |       JOIN f2 ON e.src = f2.node
      |       WHERE e.dst NOT IN (SELECT node FROM d0
      |                           UNION SELECT node FROM f1
      |                           UNION SELECT node FROM f2))
      |SELECT node, CAST(0 AS BIGINT) AS dist FROM d0
      |UNION ALL SELECT node, CAST(1 AS BIGINT) FROM f1
      |UNION ALL SELECT node, CAST(2 AS BIGINT) FROM f2
      |UNION ALL SELECT node, CAST(3 AS BIGINT) FROM f3""".stripMargin

  /** Support-thresholded co-purchase pair frame (src, dst, cc ≥ 2) —
    * the shared graph of q219/q223/q227/q229/q241, built ONCE per
    * session through [[graft.queries.cacheOnce]]: the five queries'
    * identical construction canonicalizes to one CacheManager entry,
    * so the basket self-join + pair count is paid once, not once per
    * query (the q56/q57/q66 memoized-pair-frame convention). */
  private def coPurchasePairs(s: SparkSession, dir: String): DataFrame =
    cacheOnce {
      val m = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("g"), col("l_partkey").as("item"))
        .distinct()
      m.groupBy(col("g")).agg(collect_set(col("item")).as("items"))
        .select(explode(col("items")).as("src"), col("items"))
        .select(col("src"), explode(col("items")).as("dst"))
        .filter(col("src") =!= col("dst"))
        .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cc"))
        .filter(col("cc") >= 2)
    }

  /** q219 — triangle census ([[graft.graphs.Triangles
    * .nodeTriangles]]) of the SUPPORT-THRESHOLDED co-purchase graph
    * (pairs co-ordered ≥ 2 times — the support cut that separates
    * signal edges from one-off basket noise): per-node triangle
    * count and local clustering coefficient via degree orientation.
    * The oracle replays thresholding, (deg, id) orientation, the
    * wedge join, and closure. */
  private def q219(s: SparkSession, dir: String): DataFrame = {
    graft.graphs.Triangles.nodeTriangles(coPurchasePairs(s, dir), "src", "dst")
  }

  private val q219Sql =
    """WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |e0 AS (SELECT a.item AS src, b.item AS dst, count(*) AS cc
      |       FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item
      |       GROUP BY 1, 2),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM e0 WHERE cc >= 2),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      |        FROM (SELECT a AS node FROM und
      |              UNION ALL SELECT b AS node FROM und)
      |        GROUP BY 1),
      |o AS (SELECT CASE WHEN (x.deg, u.a) < (y.deg, u.b) THEN u.a ELSE u.b END AS u,
      |             CASE WHEN (x.deg, u.a) < (y.deg, u.b) THEN u.b ELSE u.a END AS v,
      |             CASE WHEN (x.deg, u.a) < (y.deg, u.b) THEN y.deg ELSE x.deg END AS dv
      |      FROM und u JOIN deg x ON x.node = u.a JOIN deg y ON y.node = u.b),
      |tri AS (SELECT w1.u, w1.v, w2.v AS w
      |        FROM o w1 JOIN o w2
      |          ON w1.u = w2.u AND (w1.dv, w1.v) < (w2.dv, w2.v)
      |        JOIN o e ON e.u = w1.v AND e.v = w2.v),
      |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
      |       FROM (SELECT u AS node FROM tri
      |             UNION ALL SELECT v AS node FROM tri
      |             UNION ALL SELECT w AS node FROM tri)
      |       GROUP BY 1)
      |SELECT deg.node, deg.deg, COALESCE(pn.n_tri, 0) AS n_tri,
      |       2 * COALESCE(pn.n_tri, 0) * 1000000 // (deg.deg * (deg.deg - 1))
      |         AS lcc_e6
      |FROM deg LEFT JOIN pn USING (node)
      |WHERE deg.deg >= 2""".stripMargin

  /** q223 — k-core peeling ([[graft.graphs.KCore.kCore]], k = 3,
    * 4 fixed rounds) of the support-thresholded co-purchase graph
    * (q219's edge cut): every node labeled with the round it was
    * peeled in, its degree at deletion time, and the core flag — the
    * density backbone extraction. The oracle unrolls all four
    * deletion rounds (degree-among-survivors → threshold →
    * edge restriction) as CTEs. */
  private def q223(s: SparkSession, dir: String): DataFrame =
    graft.graphs.KCore.kCore(coPurchasePairs(s, dir), "src", "dst",
      k = 3, peels = 4)

  private val q223Sql = {
    val k = 3
    val peels = 4
    val rounds = (1 to peels).map { i =>
      val ed = s"ed${i - 1}"
      val extra = if (i == 1) "" else
        s"""s${i - 1} AS (SELECT node FROM d${i - 1} WHERE deg >= $k),
          |ed${i - 1} AS (SELECT u, v FROM ed${i - 2}
          |        WHERE u IN (SELECT node FROM s${i - 1})
          |          AND v IN (SELECT node FROM s${i - 1})),
          |""".stripMargin
      s"""${extra}d$i AS (SELECT n.node, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS deg
        |      FROM (SELECT ${if (i == 1) "node FROM n0"
                             else s"node FROM s${i - 1}"}) n
        |      LEFT JOIN (SELECT u AS node, CAST(count(*) AS BIGINT) AS cnt
        |                 FROM $ed GROUP BY 1) c USING (node))""".stripMargin
    }.mkString(",\n")
    val outs = (1 to peels).map { i =>
      s"""SELECT node, CAST($i AS BIGINT) AS round_out, deg AS last_deg,
        |       CAST(0 AS BIGINT) AS in_core FROM d$i WHERE deg < $k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |e0 AS (SELECT a.item AS src, b.item AS dst, count(*) AS cc
      |       FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item
      |       GROUP BY 1, 2),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM e0 WHERE cc >= 2),
      |ed0 AS (SELECT a AS u, b AS v FROM und
      |        UNION ALL SELECT b AS u, a AS v FROM und),
      |n0 AS (SELECT DISTINCT u AS node FROM ed0),
      |$rounds,
      |s$peels AS (SELECT node FROM d$peels WHERE deg >= $k),
      |ed$peels AS (SELECT u, v FROM ed${peels - 1}
      |        WHERE u IN (SELECT node FROM s$peels)
      |          AND v IN (SELECT node FROM s$peels)),
      |dfin AS (SELECT n.node, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS deg
      |      FROM s$peels n
      |      LEFT JOIN (SELECT u AS node, CAST(count(*) AS BIGINT) AS cnt
      |                 FROM ed$peels GROUP BY 1) c USING (node))
      |$outs
      |UNION ALL
      |SELECT node, CAST(${peels + 1} AS BIGINT) AS round_out, deg AS last_deg,
      |       CAST(1 AS BIGINT) AS in_core FROM dfin""".stripMargin
  }

  /** q227 — Newman modularity of the brand partition
    * ([[graft.graphs.Modularity.modularityByCommunity]]) over the
    * support-thresholded co-purchase graph: does p_brand behave as a
    * community structure (edges concentrate within brands), or is
    * co-purchase brand-agnostic? Per-brand contributions ride the
    * exact common-denominator form q_num = 4·m·e_c − d_c², so only
    * the final ratio is a rounded double. The scoring half of
    * community detection — attribute partitions, LPA labels, and
    * dedup clusters all score through the same operator. */
  private def q227(s: SparkSession, dir: String): DataFrame = {
    val comm = t(s, dir, "part")
      .select(col("p_partkey").as("node"), col("p_brand").as("brand"))
    graft.graphs.Modularity.modularityByCommunity(
      coPurchasePairs(s, dir), "src", "dst", comm, "node", "brand")
  }

  private val q227Sql =
    """WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |e0 AS (SELECT a.item AS src, b.item AS dst, count(*) AS cc
      |       FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item
      |       GROUP BY 1, 2),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM e0 WHERE cc >= 2),
      |j AS (SELECT a, b, pa.p_brand AS ca, pb.p_brand AS cb
      |      FROM und JOIN part pa ON pa.p_partkey = a
      |                JOIN part pb ON pb.p_partkey = b),
      |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM j),
      |deg AS (SELECT node, c, CAST(count(*) AS BIGINT) AS deg
      |        FROM (SELECT a AS node, ca AS c FROM j
      |              UNION ALL SELECT b AS node, cb AS c FROM j) u
      |        GROUP BY 1, 2),
      |dc AS (SELECT c, CAST(count(*) AS BIGINT) AS n_nodes,
      |              CAST(sum(deg) AS BIGINT) AS d_c FROM deg GROUP BY 1),
      |ec AS (SELECT ca AS c, CAST(count(*) AS BIGINT) AS e_c
      |       FROM j WHERE ca = cb GROUP BY 1)
      |SELECT dc.c AS brand, n_nodes, d_c,
      |  CAST(coalesce(e_c, 0) AS BIGINT) AS e_c,
      |  4*m*CAST(coalesce(e_c, 0) AS BIGINT) - d_c*d_c AS q_num,
      |  CAST(round(CAST(4*m*CAST(coalesce(e_c, 0) AS BIGINT) - d_c*d_c
      |    AS DOUBLE) / (4.0 * m * m) * 1000000.0) AS BIGINT) AS q_e6
      |FROM dc LEFT JOIN ec ON ec.c = dc.c CROSS JOIN mm""".stripMargin

  /** q229 — item-item cosine similarity top-k (the neighborhood model
    * of item-based collaborative filtering): cos(i,j) =
    * |baskets(i)∩baskets(j)| / √(|baskets(i)|·|baskets(j)|) over
    * co-purchase counts, top-5 neighbors per item ranked on the
    * e6-rounded score (integer-deterministic ranking — the double
    * never orders anything) with item-id ties. Support threshold
    * cc ≥ 2 bounds the candidate pairs exactly as q219/q223; the
    * top-k window is keyed per source item and candidate-list sized. */
  private def q229(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("g"), col("l_partkey").as("item"))
      .distinct()
    val ni = m.groupBy(col("item")).agg(count(lit(1)).as("ni"))
    val scored = coPurchasePairs(s, dir)
      .join(ni.select(col("item").as("src"), col("ni").as("n_src")), Seq("src"))
      .join(ni.select(col("item").as("dst"), col("ni").as("n_dst")), Seq("dst"))
      .withColumn("cos_e6",
        round(col("cc").cast("double")
          / sqrt((col("n_src") * col("n_dst")).cast("double"))
          * 1000000.0).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("cos_e6").desc, col("dst"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5L)
      .select(col("src"), col("dst"), col("cc"), col("cos_e6"), col("rk"))
  }

  private val q229Sql =
    """WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |ni AS (SELECT item, CAST(count(*) AS BIGINT) AS ni FROM m GROUP BY 1),
      |p AS (SELECT a.item AS src, b.item AS dst,
      |        CAST(count(*) AS BIGINT) AS cc
      |      FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item
      |      GROUP BY 1, 2),
      |s AS (SELECT src, dst, cc,
      |        CAST(round(CAST(cc AS DOUBLE)
      |          / sqrt(CAST(ns.ni * nd.ni AS DOUBLE)) * 1000000.0)
      |          AS BIGINT) AS cos_e6
      |      FROM p JOIN ni ns ON ns.item = src JOIN ni nd ON nd.item = dst
      |      WHERE cc >= 2),
      |r AS (SELECT src, dst, cc, cos_e6,
      |        CAST(row_number() OVER (PARTITION BY src
      |          ORDER BY cos_e6 DESC, dst) AS BIGINT) AS rk
      |      FROM s)
      |SELECT src, dst, cc, cos_e6, rk FROM r WHERE rk <= 5""".stripMargin

  /** q233 — personalized PageRank
    * ([[graft.graphs.PageRank.personalizedPageRank]], 3 iterations):
    * relevance of every part to the Brand#11 seed set over the q192
    * co-purchase graph — the "similar items" / seed-expansion walk.
    * Restart mass 1e6 div |seeds∩graph| concentrates on seeds; the
    * oracle unrolls all three iterations over the identical integer
    * update rule (15%·restart + 85%·in-shares, div truncation
    * included). */
  private def q233(s: SparkSession, dir: String): DataFrame = {
    val seeds = t(s, dir, "part")
      .filter(col("p_brand") === "Brand#11")
      .select(col("p_partkey").as("node"))
    graft.graphs.PageRank.personalizedPageRank(
      coOccurrenceGraph(s, dir), "src", "dst", seeds, "node", iters = 3)
  }

  private val q233Sql = {
    val iters = (1 to 3).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
        |         CAST(sum(r${i - 1}.rank_e6 // deg.outdeg) AS BIGINT)
        |           AS in_share
        |       FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src
        |              JOIN deg ON deg.node = e.src
        |       GROUP BY 1),
        |r$i AS (SELECT rs.node,
        |          CAST((15 * restart_e6) // 100
        |               + (85 * COALESCE(c$i.in_share, 0)) // 100
        |               AS BIGINT) AS rank_e6
        |        FROM rs LEFT JOIN c$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |e AS (SELECT DISTINCT a.item AS src, b.item AS dst
      |      FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
      |        FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS node FROM e
      |          UNION SELECT DISTINCT dst FROM e),
      |sd AS (SELECT DISTINCT p_partkey AS node FROM part
      |       WHERE p_brand = 'Brand#11'),
      |sg AS (SELECT s.node FROM sd s JOIN nodes n ON n.node = s.node),
      |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_seeds FROM sg),
      |rs AS (SELECT n.node,
      |         CAST(CASE WHEN sg.node IS NOT NULL THEN 1000000 // n_seeds
      |              ELSE 0 END AS BIGINT) AS restart_e6
      |       FROM nodes n LEFT JOIN sg ON sg.node = n.node CROSS JOIN ns),
      |r0 AS (SELECT node, restart_e6 AS rank_e6 FROM rs),
      |$iters
      |SELECT node, rank_e6 FROM r3""".stripMargin
  }

  /** q241 — connected components
    * ([[graft.graphs.Components.connectedComponents]], 4 min-label
    * rounds) of the support-thresholded co-purchase graph (q219's
    * cc ≥ 2 cut): every part labeled with the smallest part id
    * reachable within 4 label-hops — the standalone graph-tier twin
    * of the dedup tier's union-find clustering. The oracle unrolls
    * every propagation round (union with neighbor labels → keyed
    * min) as CTEs. */
  private def q241(s: SparkSession, dir: String): DataFrame =
    graft.graphs.Components.connectedComponents(coPurchasePairs(s, dir),
      "src", "dst", rounds = 4)

  private val q241Sql = {
    val rounds = (1 to 4).map { i =>
      s"""l$i AS (SELECT node, CAST(min(component) AS BIGINT) AS component
        |       FROM (SELECT node, component FROM l${i - 1}
        |             UNION ALL
        |             SELECT ed.v AS node, l${i - 1}.component
        |             FROM ed JOIN l${i - 1} ON l${i - 1}.node = ed.u) u$i
        |       GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |           FROM lineitem),
      |e0 AS (SELECT a.item AS src, b.item AS dst, count(*) AS cc
      |       FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item
      |       GROUP BY 1, 2),
      |ek AS (SELECT src, dst FROM e0 WHERE cc >= 2),
      |ed AS (SELECT DISTINCT u, v FROM (
      |         SELECT src AS u, dst AS v FROM ek
      |         UNION ALL SELECT dst AS u, src AS v FROM ek) b),
      |l0 AS (SELECT DISTINCT u AS node, u AS component FROM ed),
      |$rounds
      |SELECT node, component FROM l4""".stripMargin
  }

  /** Shared SQL prelude for the support-thresholded co-purchase graph:
    * edge cut (cc ≥ 2), undirected canonical pairs, both-ways
    * directed rows, node set — the q219/q223 construction factored
    * once for the r13 queries. */
  private val coGraphCte =
    """m AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
      |      FROM lineitem),
      |e0 AS (SELECT a.item AS src, b.item AS dst, count(*) AS cc
      |       FROM m a JOIN m b ON a.g = b.g AND a.item <> b.item
      |       GROUP BY 1, 2),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM e0 WHERE cc >= 2),
      |ed AS (SELECT a AS u, b AS v FROM und
      |       UNION ALL SELECT b AS u, a AS v FROM und),
      |n0 AS (SELECT DISTINCT u AS node FROM ed)""".stripMargin

  /** q253 — synchronous label propagation
    * ([[graft.graphs.LabelProp.labelPropagation]], 4 rounds,
    * (count DESC, label ASC) argmax) over the support-thresholded
    * co-purchase graph — the partition [[graft.graphs.Modularity]]
    * scores (q227 scores the BRAND partition; this LEARNS one from
    * structure alone). The oracle unrolls all four synchronous rounds
    * as CTEs with a window-rank argmax. */
  private def q253(s: SparkSession, dir: String): DataFrame =
    graft.graphs.LabelProp.labelPropagation(
      coPurchasePairs(s, dir), "src", "dst", rounds = 4)

  private val q253Sql = {
    val rounds = (1 to 4).map { i =>
      s"""v$i AS (SELECT ed.v AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
        |      FROM ed JOIN lab${i - 1} l ON l.node = ed.u GROUP BY 1, 2),
        |p$i AS (SELECT node, label FROM (
        |        SELECT node, label,
        |               row_number() OVER (PARTITION BY node
        |                                  ORDER BY cnt DESC, label ASC) AS rk
        |        FROM v$i) WHERE rk = 1),
        |lab$i AS (SELECT n0.node,
        |            COALESCE(p$i.label, CAST(n0.node AS BIGINT)) AS label
        |          FROM n0 LEFT JOIN p$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH $coGraphCte,
      |lab0 AS (SELECT node, CAST(node AS BIGINT) AS label FROM n0),
      |$rounds
      |SELECT node, label FROM lab4""".stripMargin
  }

  /** q254 — resource-allocation link prediction
    * ([[graft.graphs.LinkPredict.resourceAllocation]], cn ≥ 2) on the
    * co-purchase graph: which part pairs SHOULD co-sell given their
    * shared neighborhoods but never did — the candidate list a
    * recommender ranks. RA weights are exact integer divisions, so
    * the oracle replays the wedge join bit-for-bit. */
  private def q254(s: SparkSession, dir: String): DataFrame =
    graft.graphs.LinkPredict.resourceAllocation(
      coPurchasePairs(s, dir), "src", "dst", minCommon = 2)

  private val q254Sql =
    s"""WITH $coGraphCte,
      |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
      |        FROM ed GROUP BY 1),
      |wz AS (SELECT ed.u AS z, ed.v AS n, deg.deg AS deg_z
      |       FROM ed JOIN deg ON deg.node = ed.u),
      |pairs AS (SELECT a.n AS pu, b.n AS pv,
      |            CAST(count(*) AS BIGINT) AS cn,
      |            CAST(sum(1000000 // a.deg_z) AS BIGINT) AS ra_e6
      |          FROM wz a JOIN wz b ON a.z = b.z AND a.n < b.n
      |          GROUP BY 1, 2
      |          HAVING count(*) >= 2),
      |open AS (SELECT * FROM pairs
      |         WHERE NOT EXISTS (SELECT 1 FROM und
      |                           WHERE und.a = pairs.pu AND und.b = pairs.pv))
      |SELECT pu AS u, pv AS v, cn, ra_e6,
      |       du.deg AS deg_u, dv.deg AS deg_v,
      |       cn * 1000000 // (du.deg + dv.deg - cn) AS jaccard_e6
      |FROM open JOIN deg du ON du.node = open.pu
      |          JOIN deg dv ON dv.node = open.pv""".stripMargin

  /** q255 — degree assortativity
    * ([[graft.graphs.LinkPredict.degreeAssortativity]]) of the
    * co-purchase graph: one number — do popular parts co-sell with
    * popular parts? Moment sums exact longs; the Pearson ratio is one
    * fixed double expression both engines evaluate identically. */
  private def q255(s: SparkSession, dir: String): DataFrame =
    graft.graphs.LinkPredict.degreeAssortativity(
      coPurchasePairs(s, dir), "src", "dst")

  private val q255Sql =
    s"""WITH $coGraphCte,
      |deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
      |        FROM ed GROUP BY 1),
      |j AS (SELECT du.deg AS du, dv.deg AS dv
      |      FROM ed JOIN deg du ON du.node = ed.u
      |              JOIN deg dv ON dv.node = ed.v),
      |s AS (SELECT CAST(count(*) AS BIGINT) AS m2,
      |        CAST(sum(du) AS BIGINT) AS s_u, CAST(sum(dv) AS BIGINT) AS s_v,
      |        CAST(sum(du * dv) AS BIGINT) AS s_uv,
      |        CAST(sum(du * du) AS BIGINT) AS s_uu,
      |        CAST(sum(dv * dv) AS BIGINT) AS s_vv
      |      FROM j)
      |SELECT m2,
      |  round((CAST(m2 AS DOUBLE) * CAST(s_uv AS DOUBLE)
      |         - CAST(s_u AS DOUBLE) * CAST(s_v AS DOUBLE)) /
      |        (sqrt(CAST(m2 AS DOUBLE) * CAST(s_uu AS DOUBLE)
      |              - CAST(s_u AS DOUBLE) * CAST(s_u AS DOUBLE)) *
      |         sqrt(CAST(m2 AS DOUBLE) * CAST(s_vv AS DOUBLE)
      |              - CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE))), 6)
      |    AS assortativity
      |FROM s""".stripMargin

  /** q283 — TextRank keywords: [[graft.graphs.PageRank.pageRank]]
    * (5 iterations, e6 grid) over the word ADJACENCY graph — non-stop
    * tokens adjacent in a document become undirected edges (stopwords
    * removed before pairing, so content words bridge across them —
    * the standard TextRank construction), top 20 words by rank. The
    * oracle reuses q192's unrolled integer update rule on the word
    * graph. */
  private def q283(s: SparkSession, dir: String): DataFrame = {
    val stop = graft.pipeline.TextAnalysis.stopwordsEn
    val toks = t(s, dir, "documents")
      .select(col("doc_id").as("id"),
              posexplode(split(trim(col("text")), " ")).as(Seq("p", "w")))
      .filter(col("w") =!= "" && !col("w").isin(stop: _*))
    // re-rank positions AFTER the stopword cut so adjacency bridges
    // removed words; keyed by doc
    val seq0 = toks.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("id")).orderBy(col("p"))))
    val fwd = seq0.select(col("id"), col("r"), col("w"))
      .join(seq0.select(col("id"), (col("r") - 1).as("r"),
                        col("w").as("w2")), Seq("id", "r"))
      .filter(col("w") =!= col("w2"))
      .select(col("w").as("src"), col("w2").as("dst"))
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val pr = graft.graphs.PageRank.pageRank(edges, "src", "dst", iters = 5)
    pr.orderBy(col("rank_e6").desc, col("node")).limit(20)
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rank_e6").desc, col("node"))).cast("long"))
  }

  private val q283Sql = {
    val iters = (1 to 5).map { i =>
      s"""c$i AS (SELECT e.dst AS node,
        |         CAST(sum(r${i - 1}.rank_e6 // deg.outdeg) AS BIGINT) AS in_share
        |       FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src
        |              JOIN deg ON deg.node = e.src
        |       GROUP BY 1),
        |r$i AS (SELECT n.node,
        |          CAST(150000 + (85 * COALESCE(c$i.in_share, 0)) // 100
        |               AS BIGINT) AS rank_e6
        |        FROM nodes n LEFT JOIN c$i USING (node))""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
      |  SELECT doc_id AS id, p - 1 AS p, l[p] AS w
      |  FROM (SELECT doc_id, string_split(trim(text), ' ') AS l
      |        FROM documents) t,
      |       LATERAL (SELECT unnest(generate_series(1, len(l))) AS p)
      |  WHERE l[p] <> ''
      |    AND l[p] NOT IN ('the', 'a', 'and', 'of', 'is')),
      |sq AS (SELECT id, w,
      |         row_number() OVER (PARTITION BY id ORDER BY p) AS r
      |       FROM toks),
      |fwd AS (SELECT a.w AS src, b.w AS dst
      |        FROM sq a JOIN sq b ON a.id = b.id AND b.r = a.r + 1
      |        WHERE a.w <> b.w),
      |e AS (SELECT DISTINCT src, dst FROM (
      |        SELECT src, dst FROM fwd
      |        UNION ALL SELECT dst, src FROM fwd) u),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outdeg
      |        FROM e GROUP BY 1),
      |nodes AS (SELECT DISTINCT src AS node FROM e
      |          UNION SELECT DISTINCT dst FROM e),
      |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_e6 FROM nodes),
      |$iters,
      |top AS (SELECT r5.node, r5.rank_e6, deg.outdeg
      |        FROM r5 JOIN deg USING (node)
      |        ORDER BY r5.rank_e6 DESC, r5.node LIMIT 20)
      |SELECT node, rank_e6, outdeg,
      |  CAST(row_number() OVER (ORDER BY rank_e6 DESC, node) AS BIGINT)
      |    AS pos
      |FROM top""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q283_textrank", q283, Some(q283Sql)),
    QueryDef("q253_label_propagation", q253, Some(q253Sql)),
    QueryDef("q254_link_prediction", q254, Some(q254Sql)),
    QueryDef("q255_assortativity", q255, Some(q255Sql)),
    QueryDef("q223_kcore", q223, Some(q223Sql)),
    QueryDef("q227_modularity", q227, Some(q227Sql)),
    QueryDef("q229_item_cosine_topk", q229, Some(q229Sql)),
    QueryDef("q233_ppr", q233, Some(q233Sql)),
    QueryDef("q241_connected_components", q241, Some(q241Sql)),
    QueryDef("q219_triangles", q219, Some(q219Sql)),
    QueryDef("q211_geo_rollup", q211, Some(q211Sql)),
    QueryDef("q212_anti_join", q212, Some(q212Sql)),
    QueryDef("q192_pagerank", q192, Some(q192Sql)),
    QueryDef("q197_assoc_rules", q197, Some(q197Sql)),
    QueryDef("q198_profile", q198, Some(q198Sql)),
    QueryDef("q203_hits", q203, Some(q203Sql)),
    QueryDef("q204_scd2_lookup", q204, Some(q204Sql)),
    QueryDef("q209_skew_report", q209, Some(q209Sql)),
    QueryDef("q215_bfs_distance", q215, Some(q215Sql)),
    QueryDef("q193_scd2_history", q193, Some(q193Sql)),
    QueryDef("q195_salted_join", q195, Some(q195Sql))
  )
}
