package graft.queries

import graft.QueryDef
import graft.pipeline.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (Array[Float] → double).
  * Cosines are rounded to 4 decimals BEFORE ranking in both engines so
  * rank order is independent of last-ulp summation differences. */
object EmbeddingQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  /** Oracle dot product: same sequential fold as the Spark side. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, 64), i -> $a[i] * $b[i]))"

  private def cosSql(av: String, bv: String): String =
    s"round(${dotSql(av, bv)} / (sqrt(${dotSql(av, av)}) * sqrt(${dotSql(bv, bv)})), 4)"

  /** q59 — exact brute-force cosine top-5 for query vectors 0-4. */
  private def q59(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineTopK(emb(s, dir), col("vec_id") < 5, 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
              col("rn").cast("long").as("rn"))

  private val q59Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |pairs AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         ${cosSql("a.v", "b.v")} AS cos
      |  FROM e a JOIN e b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT query_id, neighbor_id, cos, rn FROM ranked WHERE rn <= 5""".stripMargin

  /** q60 — LSH-bucketed approximate NN with Hamming-1 multi-probe: 6
    * sign-hyperplanes (the first 6 corpus vectors as normals) → 64
    * buckets; each query probes its home bucket plus the 6 one-bit-flip
    * neighbors (the sign-LSH nprobe) → per-query top-3. `bucket` is the
    * matched (neighbor's home) bucket. */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val planes = e.filter(col("vec_id") < 6).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    Similarity.lshBucketTopK(e, planes, 3, multiProbe = true)
      .select(col("query_id"), col("neighbor_id"),
              col("bucket").cast("long").as("bucket"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  private val q60Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 6),
      |bk AS (
      |  SELECT e.vec_id, e.v,
      |         CAST(sum(CASE WHEN ${dotSql("e.v", "p.pv")} > 0
      |                       THEN (CAST(1 AS BIGINT) << pid) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM e CROSS JOIN p GROUP BY e.vec_id, e.v),
      |probed AS (
      |  SELECT vec_id, v, bucket AS pbucket FROM bk
      |  UNION ALL
      |  SELECT bk.vec_id, bk.v,
      |         xor(bk.bucket, CAST(1 AS BIGINT) << p.pid) AS pbucket
      |  FROM bk CROSS JOIN p),
      |pairs AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         a.pbucket AS bucket, ${cosSql("a.v", "b.v")} AS cos
      |  FROM probed a JOIN bk b ON a.pbucket = b.bucket AND b.vec_id <> a.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, bucket, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT query_id, neighbor_id, bucket, cos, rn FROM ranked WHERE rn <= 3""".stripMargin

  /** q64 — embedding-cosine near-dup pairs: LSH candidates confirmed by
    * cosine ≥ 0.25 (unordered pairs — the dedup decision input). */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val planes = e.filter(col("vec_id") < 6).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    Similarity.nearDupPairs(e, planes, 0.25)
  }

  private val q64Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 6),
      |bk AS (
      |  SELECT e.vec_id, e.v,
      |         CAST(sum(CASE WHEN ${dotSql("e.v", "p.pv")} > 0
      |                       THEN (CAST(1 AS BIGINT) << pid) ELSE 0 END) AS BIGINT) AS bucket
      |  FROM e CROSS JOIN p GROUP BY e.vec_id, e.v)
      |SELECT a.vec_id AS da, b.vec_id AS db, ${cosSql("a.v", "b.v")} AS cos
      |FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      |WHERE ${cosSql("a.v", "b.v")} >= 0.25""".stripMargin

  /** q65 — IVF-style ANN: 32-cell coarse quantizer (the first 32
    * corpus vectors as deterministic centroids), nprobe=2, per-query
    * top-3. The data-adaptive counterpart of q60's LSH buckets; cell
    * count and nprobe are the recall/cost knobs (like LSH plane count) —
    * candidate list length scales as nprobe·n/cells. `cell` in the
    * output is the MATCHED cell: the neighbor's home cell, which is one
    * of the query's two probed cells. */
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.ivfTopK(e, cents, 3, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  /** The q65 flat-IVF statement at arbitrary k (q171's approx side
    * reuses it at k = 5). */
  private def ivfFlatSql(k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 32),
      |scored AS (
      |  SELECT e.vec_id, e.v, p.pid, ${cosSql("e.v", "p.pv")} AS cs
      |  FROM e CROSS JOIN p),
      |probed AS (
      |  SELECT vec_id, v, pid AS cell, arn FROM (
      |    SELECT vec_id, v, pid,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, pid) AS arn
      |    FROM scored) x WHERE arn <= 2),
      |pairs AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.cell,
      |         ${cosSql("a.v", "b.v")} AS cos
      |  FROM probed a JOIN probed b
      |    ON a.cell = b.cell AND b.arn = 1 AND b.vec_id <> a.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cell, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT query_id, neighbor_id, cell, cos, rn FROM ranked WHERE rn <= $k""".stripMargin

  private val q65Sql = ivfFlatSql(3)

  /** Full-precision cosine with buildCoarseIndex's guard — the Lloyd
    * rounds compare UNROUNDED cosines (only the descent rounds to 4). */
  private def cosFullSql(a: String, b: String): String =
    s"${dotSql(a, b)} / greatest(sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}), 1e-300)"

  /** q70 — hierarchical IVF ANN: q65's 32 fine centroids descended
    * through the TWO-LEVEL quantizer (coarseProbe = 2, nprobe = 2) —
    * the configuration `ivfCellCount(hierarchical = true)` prescribes at
    * scale, so the 100 TB path itself sits under the hash oracle. The
    * oracle replays the entire construction in SQL: buildCoarseIndex's
    * five unrolled Lloyd rounds over the fine centroids (coarseK =
    * ceil(√32) = 6, init centers = fine centroids 0/5/10/16/21/26,
    * full-precision cosine with ties to the lower group, member-order
    * mean sums, empty groups keeping their center, centers updated
    * AFTER the final assignment), then the native ivf_assign descent
    * (round-4 cosine; best 2 groups by cos desc/group asc; best 2 fine
    * cells among their members by cos desc/cid asc), then the
    * matched-home-cell join and per-query ranking. */
  private def q70(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.ivfTopK(e, cents, 3, nprobe = 2, coarseProbe = 2)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  /** One Lloyd round over the fine centroids: assign each fine centroid
    * to its best coarse center (full-precision cos, tie -> lower g),
    * then recompute each center as the member mean (summed in
    * ascending-cid order, the Scala loop's order); empty groups keep
    * their previous center. */
  private def lloydRound(r: Int): String = {
    val prev = s"c${r - 1}"
    s"""s$r AS (
      |  SELECT f.cid, p.g, ${cosFullSql("f.v", "p.cv")} AS cs
      |  FROM fine f CROSS JOIN $prev p),
      |a$r AS MATERIALIZED (
      |  SELECT cid, g FROM (
      |    SELECT cid, g, row_number() OVER (PARTITION BY cid ORDER BY cs DESC, g) AS rn
      |    FROM s$r) x WHERE rn = 1),
      |m$r AS MATERIALIZED (
      |  SELECT g, list(mx ORDER BY i) AS mv FROM (
      |    SELECT a.g, gs.i, list_sum(list(f.v[gs.i] ORDER BY f.cid)) / count(*) AS mx
      |    FROM a$r a JOIN fine f USING (cid) CROSS JOIN generate_series(1, 64) gs(i)
      |    GROUP BY a.g, gs.i) y GROUP BY g),
      |c$r AS MATERIALIZED (
      |  SELECT p.g, COALESCE(m.mv, p.cv) AS cv
      |  FROM $prev p LEFT JOIN m$r m USING (g))""".stripMargin
  }

  /** Shared CTE prefix: corpus, the 32 fine centroids, buildCoarseIndex's
    * five unrolled Lloyd rounds at the given group count (init centers =
    * evenly-spaced fine centroids, Scala's `i·k/coarseK` integer
    * arithmetic), and the kept (non-empty) coarse groups. q70's 2-level
    * path groups at the DEFAULT coarseK = ceil(√32) = 6; q74's tree path
    * groups at buildTreeIndex's k^(2/3) = 11. */
  private def lloyd1Ctes(coarseK: Int): String = {
    val init = (0 until coarseK).map(i => s"($i, ${i * 32 / coarseK})").mkString(", ")
    s"""e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |fine AS MATERIALIZED (SELECT vec_id AS cid, v FROM e WHERE vec_id < 32),
      |c0 AS MATERIALIZED (
      |  SELECT m.g, f.v AS cv
      |  FROM (VALUES $init) AS m(g, cid)
      |  JOIN fine f ON f.cid = m.cid),
      |${(1 to 5).map(lloydRound).mkString(",\n")},
      |kept AS MATERIALIZED (SELECT g, cv FROM c5 WHERE g IN (SELECT DISTINCT g FROM a5))""".stripMargin
  }

  private val q70Sql: String = {
    s"""WITH ${lloyd1Ctes(6)},
      |gsc AS (
      |  SELECT e.vec_id, e.v, k.g,
      |         round(${dotSql("e.v", "k.cv")} /
      |               (sqrt(${dotSql("e.v", "e.v")}) * sqrt(${dotSql("k.cv", "k.cv")})), 4) AS gcs
      |  FROM e CROSS JOIN kept k),
      |gtop AS (
      |  SELECT vec_id, v, g FROM (
      |    SELECT vec_id, v, g, row_number() OVER (PARTITION BY vec_id ORDER BY gcs DESC, g) AS grn
      |    FROM gsc) x WHERE grn <= 2),
      |fsc AS (
      |  SELECT t.vec_id, f.cid AS cell,
      |         round(${dotSql("t.v", "f.v")} /
      |               (sqrt(${dotSql("t.v", "t.v")}) * sqrt(${dotSql("f.v", "f.v")})), 4) AS fcs
      |  FROM gtop t JOIN a5 a ON a.g = t.g JOIN fine f ON f.cid = a.cid),
      |ftop AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY fcs DESC, cell) AS farn
      |    FROM fsc) x WHERE farn <= 2),
      |home AS (SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY fcs DESC, cell) AS farn
      |    FROM fsc) x WHERE farn = 1),
      |pairs AS (
      |  SELECT q.vec_id AS query_id, h.vec_id AS neighbor_id, q.cell,
      |         ${cosSql("qa.v", "nb.v")} AS cos
      |  FROM ftop q JOIN home h ON q.cell = h.cell AND h.vec_id <> q.vec_id
      |  JOIN e qa ON qa.vec_id = q.vec_id
      |  JOIN e nb ON nb.vec_id = h.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cell, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT query_id, neighbor_id, cell, cos, rn FROM ranked WHERE rn <= 3""".stripMargin
  }

  /** q74 — three-level (tree) IVF ANN: q65's 32 fine centroids
    * descended through the TREE quantizer (topProbe = coarseProbe =
    * nprobe = 2) — the throughput rung `ivfCellCount(tree = true)`
    * prescribes past n^(4/3), itself under the hash oracle. The oracle
    * replays BOTH Lloyd groupings: the shared first-level CTEs, then
    * buildTreeIndex's second grouping over the kept coarse centers with
    * DATA-DEPENDENT shape (coarseK = ceil(√c) and evenly-spaced init
    * positions computed IN SQL from the kept count c, exactly Scala's
    * integer arithmetic), then the three-pass descent (round-4 cosine;
    * ties by kept-top position, kept-coarse position, cid — the native
    * expression's insert order at each level). */
  private def q74(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.ivfTopK(e, cents, 3, nprobe = 2, coarseProbe = 2, topProbe = 2)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  private val q74Sql: String = {
    // second Lloyd (over the kept coarse centers, keyed by position p):
    // same template as the fine-level rounds with dynamic group count
    def lloyd2Round(r: Int): String = {
      val prev = s"t${r - 1}"
      s"""ts$r AS (
        |  SELECT kp.p, t.tg, ${cosFullSql("kp.cv", "t.cv")} AS cs
        |  FROM kp CROSS JOIN $prev t),
        |ta$r AS MATERIALIZED (
        |  SELECT p, tg FROM (
        |    SELECT p, tg, row_number() OVER (PARTITION BY p ORDER BY cs DESC, tg) AS rn
        |    FROM ts$r) x WHERE rn = 1),
        |tm$r AS MATERIALIZED (
        |  SELECT tg, list(mx ORDER BY i) AS mv FROM (
        |    SELECT a.tg, gs.i, list_sum(list(kp.cv[gs.i] ORDER BY kp.p)) / count(*) AS mx
        |    FROM ta$r a JOIN kp USING (p) CROSS JOIN generate_series(1, 64) gs(i)
        |    GROUP BY a.tg, gs.i) y GROUP BY tg),
        |t$r AS MATERIALIZED (
        |  SELECT p0.tg, COALESCE(m.mv, p0.cv) AS cv
        |  FROM $prev p0 LEFT JOIN tm$r m USING (tg))""".stripMargin
    }
    def r4(a: String, b: String): String =
      s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 4)"
    s"""WITH ${lloyd1Ctes(11)},
      |kp AS MATERIALIZED (
      |  SELECT g, cv, CAST(row_number() OVER (ORDER BY g) - 1 AS BIGINT) AS p
      |  FROM kept),
      |cfg AS MATERIALIZED (SELECT count(*) AS c, CAST(ceil(sqrt(count(*))) AS BIGINT) AS ck FROM kp),
      |t0 AS MATERIALIZED (
      |  SELECT i.tg, kp.cv
      |  FROM (SELECT unnest(generate_series(0, (SELECT ck FROM cfg) - 1)) AS tg) i
      |  JOIN kp ON kp.p = (i.tg * (SELECT c FROM cfg)) // (SELECT ck FROM cfg)),
      |${(1 to 5).map(lloyd2Round).mkString(",\n")},
      |ktop AS MATERIALIZED (
      |  SELECT tg, cv, CAST(row_number() OVER (ORDER BY tg) - 1 AS BIGINT) AS tp
      |  FROM t5 WHERE tg IN (SELECT DISTINCT tg FROM ta5)),
      |tsc AS (
      |  SELECT e.vec_id, e.v, k.tg, k.tp, ${r4("e.v", "k.cv")} AS tcs
      |  FROM e CROSS JOIN ktop k),
      |ttop AS (
      |  SELECT vec_id, v, tg FROM (
      |    SELECT vec_id, v, tg, row_number() OVER (PARTITION BY vec_id ORDER BY tcs DESC, tp) AS trn
      |    FROM tsc) x WHERE trn <= 2),
      |csc AS (
      |  SELECT q.vec_id, q.v, kp.p, kp.g, ${r4("q.v", "kp.cv")} AS ccs
      |  FROM ttop q JOIN ta5 a ON a.tg = q.tg JOIN kp ON kp.p = a.p),
      |ctop AS (
      |  SELECT vec_id, v, g FROM (
      |    SELECT vec_id, v, g, row_number() OVER (PARTITION BY vec_id ORDER BY ccs DESC, p) AS crn
      |    FROM csc) x WHERE crn <= 2),
      |fsc AS (
      |  SELECT t.vec_id, f.cid AS cell, ${r4("t.v", "f.v")} AS fcs
      |  FROM ctop t JOIN a5 a ON a.g = t.g JOIN fine f ON f.cid = a.cid),
      |ftop AS (
      |  SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY fcs DESC, cell) AS farn
      |    FROM fsc) x WHERE farn <= 2),
      |home AS (SELECT vec_id, cell FROM (
      |    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY fcs DESC, cell) AS farn
      |    FROM fsc) x WHERE farn = 1),
      |pairs AS (
      |  SELECT q.vec_id AS query_id, h.vec_id AS neighbor_id, q.cell,
      |         ${cosSql("qa.v", "nb.v")} AS cos
      |  FROM ftop q JOIN home h ON q.cell = h.cell AND h.vec_id <> q.vec_id
      |  JOIN e qa ON qa.vec_id = q.vec_id
      |  JOIN e nb ON nb.vec_id = h.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cell, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT query_id, neighbor_id, cell, cos, rn FROM ranked WHERE rn <= 3""".stripMargin
  }

  /** q79 — SQ8-compressed exact-scan top-5 (q59's shape over the
    * 8-bit-code index): the oracle replays the ENTIRE quantization
    * path in SQL — per-vector min/max range, scale = range/255,
    * code = clamp(floor((x−mn)/scale + 0.5), 0, 255) (floor(x+0.5),
    * not round(): HALF_UP vs HALF_EVEN differs between engines),
    * reconstruction mn + code·scale, then the same fold/round/rank
    * discipline as q59. Integer codes make the reconstruction
    * deterministic in any engine, so the hash compare pins the
    * compression arithmetic itself, not just the ranking. */
  private def q79(s: SparkSession, dir: String): DataFrame =
    Similarity.sq8TopK(emb(s, dir), col("vec_id") < 5, 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
              col("rn").cast("long").as("rn"))

  private val q79Sql = {
    val recon =
      """list_transform(v, x -> CASE WHEN scale = 0 THEN mn
        |    ELSE mn + LEAST(255, GREATEST(0, floor((x - mn) / scale + 0.5))) * scale
        |    END)""".stripMargin
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |rng AS (
      |  SELECT vec_id, v, list_aggregate(v, 'min') AS mn,
      |         (list_aggregate(v, 'max') - list_aggregate(v, 'min')) / 255 AS scale
      |  FROM e0),
      |e AS (SELECT vec_id, $recon AS v FROM rng),
      |pairs AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         ${cosSql("a.v", "b.v")} AS cos
      |  FROM e a JOIN e b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT query_id, neighbor_id, cos, rn FROM ranked WHERE rn <= 5""".stripMargin
  }

  /** q89 — PQ-compressed exact-scan top-5 (q79's shape over PRODUCT
    * quantization): m = 4 subspaces of 16 dims, FIXED codebooks = the
    * sub-slices of corpus vectors 0-15 (deterministic, like q65's
    * sample centroids — k-means training is not DuckDB-expressible,
    * but encode/score/rank plumbing is identical for any codebook
    * source). The oracle replays the whole path in SQL: per-subspace
    * argmin by sequential-fold squared L2 (ties to the lowest codebook
    * index), then the SYMMETRIC table score — per-subspace centroid
    * dots summed IN SUBSPACE ORDER (`list_sum(list(d ORDER BY m))`),
    * the exact float grouping of [[graft.plans.PqDot]] — then q59's
    * round/rank discipline. Hash-matching pins the trained-codebook
    * production form's arithmetic end to end. */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val base = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val cb = (0 until 4).map(sp => base.map(_.slice(sp * 16, sp * 16 + 16)))
    Similarity.pqTopK(e, col("vec_id") < 5, 5, cb)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  private val q89Sql = {
    // sub-vector slice s (0-based) of a 64-dim list, 16 dims each
    def sliceOf(v: String): String = s"$v[(sp.s * 16 + 1):(sp.s * 16 + 16)]"
    val l2 = "list_sum(list_transform(generate_series(1, 16), " +
             "i -> (sv[i] - cv[i]) * (sv[i] - cv[i])))"
    val dot16 = "list_sum(list_transform(generate_series(1, 16), i -> a.cv[i] * b.cv[i]))"
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sp AS (SELECT unnest(generate_series(0, 3)) AS s),
      |cbk AS MATERIALIZED (
      |  SELECT sp.s, e0.vec_id AS j, ${sliceOf("e0.v")} AS cv
      |  FROM e0 CROSS JOIN sp WHERE e0.vec_id < 16),
      |dists AS (
      |  SELECT x.vec_id, x.s, x.j, $l2 AS d FROM (
      |    SELECT e0.vec_id, sp.s, c.j, ${sliceOf("e0.v")} AS sv, c.cv
      |    FROM e0 CROSS JOIN sp JOIN cbk c ON c.s = sp.s) x),
      |enc AS MATERIALIZED (
      |  SELECT vec_id, s, j FROM (
      |    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s
      |                                            ORDER BY d, j) AS rn
      |    FROM dists) y WHERE rn = 1),
      |-- chosen centroid per (vec, subspace); norms and pair scores sum
      |-- per-subspace dots IN SUBSPACE ORDER (PqDot's float grouping)
      |chosen AS MATERIALIZED (
      |  SELECT e.vec_id, e.s, c.cv FROM enc e JOIN cbk c ON c.s = e.s AND c.j = e.j),
      |nrm AS MATERIALIZED (
      |  SELECT a.vec_id, sqrt(list_sum(list(d ORDER BY s))) AS nrm FROM (
      |    SELECT a.vec_id, a.s AS s, $dot16 AS d
      |    FROM chosen a JOIN chosen b ON a.vec_id = b.vec_id AND a.s = b.s) a
      |  GROUP BY a.vec_id),
      |pairdots AS (
      |  SELECT query_id, neighbor_id, list_sum(list(d ORDER BY s)) AS dt FROM (
      |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.s AS s, $dot16 AS d
      |    FROM chosen a JOIN chosen b ON a.s = b.s
      |    WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id) x
      |  GROUP BY query_id, neighbor_id),
      |pairs AS (
      |  SELECT p.query_id, p.neighbor_id,
      |         round(p.dt / (qa.nrm * nb.nrm), 4) AS cos
      |  FROM pairdots p
      |  JOIN nrm qa ON qa.vec_id = p.query_id
      |  JOIN nrm nb ON nb.vec_id = p.neighbor_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM pairs)
      |SELECT query_id, neighbor_id, cos, rn FROM ranked WHERE rn <= 5""".stripMargin
  }

  /** q93 — PQ shortlist + SQ8 refine (exact-scan Flat+Refine): q89's
    * fixed-codebook PQ chain generates a top-10 shortlist per query,
    * q79's SQ8 quantization re-scores exactly those pairs, and the
    * final rank keeps 5. The oracle replays BOTH compressions and the
    * composition glue in one statement — PQ encode → symmetric-table
    * score → shortlist rank, then SQ8 range/code/reconstruct →
    * re-score → final rank — so a hash match pins the entire refine
    * path's arithmetic, not just its output shape. */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val base = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val cb = (0 until 4).map(sp => base.map(_.slice(sp * 16, sp * 16 + 16)))
    Similarity.pqTopKRefine(e, col("vec_id") < 5, 5, 10, cb)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  private val q93Sql = {
    def sliceOf(v: String): String = s"$v[(sp.s * 16 + 1):(sp.s * 16 + 16)]"
    val l2 = "list_sum(list_transform(generate_series(1, 16), " +
             "i -> (sv[i] - cv[i]) * (sv[i] - cv[i])))"
    val dot16 = "list_sum(list_transform(generate_series(1, 16), i -> a.cv[i] * b.cv[i]))"
    val recon =
      """list_transform(v, x -> CASE WHEN scale = 0 THEN mn
        |    ELSE mn + LEAST(255, GREATEST(0, floor((x - mn) / scale + 0.5))) * scale
        |    END)""".stripMargin
    s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |sp AS (SELECT unnest(generate_series(0, 3)) AS s),
      |cbk AS MATERIALIZED (
      |  SELECT sp.s, e0.vec_id AS j, ${sliceOf("e0.v")} AS cv
      |  FROM e0 CROSS JOIN sp WHERE e0.vec_id < 16),
      |dists AS (
      |  SELECT x.vec_id, x.s, x.j, $l2 AS d FROM (
      |    SELECT e0.vec_id, sp.s, c.j, ${sliceOf("e0.v")} AS sv, c.cv
      |    FROM e0 CROSS JOIN sp JOIN cbk c ON c.s = sp.s) x),
      |enc AS MATERIALIZED (
      |  SELECT vec_id, s, j FROM (
      |    SELECT vec_id, s, j, row_number() OVER (PARTITION BY vec_id, s
      |                                            ORDER BY d, j) AS rn
      |    FROM dists) y WHERE rn = 1),
      |chosen AS MATERIALIZED (
      |  SELECT e.vec_id, e.s, c.cv FROM enc e JOIN cbk c ON c.s = e.s AND c.j = e.j),
      |pqnrm AS MATERIALIZED (
      |  SELECT a.vec_id, sqrt(list_sum(list(d ORDER BY s))) AS nrm FROM (
      |    SELECT a.vec_id, a.s AS s, $dot16 AS d
      |    FROM chosen a JOIN chosen b ON a.vec_id = b.vec_id AND a.s = b.s) a
      |  GROUP BY a.vec_id),
      |pairdots AS (
      |  SELECT query_id, neighbor_id, list_sum(list(d ORDER BY s)) AS dt FROM (
      |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.s AS s, $dot16 AS d
      |    FROM chosen a JOIN chosen b ON a.s = b.s
      |    WHERE a.vec_id < 5 AND b.vec_id <> a.vec_id) x
      |  GROUP BY query_id, neighbor_id),
      |pqpairs AS (
      |  SELECT p.query_id, p.neighbor_id,
      |         round(p.dt / (qa.nrm * nb.nrm), 4) AS cos
      |  FROM pairdots p
      |  JOIN pqnrm qa ON qa.vec_id = p.query_id
      |  JOIN pqnrm nb ON nb.vec_id = p.neighbor_id),
      |short AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |                              ORDER BY cos DESC, neighbor_id) AS rn
      |    FROM pqpairs) z WHERE rn <= 10),
      |-- SQ8 refine leg: q79's reconstruction over exactly the shortlist
      |srng AS (
      |  SELECT vec_id, v, list_aggregate(v, 'min') AS mn,
      |         (list_aggregate(v, 'max') - list_aggregate(v, 'min')) / 255 AS scale
      |  FROM e0),
      |se AS (SELECT vec_id, $recon AS v FROM srng),
      |rpairs AS (
      |  SELECT sh.query_id, sh.neighbor_id, ${cosSql("qa.v", "nb.v")} AS cos
      |  FROM short sh
      |  JOIN se qa ON qa.vec_id = sh.query_id
      |  JOIN se nb ON nb.vec_id = sh.neighbor_id),
      |rranked AS (
      |  SELECT query_id, neighbor_id, cos,
      |         row_number() OVER (PARTITION BY query_id
      |                            ORDER BY cos DESC, neighbor_id) AS rn
      |  FROM rpairs)
      |SELECT query_id, neighbor_id, cos, rn FROM rranked WHERE rn <= 5""".stripMargin
  }

  /** q86-q88 — the FRAME-BACKED (de-literalized) serving path under
    * the UNCHANGED q65/q70/q74 oracles: same centroids, same descent
    * semantics, but fine-cell assignment runs as the routed frame JOIN
    * ([[Similarity.ivfCellsJoinFrame]]) instead of the embedded-literal
    * expression — so the path that scales past the ~10⁵-centroid plan
    * ceiling itself sits under the hash oracle at every quantizer
    * depth. A divergence between the two assignment paths would show
    * here as a hash mismatch against the SAME SQL. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.ivfTopKJoin(e, Similarity.framesFlat(s, cents), 3,
                           nprobe = 2, coarseProbe = 1)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  private def q87(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.ivfTopKJoin(e, Similarity.framesOf(s, Similarity.buildCoarseIndex(cents)),
                           3, nprobe = 2, coarseProbe = 2)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  private def q88(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.ivfTopKJoin(e, Similarity.framesOfTree(s, Similarity.buildTreeIndex(cents)),
                           3, nprobe = 2, coarseProbe = 2, topProbe = 2)
      .select(col("query_id"), col("neighbor_id"), col("cell"), col("cos"),
              col("rn").cast("long").as("rn"))
  }

  /** Oracle replay of the deterministic ±1 JL matrix entry (j, i):
    * parity of the first 8 md5 hex chars of `salt|j|i` — the exact
    * [[Similarity.jlMatrix]] construction. */
  private def jlEntrySqlFor(salt: String): String =
    s"""CASE WHEN CAST(list_sum(list_transform(generate_series(1, 8),
      |  h -> CAST(instr('0123456789abcdef', substr(md5('$salt|' || j || '|' || i), h, 1)) - 1 AS BIGINT)
      |       * CAST(pow(16, 8 - h) AS BIGINT))) AS BIGINT) % 2 = 0
      |THEN 1.0 ELSE -1.0 END""".stripMargin

  private val jlEntrySql = jlEntrySqlFor("jl")

  /** Shared oracle CTEs: the JL matrix as 16 ordered 64-entry rows, and
    * every vector's projection as an ordered 16-list (same sequential
    * fold as the native dot — q59's list_sum discipline). */
  private val jlCtes =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |r AS (SELECT j.j, i.i, $jlEntrySql AS rr
      |      FROM (SELECT unnest(generate_series(0, 15)) AS j) j,
      |           (SELECT unnest(generate_series(0, 63)) AS i) i),
      |rrow AS (SELECT j, list(rr ORDER BY i) AS rl FROM r GROUP BY j),
      |pj AS (SELECT e.vec_id, rrow.j,
      |         list_sum(list_transform(generate_series(1, 64),
      |                                 x -> e.v[x] * rrow.rl[x])) AS vp
      |       FROM e, rrow),
      |pl AS (SELECT vec_id, list(vp ORDER BY j) AS vp FROM pj GROUP BY vec_id)""".stripMargin

  /** q100 — JL random projection parity: every vector's 16 projected
    * coordinates, long format. The oracle REBUILDS the ±1 matrix from
    * md5 parities and refolds each projection in the same sequential
    * order — the reduction itself is hash-checked before any search
    * uses it. */
  private def q100(s: SparkSession, dir: String): DataFrame =
    Similarity.jlProject(emb(s, dir), 64, 16)
      .select(col("vec_id"), posexplode(col("vp")).as(Seq("j", "vp")))
      .select(col("vec_id"), col("j").cast("long").as("j"),
              round(col("vp"), 4).as("vp"))

  private val q100Sql =
    s"""WITH $jlCtes
      |SELECT vec_id, CAST(j AS BIGINT) AS j, round(vp, 4) AS vp FROM pj""".stripMargin

  /** q101 — reduced-dimension ANN, the whole serving path: shortlist 20
    * by projected cosine (4× less arithmetic and index per pair), exact
    * re-rank to top-5 on the full vectors. One DuckDB statement replays
    * matrix → projection → projected-cosine shortlist → exact refine;
    * the spec additionally pins recall vs the q59 exact scan. */
  private def q101(s: SparkSession, dir: String): DataFrame =
    Similarity.jlTopKRefine(emb(s, dir), col("vec_id") < 5, 5, 20, 64, 16)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
              col("rn").cast("long").as("rn"))

  private val q101Sql =
    s"""WITH $jlCtes,
      |pn AS (SELECT vec_id, vp,
      |         sqrt(list_sum(list_transform(generate_series(1, 16),
      |                                      x -> vp[x] * vp[x]))) AS pn
      |       FROM pl),
      |pc AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         round(list_sum(list_transform(generate_series(1, 16),
      |                                       x -> a.vp[x] * b.vp[x]))
      |               / (a.pn * b.pn), 6) AS pcos
      |       FROM pn a JOIN pn b ON a.vec_id < 5 AND b.vec_id <> a.vec_id),
      |short AS (SELECT query_id, neighbor_id FROM (
      |    SELECT query_id, neighbor_id,
      |           row_number() OVER (PARTITION BY query_id
      |                              ORDER BY pcos DESC, neighbor_id) AS srn
      |    FROM pc) x WHERE srn <= 20),
      |sc AS (SELECT s.query_id, s.neighbor_id,
      |         ${cosSql("qa.v", "qb.v")} AS cos
      |       FROM short s JOIN e qa ON qa.vec_id = s.query_id
      |                    JOIN e qb ON qb.vec_id = s.neighbor_id)
      |SELECT query_id, neighbor_id, cos,
      |       CAST(row_number() OVER (PARTITION BY query_id
      |                               ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
      |FROM sc QUALIFY rn <= 5""".stripMargin

  /** q108 — semantic dedup ([[Similarity.semanticDedupFrames]]):
    * SemDeDup's cluster-then-pairwise recipe, served through the
    * FRAME-backed quantizer with multi-probe candidate generation,
    * under a full hash oracle. Cells are q65's flat quantizer (first
    * 16 corpus vectors as centroids, round-4 cosine, ties to the lower
    * id) assigned via the frame join; each vector probes its best TWO
    * cells and a pair is compared when it meets in any probed cell
    * (the straddle mitigation); confirmation is round-6 cosine ≥ 0.35
    * (the corpus's 99th within-cell percentile ≈ 0.344, max 0.49 —
    * both branches live); components resolve transitively and every
    * vector returns with its HOME cell in the (cell, cluster,
    * is_keeper, n_cluster) verdict. The oracle replays top-2
    * assignment, the probed-cell meet, confirmation, and the recursive
    * closure. */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.semanticDedupFrames(e, Similarity.framesFlat(s, cents), 0.35,
                                   nprobe = 2)
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
              col("cluster"), col("is_keeper"), col("n_cluster"))
  }

  /** Shared CTE chain replaying [[Similarity.semanticDedupFrames]] at
    * the q108 config (16 literal centroids, nprobe = 2, tau = 0.35):
    * probed-cell assignment, confirmed edges, recursive closure,
    * cluster sizes. Factored so q164's contrastive mining composes on
    * the same structure. */
  private val semCtes =
    s"""e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 16),
      |scored AS (
      |  SELECT e.vec_id, e.v, p.pid, ${cosSql("e.v", "p.pv")} AS cs
      |  FROM e CROSS JOIN p),
      |ranked AS (
      |  SELECT vec_id, v, pid,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, pid) AS arn
      |  FROM scored),
      |cells AS (SELECT vec_id, v, pid AS cell FROM ranked WHERE arn = 1),
      |probed AS (SELECT vec_id, v, pid AS pc FROM ranked WHERE arn <= 2),
      |dup AS (
      |  SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
      |  FROM probed a JOIN probed b ON a.pc = b.pc AND a.vec_id < b.vec_id
      |  WHERE round(${dotSql("a.v", "b.v")} /
      |              (sqrt(${dotSql("a.v", "a.v")}) * sqrt(${dotSql("b.v", "b.v")})),
      |              6) >= 0.35),
      |edges AS (SELECT da AS src, db AS dst FROM dup
      |          UNION SELECT db AS src, da AS dst FROM dup),
      |reach AS (
      |  SELECT vec_id AS id, vec_id AS r FROM e
      |  UNION
      |  SELECT reach.id, edges.dst FROM reach JOIN edges ON edges.src = reach.r),
      |cl AS (
      |  SELECT id AS vec_id, min(r) AS cluster,
      |         CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      |  FROM reach GROUP BY id),
      |sz AS (SELECT cluster, count(*) AS n_cluster FROM cl GROUP BY 1)""".stripMargin

  private val q108Sql =
    s"""WITH RECURSIVE
      |$semCtes
      |SELECT cl.vec_id, cells.cell, cl.cluster, cl.is_keeper, sz.n_cluster
      |FROM cl JOIN cells ON cells.vec_id = cl.vec_id JOIN sz USING (cluster)""".stripMargin

  /** q164 — contrastive pair mining ([[Similarity.contrastivePairs]]):
    * the (anchor, positive, hard-negative) triplets an embedding model
    * fine-tunes on, mined from the q108 semantic-dedup structure —
    * positive = closest same-cluster neighbor, hard negative = closest
    * DIFFERENT-cluster neighbor, both argmaxes over the probed-cell
    * candidates the dedup pass already generates (never all pairs).
    * The oracle composes the full q108 replay with the two ranked
    * selections; singleton anchors emit nothing, a missing hard
    * negative stays null. */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 16).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.contrastivePairs(e, Similarity.framesFlat(s, cents), 0.35,
                                nprobe = 2)
  }

  private val q164Sql =
    s"""WITH RECURSIVE
      |$semCtes,
      |cand AS (
      |  SELECT a.vec_id AS da, b.vec_id AS db,
      |         round(${dotSql("a.v", "b.v")} /
      |               (sqrt(${dotSql("a.v", "a.v")}) * sqrt(${dotSql("b.v", "b.v")})),
      |               6) AS cs
      |  FROM probed a JOIN probed b ON a.pc = b.pc AND a.vec_id <> b.vec_id),
      |labp AS (SELECT c.da, c.db, c.cs, la.cluster AS ca, lb.cluster AS cb
      |         FROM cand c JOIN cl la ON la.vec_id = c.da
      |                     JOIN cl lb ON lb.vec_id = c.db),
      |posr AS (SELECT da, db, cs,
      |           row_number() OVER (PARTITION BY da ORDER BY cs DESC, db) AS rn
      |         FROM labp WHERE ca = cb),
      |negr AS (SELECT da, db, cs,
      |           row_number() OVER (PARTITION BY da ORDER BY cs DESC, db) AS rn
      |         FROM labp WHERE ca <> cb)
      |SELECT p.da AS anchor_id, p.db AS pos_id, p.cs AS pos_cos,
      |       n.db AS neg_id, n.cs AS neg_cos
      |FROM posr p LEFT JOIN negr n ON n.da = p.da AND n.rn = 1
      |WHERE p.rn = 1""".stripMargin

  // ------------------------------------ engine-produced embeddings

  /** Shared oracle CTEs for [[Similarity.embedDocs]]: hashed-TF
    * micro-grid features (the q124 arithmetic — md5 bucket, round to
    * integer micro-units, capped-length slot at h = 64), the salt-`emb`
    * ±1 JL matrix (16×65), and every document's projection `epj` /
    * dense list `epl`. All integer-exact: features are integers, matrix
    * entries ±1, so `ev` replays bit-for-bit. */
  private[queries] val embCtes = {
    val hp = TextQueries.hashPointSql("t", "clf", 64L)
    s"""etoks AS (SELECT doc_id, t FROM (
      |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS t FROM documents) x
      |  WHERE t <> ''),
      |ecnt AS (SELECT doc_id, count(*) AS n FROM etoks GROUP BY 1),
      |eraw AS (SELECT doc_id, $hp AS h, count(*) AS c FROM etoks GROUP BY 1, 2),
      |efeat AS MATERIALIZED (
      |  SELECT eraw.doc_id, h, CAST(round(c * 1000000.0 / n) AS BIGINT) AS f
      |  FROM eraw JOIN ecnt USING (doc_id)
      |  UNION ALL
      |  SELECT doc_id, CAST(64 AS BIGINT) AS h,
      |         CAST(round(least(n, 256) * 1000000.0 / 256) AS BIGINT) AS f
      |  FROM ecnt),
      |er AS MATERIALIZED (SELECT j.j, i.i, ${jlEntrySqlFor("emb")} AS rr
      |      FROM (SELECT unnest(generate_series(0, 15)) AS j) j,
      |           (SELECT unnest(generate_series(0, 64)) AS i) i),
      |epj AS MATERIALIZED (
      |  SELECT f.doc_id, r.j, CAST(sum(f.f * r.rr) AS BIGINT) AS ev
      |  FROM efeat f JOIN er r ON r.i = f.h
      |  GROUP BY 1, 2),
      |epl AS MATERIALIZED (
      |  SELECT doc_id, list(CAST(ev AS DOUBLE) ORDER BY j) AS v
      |  FROM epj GROUP BY 1)""".stripMargin
  }

  private[queries] def dotNSql(a: String, b: String, n: Int): String =
    s"list_sum(list_transform(generate_series(1, $n), x2 -> $a[x2] * $b[x2]))"

  private[queries] def cosNSql(av: String, bv: String, n: Int, places: Int): String =
    s"round(${dotNSql(av, bv, n)} / " +
      s"(sqrt(${dotNSql(av, av, n)}) * sqrt(${dotNSql(bv, bv, n)})), $places)"

  /** q141 — engine-produced document embeddings ([[Similarity
    * .embedDocs]], r11 verdict gap #4): every document's 16 projected
    * coordinates, long format, INTEGER-exact (micro-grid tf × ±1
    * matrix ⇒ integer sums). The oracle rebuilds the hash buckets, the
    * micro-grid, the salt-`emb` matrix, and refolds each projection. */
  private def q141(s: SparkSession, dir: String): DataFrame =
    Similarity.embedDocs(t(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), posexplode(col("v")).as(Seq("j", "ev")))
      .select(col("doc_id"), col("j").cast("long").as("j"),
              col("ev").cast("long").as("ev"))

  private val q141Sql =
    s"""WITH $embCtes
      |SELECT doc_id, CAST(j AS BIGINT) AS j, ev FROM epj""".stripMargin

  /** Confirmation threshold for the derived-embedding space: the
    * all-pairs cosine distribution at sf0.01 has median ≈ 0.72 and
    * 99.9th percentile ≈ 0.979 with max 0.9997 — 0.98 admits 116 of
    * 124,750 global pairs, so the dedup genuinely drops documents while
    * the overwhelming majority pass (both branches live). */
  private val embTau = 0.98

  /** q142 — the CLOSED semantic-dedup chain: raw text → in-engine
    * embeddings (q141's operator) → frame-backed multi-probe SemDeDup
    * ([[Similarity.semanticDedupFrames]], the q108 machinery) — no
    * external vector table anywhere. Centroids are the 16
    * lowest-doc-id embeddings (the q108 convention on the derived
    * space); nprobe = 2; confirmation at round-6 cosine ≥ `embTau`.
    * The oracle replays embedding construction, top-2 cell
    * assignment, the probed-cell meet, confirmation, and the
    * recursive closure — the entire chain in ONE statement. */
  /** Engine-produced document vectors as the (vec_id, v) frame every
    * Similarity consumer takes — cacheOnce'd per (session, dir) plan so
    * q142/q143/q144 (and repeated bench reps) share one
    * materialization of the embedding pass. */
  private def docVecs(s: SparkSession, dir: String): DataFrame =
    graft.queries.cacheOnce(
      Similarity.embedDocs(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id").as("vec_id"), col("v")))

  private def q142(s: SparkSession, dir: String): DataFrame = {
    val e = docVecs(s, dir)
    val cents = e.orderBy("vec_id").limit(16)
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.semanticDedupFrames(e, Similarity.framesFlat(s, cents), embTau,
                                   nprobe = 2)
      .select(col("vec_id").as("doc_id"), col("cell").cast("long").as("cell"),
              col("cluster"), col("is_keeper"), col("n_cluster"))
  }

  private val q142Sql =
    s"""WITH RECURSIVE $embCtes,
      |ep AS (SELECT doc_id AS pid, v AS pv FROM epl ORDER BY pid LIMIT 16),
      |escored AS (
      |  SELECT epl.doc_id, epl.v, ep.pid, ${cosNSql("epl.v", "ep.pv", 16, 4)} AS cs
      |  FROM epl CROSS JOIN ep),
      |eranked AS (
      |  SELECT doc_id, v, pid,
      |         row_number() OVER (PARTITION BY doc_id ORDER BY cs DESC, pid) AS arn
      |  FROM escored),
      |ecells AS (SELECT doc_id, v, pid AS cell FROM eranked WHERE arn = 1),
      |eprobed AS (SELECT doc_id, v, pid AS pc FROM eranked WHERE arn <= 2),
      |edup AS (
      |  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |  FROM eprobed a JOIN eprobed b ON a.pc = b.pc AND a.doc_id < b.doc_id
      |  WHERE ${cosNSql("a.v", "b.v", 16, 6)} >= $embTau),
      |eedges AS (SELECT da AS src, db AS dst FROM edup
      |           UNION SELECT db AS src, da AS dst FROM edup),
      |ereach AS (
      |  SELECT doc_id AS id, doc_id AS r FROM epl
      |  UNION
      |  SELECT ereach.id, eedges.dst FROM ereach JOIN eedges ON eedges.src = ereach.r),
      |ecl AS (
      |  SELECT id AS doc_id, min(r) AS cluster,
      |         CAST(CASE WHEN min(r) = id THEN 1 ELSE 0 END AS BIGINT) AS is_keeper
      |  FROM ereach GROUP BY id),
      |esz AS (SELECT cluster, count(*) AS n_cluster FROM ecl GROUP BY 1)
      |SELECT ecl.doc_id, CAST(ecells.cell AS BIGINT) AS cell, ecl.cluster,
      |       ecl.is_keeper, esz.n_cluster
      |FROM ecl JOIN ecells ON ecells.doc_id = ecl.doc_id JOIN esz USING (cluster)""".stripMargin

  // ---------------------------------------- oracle-replayable k-means

  private val kmK = 8
  private val kmIters = 3
  private val kmM = 5

  /** Trained centroids are a per-(session, dir) corpus artifact — the
    * [[TextQueries]] bpeMemo contract: q143/q144 (and repeated bench
    * reps) pay the 3-iteration Lloyd loop once; the memo stores
    * k·dim longs-as-doubles (hyperparameter-sized). */
  private val kmMemo = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), Seq[(Int, Seq[Double])]]
  private def kmCents(s: SparkSession, dir: String): Seq[(Int, Seq[Double])] =
    kmMemo.getOrElseUpdate((s, dir), {
      kmMemo.keys.filter(_._1 eq s).filter(_._2 != dir).foreach(kmMemo.remove)
      Similarity.kmeansCentroids(docVecs(s, dir), kmK, kmIters)
    })

  /** Unrolled Lloyd CTEs over `epl` (the q141 document vectors):
    * kc0 = the k lowest-doc-id vectors (cid by rank order), then per
    * iteration i an assignment window (round-4 cosine DESC, cid — the
    * [[Similarity.ivfCellOf]] contract), an exact-integer per-(cell,
    * coord) mean rounded back onto the grid, and a left-join rebuild
    * that keeps empty cells' previous centroids — the exact
    * [[Similarity.kmeansCentroids]] recipe. */
  private def kmCtes(k: Int, iters: Int): String = {
    val init =
      s"""kc0 AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS pid,
        |               v AS pv
        |        FROM epl ORDER BY doc_id LIMIT $k)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""ka$i AS (SELECT doc_id, v, pid,
        |          row_number() OVER (PARTITION BY doc_id
        |                             ORDER BY ${cosNSql("v", "pv", 16, 4)} DESC, pid) AS rn
        |        FROM epl CROSS JOIN kc${i - 1}),
        |kg$i AS (SELECT pid, gs.j, CAST(round(sum(v[gs.j]) / count(*)) AS DOUBLE) AS cv
        |         FROM ka$i, (SELECT unnest(generate_series(1, 16)) AS j) gs
        |         WHERE rn = 1 GROUP BY 1, 2),
        |kc$i AS (SELECT kc${i - 1}.pid, coalesce(u.pv, kc${i - 1}.pv) AS pv
        |         FROM kc${i - 1} LEFT JOIN (SELECT pid, list(cv ORDER BY j) AS pv
        |                                    FROM kg$i GROUP BY 1) u USING (pid))""".stripMargin
    }
    (init +: steps).mkString(",\n")
  }

  /** Final assignment + cell sizes under the trained centroids. */
  private def kmFinalCtes(k: Int, iters: Int): String =
    s"""${kmCtes(k, iters)},
      |kaf AS (SELECT doc_id, pid AS cell, cs AS cos FROM (
      |    SELECT doc_id, pid, ${cosNSql("v", "pv", 16, 4)} AS cs,
      |           row_number() OVER (PARTITION BY doc_id
      |                              ORDER BY ${cosNSql("v", "pv", 16, 4)} DESC, pid) AS rn
      |    FROM epl CROSS JOIN kc$iters) x WHERE rn = 1),
      |ksz AS (SELECT cell, count(*) AS n_cell FROM kaf GROUP BY 1)""".stripMargin

  /** q143 — distributed k-means ([[Similarity.kmeansCentroids]] +
    * [[Similarity.kmeansAssign]]): every document's cluster under
    * k = $kmK, $kmIters Lloyd iterations over the engine-produced
    * embeddings, with its round-4 cosine to the learned centroid and
    * the cluster population. The oracle replays embedding
    * construction AND the full training loop — deterministic init,
    * every assignment window, every integer-grid centroid update —
    * as unrolled CTEs in one statement (the q124 GD discipline
    * applied to clustering). */
  private def q143(s: SparkSession, dir: String): DataFrame =
    Similarity.kmeansAssign(docVecs(s, dir), kmCents(s, dir))
      .select(col("vec_id").as("doc_id"), col("cell"), col("cos"), col("n_cell"))

  private val q143Sql =
    s"""WITH $embCtes,
      |${kmFinalCtes(kmK, kmIters)}
      |SELECT kaf.doc_id, kaf.cell, kaf.cos, ksz.n_cell
      |FROM kaf JOIN ksz USING (cell)""".stripMargin

  /** q144 — cluster-balanced sampling ([[Similarity
    * .clusterBalancedSample]]): the $kmM most prototypical documents
    * per q143 cluster (round-4 cosine to centroid DESC, doc_id) — the
    * topic-balanced subset a curation run feeds downstream so no
    * cluster dominates. Composes the trained centroids; the oracle
    * adds one window over the replayed assignment. */
  private def q144(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterBalancedSample(docVecs(s, dir), kmCents(s, dir), kmM)
      .select(col("vec_id").as("doc_id"), col("cell"), col("cos"), col("rn"))

  private val q144Sql =
    s"""WITH $embCtes,
      |${kmFinalCtes(kmK, kmIters)}
      |SELECT doc_id, cell, cos, rn FROM (
      |  SELECT doc_id, cell, cos,
      |         CAST(row_number() OVER (PARTITION BY cell
      |                                 ORDER BY cos DESC, doc_id) AS BIGINT) AS rn
      |  FROM kaf) x WHERE rn <= $kmM""".stripMargin

  /** q149 — cluster outlier mining ([[Similarity.clusterOutliers]]):
    * q144's inverse order — the 5 documents FARTHEST from their own
    * centroid per cluster (lowest round-4 cosine, ties low), the
    * review queue where junk and mislabeled documents concentrate.
    * Oracle: the replayed assignment with an ascending window. */
  private def q149(s: SparkSession, dir: String): DataFrame =
    Similarity.clusterOutliers(docVecs(s, dir), kmCents(s, dir), kmM)
      .select(col("vec_id").as("doc_id"), col("cell"), col("cos"), col("rn"))

  private val q149Sql =
    s"""WITH $embCtes,
      |${kmFinalCtes(kmK, kmIters)}
      |SELECT doc_id, cell, cos, rn FROM (
      |  SELECT doc_id, cell, cos,
      |         CAST(row_number() OVER (PARTITION BY cell
      |                                 ORDER BY cos ASC, doc_id) AS BIGINT) AS rn
      |  FROM kaf) x WHERE rn <= $kmM""".stripMargin

  /** q148 — cluster keyword labeling ([[graft.pipeline.TextAnalysis
    * .clusterKeywords]]): the top-5 class-TF-IDF terms per q143
    * k-means cluster (ctf · ln(n_clusters / cluster_df), micro-scaled,
    * ties → term) — the auditability layer over the unsupervised
    * clustering: a human reads WHAT each cluster is before sampling
    * from it. The oracle composes the full k-means replay with the
    * c-TF-IDF arithmetic. */
  private def q148(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TextAnalysis.clusterKeywords(
        t(s, dir, "documents"), "doc_id", "text",
        Similarity.kmeansAssign(docVecs(s, dir), kmCents(s, dir))
          .select(col("vec_id").as("doc_id"), col("cell")))
      .select(col("cell"), col("tok"), col("score_e6"), col("rn"))

  private val q148Sql =
    s"""WITH $embCtes,
      |${kmFinalCtes(kmK, kmIters)},
      |ct AS (SELECT kaf.cell, e.t AS tok, count(*) AS ctf
      |       FROM etoks e JOIN kaf ON kaf.doc_id = e.doc_id GROUP BY 1, 2),
      |ncl AS (SELECT count(DISTINCT cell) AS ncl FROM kaf),
      |dfc AS (SELECT tok, count(*) AS dfc FROM ct GROUP BY 1),
      |ksc AS (SELECT ct.cell, ct.tok,
      |          CAST(round(ct.ctf * ln(ncl.ncl * 1.0 / dfc.dfc) * 1000000.0) AS BIGINT) AS score_e6
      |        FROM ct JOIN dfc USING (tok) CROSS JOIN ncl)
      |SELECT cell, tok, score_e6, rn FROM (
      |  SELECT cell, tok, score_e6,
      |         CAST(row_number() OVER (PARTITION BY cell
      |                                 ORDER BY score_e6 DESC, tok) AS BIGINT) AS rn
      |  FROM ksc) x WHERE rn <= 5""".stripMargin

  /** q152 — SEMANTIC decontamination ([[Similarity
    * .semanticContamination]]): every non-eval document's highest
    * round-6 cosine against the eval slice (doc_id % 50 = 0 — the
    * held-out benchmark stand-in), the eval item attaining it, and
    * the ≥ 0.97 flag (measured max-cos distribution: 7/6 docs flag at
    * sf0.001/sf0.01 — both branches live). The paraphrase-robust twin
    * of q83's n-gram gate; eval side broadcast (benchmark-sized), the
    * scored join a zero-shuffle map. */
  private val contamTau = 0.97

  private def q152(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticContamination(docVecs(s, dir),
                                     col("vec_id") % 50 === 0, contamTau)
      .select(col("vec_id").as("doc_id"), col("eval_id"), col("cos"),
              col("contaminated"))

  private val q152Sql =
    s"""WITH $embCtes,
      |sev AS (SELECT doc_id AS eval_id, v AS ev FROM epl WHERE doc_id % 50 = 0),
      |scc AS (SELECT epl.doc_id, sev.eval_id,
      |          ${cosNSql("epl.v", "sev.ev", 16, 6)} AS cos
      |        FROM epl CROSS JOIN sev WHERE epl.doc_id % 50 <> 0)
      |SELECT doc_id, eval_id, cos,
      |       CAST(CASE WHEN cos >= $contamTau THEN 1 ELSE 0 END AS BIGINT) AS contaminated
      |FROM (SELECT scc.*, row_number() OVER (PARTITION BY doc_id
      |                                       ORDER BY cos DESC, eval_id) AS rn
      |      FROM scc) x
      |WHERE rn = 1""".stripMargin

  /** q154 — TOPIC-balanced mixture resampling: q103's temperature
    * recipe ([[graft.pipeline.TextAnalysis.temperatureResample]],
    * α = 0.5) with the k-means CLUSTER as the domain — the
    * cluster-balanced mixture step (upweight small topics, damp
    * dominant ones) run on topics the engine DISCOVERED rather than a
    * metadata column. Pure composition: the q143 assignment is the
    * group frame; rates and hash-point keeps replay exactly. */
  private def q154(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TextAnalysis.temperatureResample(
      Similarity.kmeansAssign(docVecs(s, dir), kmCents(s, dir))
        .select(col("vec_id").as("doc_id"), col("cell")),
      "doc_id", "cell", targetTotal = 200)

  private val q154Sql =
    s"""WITH $embCtes,
      |${kmFinalCtes(kmK, kmIters)},
      |tcnt AS (SELECT cell, count(*) AS n_group FROM kaf GROUP BY 1),
      |tw AS (SELECT cell, n_group,
      |         CAST(round(sqrt(CAST(n_group AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_e6
      |       FROM tcnt),
      |tsw AS (SELECT sum(w_e6) AS sum_w FROM tw),
      |tr AS (SELECT cell, n_group,
      |         CAST(round(200 * w_e6 * 1.0 / sum_w) AS BIGINT) AS target_n
      |       FROM tw CROSS JOIN tsw),
      |tr2 AS (SELECT cell, n_group, target_n,
      |         least(1000000, CAST(round(target_n * 1000000.0 / n_group) AS BIGINT))
      |           AS rate_e6 FROM tr),
      |tp AS (SELECT doc_id, cell,
      |         ${TextQueries.hashPointSql("CAST(doc_id AS VARCHAR)", "mix", 1000000L)} AS point
      |       FROM kaf)
      |SELECT tp.doc_id, tp.cell, tr2.n_group, tr2.target_n, tr2.rate_e6,
      |       CAST(CASE WHEN tp.point < tr2.rate_e6 THEN 1 ELSE 0 END AS BIGINT) AS sampled
      |FROM tp JOIN tr2 USING (cell)""".stripMargin

  // ------------------------------------------- hybrid retrieval (RRF)

  /** q146 — hybrid BM25 ⊕ dense retrieval fused by Reciprocal Rank
    * Fusion ([[graft.pipeline.TextAnalysis.hybridTopK]]): the q81
    * lexical pool and a semantic pool over the engine-produced
    * embeddings — the query string "hash join filter" rides through
    * the SAME hashed-TF × ±1-JL pipeline as the corpus — combined as
    * Σ 1/(60 + rank), micro-scaled. The oracle replays BOTH scorers
    * (the q81 BM25 arithmetic re-using the embedding CTEs' token
    * stream, plus the query-vector construction and round-6 cosine
    * pool) and the fusion in one statement. */
  private def q146(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.TextAnalysis.hybridTopK(
        t(s, dir, "documents"), "doc_id", "text",
        Seq("hash", "join", "filter"), k = 10, pool = 20,
        vecs = Some(docVecs(s, dir).select(col("vec_id").as("doc_id"), col("v"))))
      .select(col("doc_id"), col("rrf_e6"), col("rank"),
              col("bm25_rank"), col("cos_rank"))

  /** Full hybrid-RRF oracle statement for an arbitrary term list —
    * q146 instantiates it with the fixed q81 terms; q156 with a
    * dup-cluster-hitting query. */
  private def hybridSqlFor(terms: Seq[String], k: Int = 10): String = {
    val k1 = 1.2; val b = 0.75
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val qstr = terms.mkString(" ")
    s"""WITH $embCtes,
      |hdl AS (SELECT doc_id, count(*) AS dl FROM etoks GROUP BY 1),
      |hst AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM hdl),
      |htf AS (SELECT doc_id, t, count(*) AS tf FROM etoks
      |        WHERE t IN ($inList) GROUP BY 1, 2),
      |hdf AS (SELECT t, count(*) AS df FROM htf GROUP BY 1),
      |hc AS (
      |  SELECT htf.doc_id,
      |         CAST(round(ln((hst.n_docs - hdf.df + 0.5) / (hdf.df + 0.5) + 1.0)
      |           * (htf.tf * ${k1 + 1}) / (htf.tf + $k1 * (${1.0 - b} + $b * hdl.dl / hst.avgdl))
      |           * 1000000.0) AS BIGINT) AS c_e6
      |  FROM htf JOIN hdf USING (t) JOIN hdl USING (doc_id) CROSS JOIN hst),
      |hsc AS (SELECT doc_id, CAST(sum(c_e6) AS BIGINT) AS score_e6 FROM hc GROUP BY 1),
      |spool AS (SELECT doc_id,
      |            CAST(row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS BIGINT) AS bm25_rank
      |          FROM hsc ORDER BY score_e6 DESC, doc_id LIMIT 20),
      |qtoks AS (SELECT unnest(string_split('$qstr', ' ')) AS t),
      |qn AS (SELECT count(*) AS n FROM qtoks),
      |qfeat AS (
      |  SELECT x.h, CAST(round(x.c * 1000000.0 / qn.n) AS BIGINT) AS f
      |  FROM (SELECT ${TextQueries.hashPointSql("t", "clf", 64L)} AS h, count(*) AS c
      |        FROM qtoks GROUP BY 1) x CROSS JOIN qn
      |  UNION ALL
      |  SELECT CAST(64 AS BIGINT) AS h,
      |         CAST(round(least(qn.n, 256) * 1000000.0 / 256) AS BIGINT) AS f
      |  FROM qn),
      |qpj AS (SELECT r.j, CAST(sum(f.f * r.rr) AS BIGINT) AS ev
      |        FROM qfeat f JOIN er r ON r.i = f.h GROUP BY 1),
      |qvl AS (SELECT list(CAST(ev AS DOUBLE) ORDER BY j) AS qv FROM qpj),
      |dns AS (SELECT epl.doc_id, ${cosNSql("epl.v", "q.qv", 16, 6)} AS cs
      |        FROM epl CROSS JOIN qvl q),
      |dpool AS (SELECT doc_id,
      |            CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS BIGINT) AS cos_rank
      |          FROM dns ORDER BY cs DESC, doc_id LIMIT 20),
      |fused AS (
      |  SELECT doc_id,
      |         CAST(round((coalesce(1.0 / (60 + bm25_rank), 0)
      |                     + coalesce(1.0 / (60 + cos_rank), 0)) * 1000000.0) AS BIGINT) AS rrf_e6,
      |         bm25_rank, cos_rank
      |  FROM spool FULL OUTER JOIN dpool USING (doc_id))
      |SELECT doc_id, rrf_e6,
      |       CAST(row_number() OVER (ORDER BY rrf_e6 DESC, doc_id) AS BIGINT) AS rank,
      |       bm25_rank, cos_rank
      |FROM fused ORDER BY rrf_e6 DESC, doc_id LIMIT $k""".stripMargin
  }

  private val q146Sql = hybridSqlFor(Seq("hash", "join", "filter"))

  /** q156 — DIVERSIFIED hybrid retrieval ([[graft.pipeline
    * .TextAnalysis.diversifyByCluster]]): q146's fused result page
    * collapsed by q80's duplicate clusters — one rendition per
    * underlying document, survivors re-ranked densely. The oracle
    * nests both full statements as derived CTEs and adds the two
    * windows. */
  /** q156's query terms, chosen from the measured page composition:
    * under ('order','filter') the fused top-20 at sf0.01 contains
    * THREE same-semantic-cluster groups (the q142 ledger), so the
    * collapse branch is live in the checked artifact, not just in the
    * spec. */
  private val divTerms = Seq("order", "filter")

  private def q156(s: SparkSession, dir: String): DataFrame = {
    val ranked = graft.pipeline.TextAnalysis.hybridTopK(
      t(s, dir, "documents"), "doc_id", "text", divTerms, k = 20, pool = 20,
      vecs = Some(docVecs(s, dir).select(col("vec_id").as("doc_id"), col("v"))))
    val clusters = q142(s, dir).select(col("doc_id"), col("cluster"))
    graft.pipeline.TextAnalysis.diversifyByCluster(ranked, clusters)
      .select(col("doc_id"), col("cluster"), col("rrf_e6"), col("rank"))
  }

  private val q156Sql =
    s"""WITH h AS (${hybridSqlFor(divTerms, k = 20)}),
      |c AS (SELECT doc_id, cluster FROM (${q142Sql}) q142v)
      |SELECT doc_id, cluster, rrf_e6,
      |       CAST(row_number() OVER (ORDER BY base_rank) AS BIGINT) AS rank
      |FROM (
      |  SELECT h.doc_id, coalesce(c.cluster, h.doc_id) AS cluster,
      |         h.rrf_e6, h.rank AS base_rank,
      |         row_number() OVER (PARTITION BY coalesce(c.cluster, h.doc_id)
      |                            ORDER BY h.rank) AS crn
      |  FROM h LEFT JOIN c USING (doc_id)) x
      |WHERE crn = 1""".stripMargin

  /** q171 — RETRIEVAL EVAL ([[Similarity.rankEval]]): the q65 flat-IVF
    * index (32 cells, nprobe=2) graded at k=5 against q59's exact
    * brute-force truth for queries 0-4 — recall@5 / MRR / NDCG@5 per
    * query, the scorecard an index-tuning loop reads. The oracle nests
    * BOTH retrieval statements (q59 verbatim; q65's statement at k=5)
    * and replays the metric algebra, so the approximate index, the
    * ground truth, and the grading are all hash-checked together. */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.rankEval(
      Similarity.cosineTopK(e, col("vec_id") < 5, 5),
      Similarity.ivfTopK(e, cents, 5, nprobe = 2), 5)
  }

  private val q171Sql =
    s"""WITH tr AS (SELECT query_id, neighbor_id, rn AS trn FROM (${q59Sql}) t59
      |            WHERE rn <= 5),
      |ap AS (SELECT query_id, neighbor_id, rn AS arn FROM (${ivfFlatSql(5)}) a65
      |       WHERE rn <= 5),
      |ideal AS (
      |  SELECT query_id, count(*) AS n_truth,
      |         sum(1.0 / log2(trn + 1)) AS idcg
      |  FROM tr GROUP BY query_id),
      |hits AS (
      |  SELECT tr.query_id, count(*) AS n_hit,
      |         sum(1.0 / log2(ap.arn + 1)) AS dcg,
      |         min(CASE WHEN tr.trn = 1 THEN ap.arn END) AS rank1
      |  FROM tr JOIN ap USING (query_id, neighbor_id)
      |  GROUP BY tr.query_id)
      |SELECT i.query_id,
      |       round(coalesce(h.n_hit, 0) / i.n_truth, 6) AS recall_k,
      |       round(coalesce(1.0 / h.rank1, 0.0), 6) AS mrr,
      |       round(coalesce(h.dcg, 0.0) / i.idcg, 6) AS ndcg
      |FROM ideal i LEFT JOIN hits h USING (query_id)""".stripMargin

  /** q172 — IVF INDEX HEALTH ([[Similarity.ivfCellStats]]): per-cell
    * population, load ratio vs the uniform ideal, and mean round-4
    * cosine distortion to the home centroid, over q65's 32-cell
    * quantizer — the rebalance/retrain signal behind the √n growth
    * rule. Empty cells kept with n_vecs = 0. The oracle replays the
    * native descent's home-cell assignment (cos desc, cell asc — the
    * q65-validated tie rule) and the same aggregate algebra. */
  private def q172(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = e.filter(col("vec_id") < 32).orderBy("vec_id")
      .collect().map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toSeq)).toSeq
    Similarity.ivfCellStats(e, cents)
  }

  private val q172Sql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |p AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < 32),
      |scored AS (
      |  SELECT e.vec_id, p.pid, ${cosSql("e.v", "p.pv")} AS cs
      |  FROM e CROSS JOIN p),
      |home AS (
      |  SELECT vec_id, pid AS cell, cs FROM (
      |    SELECT vec_id, pid, cs,
      |           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, pid) AS arn
      |    FROM scored) x WHERE arn = 1),
      |tot AS (SELECT count(*) AS n_total FROM e),
      |st AS (
      |  SELECT cell, count(*) AS nv, round(avg(1 - cs), 6) AS mean_distortion
      |  FROM home GROUP BY cell)
      |SELECT p.pid AS cell, coalesce(st.nv, 0) AS n_vecs,
      |       round(coalesce(st.nv, 0) * 32 / tot.n_total, 6) AS load_ratio,
      |       st.mean_distortion
      |FROM p CROSS JOIN tot LEFT JOIN st ON st.cell = p.pid""".stripMargin

  /** q176 — INCREMENTAL EMBEDDING REFRESH ([[graft.pipeline.Snapshot
    * .incrementalRefresh]] over [[Similarity.embedDocs]]): q173's
    * snapshot diff drives the update — unchanged docs carry their v1
    * vectors forward, added/changed docs re-embed, removed docs drop.
    * The oracle computes the FULL rebuild over v2 directly (q141's
    * CTEs rebased onto the mutated snapshot), so the hash check IS the
    * refresh ≡ rebuild invariant: the incremental path must reproduce
    * recomputing everything, bit for bit, while touching only the
    * ~15% changed fraction. */
  private def q176(s: SparkSession, dir: String): DataFrame = {
    val v1 = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val v2 = TextQueries.snapshotV2(v1)
    val oldVecs = Similarity.embedDocs(v1, "doc_id", "text")
    val diff = graft.pipeline.Snapshot.snapshotDiff(v1, v2, "doc_id", "text")
    graft.pipeline.Snapshot.incrementalRefresh(diff, oldVecs, v2)(
        w => Similarity.embedDocs(w, "doc_id", "text"))
      .select(col("doc_id"), posexplode(col("v")).as(Seq("j", "ev")))
      .select(col("doc_id"), col("j").cast("long").as("j"),
              col("ev").cast("long").as("ev"))
  }

  private val q176Sql =
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
      |${TextQueries.snapshotV2Cte},
      |${embCtes.replace("FROM documents", "FROM v2")}
      |SELECT doc_id, CAST(j AS BIGINT) AS j, ev FROM epj""".stripMargin

  /** q262 — Matryoshka truncation eval
    * ([[Similarity.matryoshkaEval]]): top-5 overlap between the
    * full-64-dim exact ranking and prefix-truncated rankings at
    * d ∈ {8, 16, 32} for query vectors 0-7 — the serve-smaller
    * memory/quality trade, measured exactly. The oracle recomputes
    * each rung's brute-force ranking over sliced lists and counts the
    * intersections (zero-overlap queries keep an explicit 0 row). */
  private def q262(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Similarity.matryoshkaEval(
      emb(s, dir), col("vec_id") < 8, k = 5, prefixDims = Seq(8, 16, 32))

  private val q262Sql = {
    def dotd(a: String, b: String, d: Int) =
      s"list_sum(list_transform(generate_series(1, $d), i -> $a[i] * $b[i]))"
    def cosd(av: String, bv: String, d: Int) =
      s"round(${dotd(av, bv, d)} / (sqrt(${dotd(av, av, d)}) * sqrt(${dotd(bv, bv, d)})), 4)"
    def topk(d: Int, name: String) =
      s"""$name AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
        |           row_number() OVER (
        |             PARTITION BY a.vec_id
        |             ORDER BY ${cosd("a.v", "b.v", d)} DESC, b.vec_id) AS rn
        |    FROM e a JOIN e b ON a.vec_id < 8 AND b.vec_id <> a.vec_id)
        |  WHERE rn <= 5)""".stripMargin
    val rungs = Seq(8, 16, 32).map { d =>
      s"""SELECT q.query_id, CAST($d AS BIGINT) AS dims,
        |  CAST(COALESCE((SELECT count(*) FROM top$d t
        |                 JOIN full_t f ON f.query_id = t.query_id
        |                              AND f.neighbor_id = t.neighbor_id
        |                 WHERE t.query_id = q.query_id), 0) AS BIGINT)
        |    AS n_overlap
        |FROM qs q""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
      |           FROM embeddings),
      |${topk(64, "full_t")},
      |${topk(8, "top8")},
      |${topk(16, "top16")},
      |${topk(32, "top32")},
      |qs AS (SELECT DISTINCT query_id FROM full_t)
      |$rungs""".stripMargin
  }

  /** q282 — simplified silhouette
    * ([[graft.pipeline.ClusterEval.simplifiedSilhouette]]): cluster
    * quality of the embeddings table's given labels — per point
    * (b − a)/max(a, b) against integer-milli-grid centroids, exact
    * squared distances, e6-rounded before the per-cluster mean. */
  private def q282(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.ClusterEval.simplifiedSilhouette(
      t(s, dir, "embeddings"), "vec_id", "label", "embedding")

  private val q282Sql =
    """WITH pts AS (
      |  SELECT vec_id AS id, label AS lbl, gs.i AS i,
      |    CAST(round(v[gs.i] * 1000) AS BIGINT) AS q
      |  FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      |        FROM embeddings) e,
      |       LATERAL (SELECT unnest(generate_series(1, 64)) AS i) gs),
      |cent AS (SELECT lbl AS cl, i,
      |    CAST(sum(q) AS BIGINT) // CAST(count(*) AS BIGINT) AS c
      |  FROM pts GROUP BY 1, 2),
      |d2 AS (SELECT id, lbl, cl,
      |    CAST(sum((q - c) * (q - c)) AS BIGINT) AS d2
      |  FROM pts JOIN cent USING (i) GROUP BY 1, 2, 3),
      |ab AS (SELECT id, lbl,
      |    max(CASE WHEN cl = lbl THEN d2 END) AS a2,
      |    min(CASE WHEN cl <> lbl THEN d2 END) AS b2
      |  FROM d2 GROUP BY 1, 2),
      |sil AS (SELECT id, lbl,
      |    CASE WHEN greatest(a2, b2) = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round((sqrt(b2) - sqrt(a2))
      |        / greatest(sqrt(a2), sqrt(b2)) * 1000000.0) AS BIGINT)
      |    END AS s_e6
      |  FROM ab)
      |SELECT lbl AS label, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(s_e6) AS BIGINT) // CAST(count(*) AS BIGINT)
      |    AS mean_sil_e6,
      |  min(s_e6) AS min_sil_e6, max(s_e6) AS max_sil_e6
      |FROM sil GROUP BY 1""".stripMargin

  /** q300 — top principal component ([[graft.stats.Pca
    * .topComponent]]) of the leading 8 embedding dims: the
    * "are these vectors collapsed onto one direction" diagnostic.
    * The oracle replays the exact e3 quantization, the centered
    * integer Gram n·Σvv − ss, and all 10 power iterations on the
    * e6 grid (HUGEINT throughout), then the same sign rule and
    * Rayleigh share. */
  private def q300(s: SparkSession, dir: String): DataFrame =
    graft.stats.Pca.topComponent(
      t(s, dir, "embeddings").select(col("embedding")),
      "embedding", dims = 8, iters = 10)

  private val q300Sql: String = {
    val iters = 10
    val chain = (1 to iters).map { r =>
      s"""w$r AS MATERIALIZED (SELECT gc.i, sum(gc.g * v${r - 1}.v) AS w
         |       FROM gc JOIN v${r - 1} ON v${r - 1}.i = gc.j GROUP BY 1),
         |m$r AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w$r),
         |v$r AS MATERIALIZED (SELECT i, CASE WHEN m = 0 THEN w
         |                       ELSE w * 1000000 // m END AS v
         |        FROM w$r CROSS JOIN m$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS MATERIALIZED (
       |  SELECT vec_id, CAST(i AS BIGINT) AS i,
       |    CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000)
       |         AS BIGINT) AS v
       |  FROM embeddings CROSS JOIN generate_series(1, 8) AS t(i)),
       |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n FROM embeddings),
       |sv AS (SELECT i, CAST(sum(v) AS HUGEINT) AS s FROM ev GROUP BY 1),
       |gr AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
       |         sum(CAST(a.v AS HUGEINT) * b.v) AS g
       |       FROM ev a JOIN ev b USING (vec_id) GROUP BY 1, 2),
       |gc AS MATERIALIZED (SELECT gr.i, gr.j, nn.n * gr.g - sa.s * sb.s AS g
       |       FROM gr CROSS JOIN nn
       |       JOIN sv sa ON sa.i = gr.i JOIN sv sb ON sb.i = gr.j),
       |v0 AS MATERIALIZED (SELECT CAST(i AS BIGINT) AS i,
       |              CAST(999999 + i AS HUGEINT) AS v
       |       FROM generate_series(1, 8) AS t(i)),
       |$chain,
       |sg AS (SELECT CASE WHEN (SELECT v FROM v$iters
       |                         ORDER BY abs(v) DESC, i ASC LIMIT 1) < 0
       |              THEN -1 ELSE 1 END AS sg),
       |vf AS (SELECT i, v * sg AS v FROM v$iters CROSS JOIN sg),
       |ray AS (SELECT sum(a.v * gc.g * b.v) AS num
       |        FROM gc JOIN vf a ON a.i = gc.i JOIN vf b ON b.i = gc.j),
       |dn AS (SELECT sum(v * v) AS den FROM vf),
       |tc AS (SELECT sum(g) AS t FROM gc WHERE i = j)
       |SELECT CAST(vf.i - 1 AS BIGINT) AS dim_idx,
       |  CAST(vf.v AS BIGINT) AS loading_e6,
       |  CAST(CASE WHEN den = 0 OR t = 0 THEN 0
       |            ELSE num * 1000000 // (den * t) END AS BIGINT) AS share_e6
       |FROM vf CROSS JOIN ray CROSS JOIN dn CROSS JOIN tc""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q300_pca_top_component", q300, Some(q300Sql)),
    QueryDef("q282_silhouette", q282, Some(q282Sql)),
    QueryDef("q262_matryoshka_eval", q262, Some(q262Sql)),
    QueryDef("q171_rank_eval", q171, Some(q171Sql)),
    QueryDef("q176_incremental_embed", q176, Some(q176Sql)),
    QueryDef("q172_ivf_cell_stats", q172, Some(q172Sql)),
    QueryDef("q59_cosine_topk", q59, Some(q59Sql)),
    QueryDef("q108_semantic_dedup", q108, Some(q108Sql)),
    QueryDef("q164_contrastive_pairs", q164, Some(q164Sql)),
    QueryDef("q141_embed_docs", q141, Some(q141Sql)),
    QueryDef("q142_text_semantic_dedup", q142, Some(q142Sql)),
    QueryDef("q143_kmeans_clusters", q143, Some(q143Sql)),
    QueryDef("q144_cluster_sample", q144, Some(q144Sql)),
    QueryDef("q146_hybrid_rrf", q146, Some(q146Sql)),
    QueryDef("q148_cluster_keywords", q148, Some(q148Sql)),
    QueryDef("q149_cluster_outliers", q149, Some(q149Sql)),
    QueryDef("q152_semantic_contamination", q152, Some(q152Sql)),
    QueryDef("q154_topic_resample", q154, Some(q154Sql)),
    QueryDef("q156_diversified_topk", q156, Some(q156Sql)),
    QueryDef("q79_sq8_topk", q79, Some(q79Sql)),
    QueryDef("q60_lsh_ann", q60, Some(q60Sql)),
    QueryDef("q64_embedding_neardup", q64, Some(q64Sql)),
    QueryDef("q65_ivf_ann", q65, Some(q65Sql)),
    QueryDef("q70_ivf_hier_ann", q70, Some(q70Sql)),
    QueryDef("q74_ivf_tree_ann", q74, Some(q74Sql)),
    QueryDef("q86_ivf_ann_frames", q86, Some(q65Sql)),
    QueryDef("q87_ivf_hier_frames", q87, Some(q70Sql)),
    QueryDef("q88_ivf_tree_frames", q88, Some(q74Sql)),
    QueryDef("q89_pq_topk", q89, Some(q89Sql)),
    QueryDef("q93_pq_refine", q93, Some(q93Sql)),
    QueryDef("q100_jl_project", q100, Some(q100Sql)),
    QueryDef("q101_jl_topk_refine", q101, Some(q101Sql))
  )
}
