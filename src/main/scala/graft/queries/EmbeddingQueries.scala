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

  private val q65Sql =
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
      |SELECT query_id, neighbor_id, cell, cos, rn FROM ranked WHERE rn <= 3""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q59_cosine_topk", q59, Some(q59Sql)),
    QueryDef("q60_lsh_ann", q60, Some(q60Sql)),
    QueryDef("q64_embedding_neardup", q64, Some(q64Sql)),
    QueryDef("q65_ivf_ann", q65, Some(q65Sql))
  )
}
