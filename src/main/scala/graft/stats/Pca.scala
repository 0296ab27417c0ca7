package graft.stats

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top-principal-component extraction over an embedding column — the
  * eigen-analysis member of the Gram-aggregation family
  * ([[Ridge]] solves X'X for regression; this powers-iterates it):
  * which single direction carries the most variance of a vector
  * corpus, the diagnostic behind "are these embeddings collapsed"
  * and the seed of any PCA-whitening step.
  *
  * Exactness: components e3-quantized once per value, the CENTERED
  * Gram computed exactly as n·Σv_iv_j − Σv_i·Σv_j (decimal(38)
  * sums — no float mean ever subtracted), and the power iteration
  * runs on the INTEGER e6 grid (w = G·v in BigInt, renormalized to
  * max|w| = 1e6 by truncating division) — every iterate is exactly
  * replayable, so the oracle unrolls the same iterations in SQL and
  * the result hash-matches bit for bit.
  *
  * Scale shape: ONE aggregate pass over the corpus computes all
  * d(d+1)/2 + d + 1 sums with map-side partial aggregation (d is
  * config, ≤ 16 enforced — the [[Ridge]] contract); the driver holds
  * only the d×d Gram (the k-means/Ridge precedent) and the d-vector
  * iterate. Corpus rows are touched exactly once. */
object Pca {

  /** @param vecs frame with an array&lt;float/double&gt; column; must
    *        be non-empty and every vector at least `dims` wide —
    *        both rejected with an explicit IllegalArgumentException
    *        (empty input has no principal direction; a short vector
    *        would silently null out a Gram cell)
    * @param dims leading components entering the analysis (config,
    *        ≤ 16)
    * @param iters power-iteration count (config)
    * @return one row per dim: (dim_idx, loading_e6, share_e6) —
    *         loading the final normalized iterate (max |entry| =
    *         1e6, sign fixed so the largest-|loading| entry is
    *         positive), share the Rayleigh quotient over the Gram
    *         trace in micro units */
  def topComponent(vecs: DataFrame, vecCol: String, dims: Int,
                   iters: Int): DataFrame = {
    require(dims >= 2 && dims <= 16, "dims is config-bounded (2..16)")
    require(iters >= 1 && iters <= 64, "iters is config-bounded (1..64)")
    val spark = vecs.sparkSession
    // `get` (not `element_at`): out-of-bounds yields null instead of
    // an ANSI array-index error, so a short vector reaches the
    // explicit min-width check below rather than dying mid-aggregate
    val q = (0 until dims).map(i =>
      round(get(col(vecCol), lit(i)).cast("double") * 1000.0)
        .cast("long").as(s"v$i"))
    val proj = vecs.select(size(col(vecCol)).as("__w") +: q: _*)
    val sums =
      Seq(count(lit(1)).as("n"), min(col("__w")).as("min_w")) ++
      (0 until dims).map(i => sum(col(s"v$i")).as(s"s$i")) ++
      (for { i <- 0 until dims; j <- i until dims } yield
        sum(col(s"v$i").cast("decimal(38,0)") * col(s"v$j"))
          .as(s"g_${i}_$j"))
    val row = proj.agg(sums.head, sums.tail: _*).collect().head
    // fail fast, same aggregate pass: an empty corpus has no
    // principal direction (the sums are null — previously an opaque
    // driver NPE), and one sub-`dims` vector would silently null a
    // Gram cell out of its sum
    if (row.getAs[Long]("n") == 0L)
      throw new IllegalArgumentException(
        "Pca.topComponent: empty input — no principal direction")
    if (row.getAs[Int]("min_w") < dims)
      throw new IllegalArgumentException(
        s"Pca.topComponent: vector narrower than dims=$dims " +
          s"(min width ${row.getAs[Int]("min_w")})")
    val n = BigInt(row.getAs[Long]("n"))
    val s = (0 until dims).map(i => BigInt(row.getAs[Long](s"s$i")))
    val gc = Array.tabulate(dims, dims) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      n * BigInt(row.getAs[java.math.BigDecimal](s"g_${a}_$b")
        .toBigInteger) - s(i) * s(j)
    }
    val e6 = BigInt(1000000)
    // deterministic ASYMMETRIC start (1e6, 1e6+1, …): an all-ones
    // start can be exactly orthogonal to the top eigenvector (e.g. a
    // perfectly anti-correlated pair), and integer arithmetic has no
    // rounding noise to escape the stall the way float iteration does
    var v = Array.tabulate(dims)(i => e6 + i)
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => gc(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = if (m == 0) w else w.map(_ * e6 / m)
    }
    // deterministic sign: the largest-|entry| (lowest index on ties)
    // points positive
    val lead = (0 until dims).maxBy(i => (v(i).abs, BigInt(-i)))
    if (v(lead) < 0) v = v.map(-_)
    val num = (for { i <- 0 until dims; j <- 0 until dims }
      yield v(i) * gc(i)(j) * v(j)).sum
    val den = v.map(x => x * x).sum
    val trace = (0 until dims).map(i => gc(i)(i)).sum
    val share = if (den == 0 || trace == 0) 0L
      else (num * e6 / (den * trace)).toLong
    import spark.implicits._
    (0 until dims).map(i => (i.toLong, v(i).toLong, share))
      .toDF("dim_idx", "loading_e6", "share_e6")
  }
}
