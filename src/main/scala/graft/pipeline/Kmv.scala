package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch — the set sketch that can
  * do what HLL ([[CorpusSketch]]) cannot: INTERSECTION estimates.
  * Keeping the k smallest distinct hash values of a set makes the
  * k-th smallest an order statistic of a uniform sample, giving the
  * classic estimator D̂ = (k−1)·M/h₍k₎ (Bar-Yossef et al. 2002); and
  * because min-k sketches are composable, the k smallest of A∪B plus
  * membership flags against A's and B's sketches estimate Jaccard and
  * thereby |A∩B| — the audience-overlap / cross-source-overlap
  * primitive.
  *
  * Hashing rides the repo's portable 60-bit md5 prefix
  * ([[CorpusSketch.h60]]) so a DuckDB oracle replays every hash, rank
  * and estimate bit-for-bit.
  *
  * Scale shape: the per-set min-k is TWO-LEVEL — a keyed window per
  * (set, hash-bucket) keeps k per bucket (the per-set distinct grid
  * never sorts in one task), then a keyed window over the surviving
  * ≤ buckets·k rows takes the global k. Pair overlap joins sketch
  * rows only (k-bounded per set), never corpus rows; the pair frame
  * is set-count², which is the sketch contract (sets are groups —
  * sources, arms, priorities — not documents). */
object Kmv {

  /** Per-set KMV sketch rows.
    * @return (set, h, rk) — the k smallest distinct 60-bit member
    *         hashes per set, ranked ascending from 1 */
  def sketch(df: DataFrame, setCol: String, memberCol: String, k: Int,
             salt: String = "kmv", buckets: Int = 32): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val hashed = df
      .select(col(setCol).as("s"),
              CorpusSketch.h60(col(memberCol).cast("string"), salt).as("h"))
      .distinct()
      .withColumn("b", pmod(col("h"), lit(buckets.toLong)))
    val wLocal = Window.partitionBy(col("s"), col("b")).orderBy(col("h"))
    val local = hashed
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= k)
    val wGlobal = Window.partitionBy(col("s")).orderBy(col("h"))
    local
      .withColumn("rk", row_number().over(wGlobal))
      .filter(col("rk") <= k)
      .select(col("s"), col("h"), col("rk").cast("long").as("rk"))
  }

  private[graft] val M = 1152921504606846976.0 // 2^60, the hash-space size

  /** Distinct-count estimate per set: D̂ = (k−1)·M/h₍k₎ when the
    * sketch is full, else the sketch size itself (it IS the set).
    * @return (set, n_sketch, kth_h, est) */
  def estimate(sk: DataFrame, k: Int): DataFrame =
    sk.groupBy(col("s"))
      .agg(count(lit(1)).as("n_sketch"), max(col("h")).as("kth_h"))
      .select(col("s"), col("n_sketch"), col("kth_h"),
        when(col("n_sketch") < k, col("n_sketch").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * M / col("kth_h"), 6))
          .as("est"))

  /** Pairwise overlap estimates from sketch rows: for every set pair
    * (a < b), the k smallest of the COMBINED sketch hashes vote on
    * Jaccard (a combined hash present in both sketches is a match),
    * and |A∩B| ≈ Ĵ · union-estimate.
    * @return (set_a, set_b, k_used, matches, jaccard_e6, union_est,
    *         inter_est) */
  def pairOverlap(sk: DataFrame, k: Int): DataFrame = {
    val a = sk.select(col("s").as("set_a"), col("h"))
    val b = sk.select(col("s").as("set_b"), col("h"))
    // all set pairs (a < b) — set-count² by contract (see Scaladoc);
    // zero-overlap pairs still get a union estimate and matches = 0
    val sets = sk.select(col("s")).distinct()
    val onlyPairs = sets.select(col("s").as("set_a"))
      .crossJoin(sets.select(col("s").as("set_b")))
      .filter(col("set_a") < col("set_b"))
    // every (pair, h) from either side — join each side's rows to the
    // pair list (sketch-bounded: |pairs| * k rows per side)
    val fromA = onlyPairs.join(a, Seq("set_a"))
      .select(col("set_a"), col("set_b"), col("h"), lit(1L).as("in_a"),
              lit(0L).as("in_b"))
    val fromB = onlyPairs.join(b, Seq("set_b"))
      .select(col("set_a"), col("set_b"), col("h"), lit(0L).as("in_a"),
              lit(1L).as("in_b"))
    val combined = fromA.unionByName(fromB)
      .groupBy(col("set_a"), col("set_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val wPair = Window.partitionBy(col("set_a"), col("set_b"))
      .orderBy(col("h"))
    val ranked = combined
      .withColumn("rk", row_number().over(wPair))
      .filter(col("rk") <= k)
    ranked.groupBy(col("set_a"), col("set_b"))
      .agg(count(lit(1)).as("k_used"),
           sum(col("in_a") * col("in_b")).as("matches"),
           max(col("h")).as("kth_h"))
      .select(col("set_a"), col("set_b"), col("k_used"), col("matches"),
        expr("(matches * 1000000) div k_used").as("jaccard_e6"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * M / col("kth_h"), 6))
          .as("union_est"),
        round((col("matches").cast("double") / col("k_used")) *
          when(col("k_used") < k, col("k_used").cast("double"))
            .otherwise(round(lit((k - 1).toDouble) * M / col("kth_h"), 6)),
          6).as("inter_est"))
  }
}
