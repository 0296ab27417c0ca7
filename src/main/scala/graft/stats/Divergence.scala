package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise Jensen–Shannon divergence between per-key categorical
  * count distributions — the SYMMETRIC, bounded (0 … ln 2) member of
  * the drift family: PSI (q245) needs a designated baseline and
  * explodes on empty buckets; JSD compares any two sources on equal
  * footing and is finite by construction (every term conditions on
  * the mixture m = (p+q)/2 &gt; 0), which is exactly what a
  * which-feeds-diverge matrix over a corpus wants.
  *
  * Exactness: counts and totals are exact; each category's
  * contribution ½p·ln(p/m) + ½q·ln(q/m) is ONE fixed double tree
  * e6-rounded BEFORE the sum (the q230/q246 float-sum discipline —
  * the total is an exact integer sum of per-category longs, so
  * summation order cannot touch the hash). 0·ln 0 = 0 by the
  * standard convention (a term absent from one side contributes only
  * the other side's half).
  *
  * Scale shape: the category grid is vocabulary-sized and rides
  * keyed joins (never broadcast); the KEY pair grid is the caller's
  * contract (sources/feeds — bounded, documented at the call site).
  * Corpus rows are touched once to count; everything after is
  * grid-sized. */
object Divergence {

  /** @param counts (key, category, count) rows, count &gt; 0
    * @return per unordered key pair (a &lt; b): (key_a, key_b,
    *         n_terms, jsd_e6) — n_terms the union-of-support size */
  def jensenShannon(counts: DataFrame, keyCol: String, catCol: String,
                    cntCol: String): DataFrame = {
    val c = counts.select(col(keyCol).as("k"), col(catCol).as("cat"),
                          col(cntCol).cast("long").as("c"))
    val tot = c.groupBy(col("k")).agg(sum(col("c")).as("n"))
    val keys = tot.select(col("k"), col("n"))
    val pairs = keys.select(col("k").as("ka"), col("n").as("na"))
      .crossJoin(keys.select(col("k").as("kb"), col("n").as("nb")))
      .filter(col("ka") < col("kb"))
    // union of each pair's support: every category that either side
    // holds, with the other side zero-filled (keyed joins on the
    // category grid — vocabulary-sized, never broadcast)
    val support = c.select(col("k"), col("cat")).distinct()
    val grid = pairs
      .join(support.withColumnRenamed("k", "ka"), Seq("ka"))
      .select(col("ka"), col("kb"), col("na"), col("nb"), col("cat"))
      .unionByName(pairs
        .join(support.withColumnRenamed("k", "kb"), Seq("kb"))
        .select(col("ka"), col("kb"), col("na"), col("nb"), col("cat")))
      .distinct()
    val joined = grid
      .join(c.select(col("k").as("ka"), col("cat"), col("c").as("c_a")),
            Seq("ka", "cat"), "left")
      .join(c.select(col("k").as("kb"), col("cat"), col("c").as("c_b")),
            Seq("kb", "cat"), "left")
      .withColumn("c_a", coalesce(col("c_a"), lit(0L)))
      .withColumn("c_b", coalesce(col("c_b"), lit(0L)))
    val pa = col("c_a").cast("double") / col("na").cast("double")
    val pb = col("c_b").cast("double") / col("nb").cast("double")
    val m = (pa + pb) / lit(2.0)
    val term =
      when(col("c_a") > 0L, pa * log(pa / m)).otherwise(lit(0.0)) / 2.0 +
      when(col("c_b") > 0L, pb * log(pb / m)).otherwise(lit(0.0)) / 2.0
    joined
      .withColumn("term_e6", round(term * 1e6).cast("long"))
      .groupBy(col("ka"), col("kb"))
      .agg(count(lit(1)).as("n_terms"), sum(col("term_e6")).as("jsd_e6"))
      .select(col("ka").as(s"${keyCol}_a"), col("kb").as(s"${keyCol}_b"),
              col("n_terms"), col("jsd_e6"))
  }
}
