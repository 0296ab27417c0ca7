package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Paired / blocked rank tests — the WITHIN-subject complement of the
  * independent-sample family in [[Hypothesis]]: the Wilcoxon
  * signed-rank test reads a location shift off paired differences
  * (the non-parametric paired t-test), the exact sign test is its
  * assumption-free little sibling (direction only — valid under ANY
  * symmetric-or-not noise), and the Quade test extends the pairing to
  * k treatments with block weighting (the range-weighted Friedman,
  * more powerful when blocks differ in spread).
  *
  * The reference computes nothing like these (its correlations are
  * Pearson over aligned frames, `app.py:220-228`); they are the
  * experiment-readout tier a training-data pipeline needs when the
  * same units (days, cohorts, documents) are measured under two or
  * more conditions.
  *
  * Exactness follows the house ledger rule: ranks are DOUBLED
  * midranks over a distinct-value grid (integers even under ties),
  * tie corrections are Σ(t³−t) longs, and each statistic is one
  * fixed double tree over exact integer aggregates — so a DuckDB
  * oracle replays every step bit-for-bit. */
object PairedRank {

  /** Wilcoxon signed-rank test per group over paired differences.
    *
    * Zero differences are dropped (the standard Wilcoxon convention;
    * engine and oracle agree on the kept set by construction). Ranks
    * of |d| are doubled midranks over the per-group distinct-|d|
    * grid — [[graft.scale.GridPrefix.groupedPrefixSums]], so the
    * ranking is a distributed prefix, never a one-task sort. With
    * W2⁺ = Σ_{d>0} 2·midrank(|d|):
    *
    *   E[W2⁺] = n(n+1)/2,
    *   Var[W2⁺] = 4·Var[W⁺] = n(n+1)(2n+1)/6 − Σ(t³−t)/12,
    *   z = (W2⁺ − E)/√Var
    *
    * — every ingredient an exact integer (the n³ products ride
    * decimal(38,0), the [[Hypothesis.jonckheereTerpstra]] overflow
    * rule), z one double tree, e6-rounded.
    *
    * @param obs (group, d) rows; d an exact integer difference
    *            (cents) — build it upstream as the paired delta
    * @return per group: (group, n_pairs, w2_plus, tiesum, z_e6) —
    *         z null when no nonzero pairs or all |d| tied to one
    *         value (variance 0) */
  def wilcoxonSignedRank(obs: DataFrame, groupCol: String,
                         dCol: String): DataFrame = {
    val g = obs
      .select(col(groupCol).as("grp"), col(dCol).cast("long").as("d"))
      .where(col("d") =!= 0L)
      .groupBy(col("grp"), abs(col("d")).as("u"))
      .agg(sum(when(col("d") > 0L, 1L).otherwise(0L)).as("cpos"),
           count(lit(1)).as("c"))
    val ranked = graft.scale.GridPrefix.groupedPrefixSums(g, "grp", "u",
        Seq("c"))
      .withColumn("r2", lit(2L) * col("cum_before_c") + col("c") + 1L)
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val agg = ranked.groupBy(col("grp"))
      .agg(sum(col("c")).as("n"),
           sum(col("cpos") * col("r2")).as("w2"),
           sum(col("c").cast(d38) * col("c") * col("c") - col("c"))
             .cast("long").as("tiesum"))
    val nD = col("n").cast("double")
    val varW2 = nD * (nD + 1.0) * (lit(2.0) * nD + 1.0) / 6.0 -
      col("tiesum").cast("double") / 12.0
    val z = (col("w2").cast("double") -
      nD * (nD + 1.0) / 2.0) / sqrt(varW2)
    agg.select(col("grp").as(groupCol), col("n").as("n_pairs"),
      col("w2").as("w2_plus"), col("tiesum"),
      when(varW2 <= 0.0, lit(null).cast("long"))
        .otherwise(round(z * 1e6).cast("long")).as("z_e6"))
  }

  /** Exact two-sided sign test per group — the assumption-free paired
    * test: under H₀ each nonzero difference is ±1 with probability
    * 1/2, so p = min(1, 2·P(Bin(n,1/2) ≤ min(s, n−s))) is an EXACT
    * RATIONAL num/2ⁿ — no normal approximation, no transcendental
    * function, and therefore replayable by an integer-only oracle
    * (the binomial prefix Σ C(n,k) runs in BigInt engine-side and a
    * HUGEINT recursive CTE oracle-side; C(n,k) = C(n,k−1)·(n−k+1)/k
    * is exact integer division at every step).
    *
    * p_e6 = (num·10⁶) div 2ⁿ — the quantization itself is a
    * truncating integer division, identical in both engines.
    *
    * Scale contract: the per-group fold is O(n) driver-free work in
    * the aggregate, but the ORACLE's HUGEINT is 128-bit, so p is
    * emitted null for n > 120 (2¹²⁰·10⁶ is the replayable ceiling;
    * the calendar grids that feed this — months, weeks — sit far
    * below it).
    *
    * @param obs (group, d) rows; d an exact integer difference
    * @return per group: (group, n_nonzero, n_pos, p_e6) */
  def signTestExact(obs: DataFrame, groupCol: String,
                    dCol: String): DataFrame = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.select(col(groupCol).cast("string").as("grp"),
               col(dCol).cast("long").as("d"))
      .where(col("d") =!= 0L)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        var n = 0L
        var s = 0L
        it.foreach { case (_, d) => n += 1; if (d > 0) s += 1 }
        (key, n, s, binomPE6(n, s))
      }
      .toDF(groupCol, "n_nonzero", "n_pos", "p_e6")
  }

  /** Exact two-sided sign-test p on the e6 grid:
    * p_e6 = min(2ⁿ, 2·Σ_{k≤min(s,n−s)} C(n,k))·10⁶ div 2ⁿ — BigInt
    * binomial prefix with exact integer division at every step
    * (C(n,k) = C(n,k−1)·(n−k+1)/k). None above n = 120, the oracle's
    * HUGEINT replay ceiling (see [[signTestExact]]). */
  private[stats] def binomPE6(n: Long, s: Long): Option[Long] =
    if (n > 120) None
    else {
      val m = math.min(s, n - s)
      var c = BigInt(1)          // C(n,0)
      var tail = BigInt(1)
      var k = 1L
      while (k <= m) {
        c = c * (n - k + 1) / k  // exact at every step
        tail += c
        k += 1
      }
      val num = (tail * 2).min(BigInt(1) << n.toInt)
      Some((num * 1000000 / (BigInt(1) << n.toInt)).toLong)
    }

  /** Quade test — the range-weighted Friedman: k treatments measured
    * on the same n blocks, with each block's within-block ranks
    * weighted by the rank of the block's RANGE (max−min), so blocks
    * that discriminate more count more (Quade 1979; reduces to the
    * sign test at k = 2).
    *
    * Doubled-midrank ledger: R2 = within-block doubled midranks of y
    * (a k-row frame per block — config-small), Q2 = doubled midranks
    * of the block ranges ACROSS blocks (grid prefix over the range
    * grid — n blocks can be calendar-many). The scaled score
    * S4 = Q2·(R2 − (k+1)) is 4·S exactly, and the statistic
    *
    *   F = (n−1)·ΣⱼS4ⱼ² / (n·Σᵢⱼ S4ᵢⱼ² − ΣⱼS4ⱼ²)
    *
    * is scale-invariant in the doubling — numerator and denominator
    * are exact decimal(38) integers, F one double division,
    * e6-rounded (null when the denominator ≤ 0: every block tied
    * everywhere).
    *
    * @param df (block, treatment, y) rows, one per cell; y exact
    *           integer (cents); missing cells are treated as absent
    *           (complete-block designs are the contract, as Friedman)
    * @return per treatment: (treatment, s4_j, n_blocks, k, f_e6) —
    *         the per-treatment decomposition with the global F
    *         broadcast (the q235/q258 output convention) */
  def quadeTest(df: DataFrame, blockCol: String, treatCol: String,
                yCol: String): DataFrame = {
    val rows = df.select(col(blockCol).as("b"), col(treatCol).as("t"),
                         col(yCol).cast("long").as("y"))
    // within-block doubled midranks: the window partitions are ONE
    // block's k treatment rows — config-small, never data-wide
    // (rangeBetween(-∞,-1) over the y ORDER is the strict <y count)
    val wLt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b")).orderBy(col("y"))
      .rangeBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val wEq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b"), col("y"))
    val ranked = rows
      .withColumn("lt", coalesce(count(lit(1)).over(wLt), lit(0L)))
      .withColumn("eq", count(lit(1)).over(wEq))
      .withColumn("r2", lit(2L) * col("lt") + col("eq") + 1L)
    // block ranges, ranked across blocks on the distributed grid
    val ranges = rows.groupBy(col("b"))
      .agg((max(col("y")) - min(col("y"))).as("rng"))
    val rgrid = ranges.groupBy(col("rng")).agg(count(lit(1)).as("c"))
    val q2 = graft.scale.GridPrefix.prefixSums(rgrid, "rng", "c")
      .withColumn("q2", lit(2L) * col("cum_before") + col("c") + 1L)
      .select(col("rng"), col("q2"))
    val kCount = rows.agg(countDistinct(col("t")).as("k"))
    val scored = ranked
      .join(ranges.join(q2, Seq("rng")).select(col("b"), col("q2")), Seq("b"))
      .crossJoin(broadcast(kCount))
      .withColumn("s4", col("q2") * (col("r2") - (col("k") + 1L)))
    val d38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val perT = scored.groupBy(col("t"))
      .agg(sum(col("s4")).as("s4_j"),
           sum(col("s4").cast(d38) * col("s4")).as("sq_ij"),
           first(col("k")).as("k"))
    val glob = perT.agg(sum(col("s4_j").cast(d38) * col("s4_j")).as("sb"),
                        sum(col("sq_ij")).as("sa"))
    val nB = ranges.agg(count(lit(1)).as("n_blocks"))
    val den = (col("n_blocks").cast(d38) * col("sa") - col("sb"))
      .cast("double")
    val f = (col("n_blocks") - 1L).cast("double") *
      col("sb").cast("double") / den
    perT.crossJoin(broadcast(glob.crossJoin(nB)))
      .select(col("t").as(treatCol), col("s4_j"), col("n_blocks"),
        col("k"),
        when(den <= 0.0, lit(null).cast("long"))
          .otherwise(round(f * 1e6).cast("long")).as("f_e6"))
  }
}
