package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank correlations per group — the monotone-association tests an
  * experiment readout runs when Pearson's linearity assumption is
  * exactly what's in question (does spend rank with frequency? does
  * quality score rank with human preference?).
  *
  * Both statistics ride the repo's value-grid discipline: ranks are
  * never assigned per row by a global sort — they decompose into
  * GRID-keyed prefix sums (doubled midranks stay exact integers, the
  * [[Hypothesis.mannWhitneyU]] trick) joined back to rows by value,
  * so every window is keyed by (group) over distinct values and every
  * join is value-keyed. Only the final correlation is a rounded
  * double computed in one fixed expression shape (deterministic IEEE
  * ops — the oracle's identical tree matches bit-for-bit). */
object RankCorr {

  /** Spearman's ρ with ties (Pearson on midranks). Doubled midranks
    * 2r(v) = 2·cum_<v + cnt(v) + 1 are exact longs per value-grid
    * cell; the five moment sums over rows are exact longs (taken in
    * DOUBLE only inside the final expression). One row per group:
    * (group, n, rho). */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"),
                         col(xCol).cast("long").as("x"),
                         col(yCol).cast("long").as("y"))
    // doubled midranks via the GROUPED distributed prefix: a single
    // group's value grid approaches corpus cardinality for
    // cents-valued metrics, so the per-group window must not be one
    // task (the exactNtile lesson, group-keyed). Both axes' grids are
    // FUSED into one tagged pass — one checkpoint + one shuffle chain
    // instead of two (measured ~1 s at sf0.1)
    val tagged = rows
      .select(col("grp"), lit(0).as("ax"), col("x").as("v"))
      .unionByName(rows.select(col("grp"), lit(1).as("ax"),
                               col("y").as("v")))
      .groupBy(col("grp"), col("ax"), col("v"))
      .agg(count(lit(1)).as("c"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
        tagged, Seq("ax", "grp"), "v", Seq("c"))
      .withColumn("r2", lit(2L) * col("cum_before_c") + col("c") + 1L)
    def midranks(axis: Int, vCol: String, out: String): DataFrame =
      pre.filter(col("ax") === axis)
        .select(col("grp"), col("v").as(vCol), col("r2").as(out))
    val withR = rows
      .join(midranks(0, "x", "rx2"), Seq("grp", "x"))
      .join(midranks(1, "y", "ry2"), Seq("grp", "y"))
    // moment sums in DECIMAL(38): rx2·ry2 ≤ (2n+1)², so 64-bit longs
    // overflow beyond ~10⁶ rows per group — decimal keeps the sums
    // exact at any group size (DuckDB's BIGINT product promotes to
    // HUGEINT, the same exact arithmetic)
    def dec(c: String) = col(c).cast("decimal(19,0)")
    val s = withR.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
           sum(dec("rx2")).as("sx"), sum(dec("ry2")).as("sy"),
           sum(dec("rx2") * dec("ry2")).as("sxy"),
           sum(dec("rx2") * dec("rx2")).as("sxx"),
           sum(dec("ry2") * dec("ry2")).as("syy"))
    def d(c: String) = col(c).cast("double")
    s.select(col("grp").as(groupCol), col("n"),
      round((d("n") * d("sxy") - d("sx") * d("sy")) /
            (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
             sqrt(d("n") * d("syy") - d("sy") * d("sy"))), 6).as("rho"))
  }

  /** Kendall's τ-b over a BOUNDED joint value grid. Concordant /
    * discordant / tie counts come from the joint (x, y) grid's cell
    * self-join per group — cost |grid|², which is what bounds this
    * operator: it is for ordinal / bucketed metrics (priority codes,
    * quantity bands, discount steps), NOT for continuous values
    * (bucket first — the [[graft.ts.EventAnalytics]] grid contract).
    * All pair counts are exact longs (row pairs counted once, i < j
    * by cell order); τ-b with the standard tie denominators is the
    * single rounded double. One row per group:
    * (group, n, nc, nd, tau_b). */
  def kendallTauB(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("grp"),
                      col(xCol).cast("long").as("x"),
                      col(yCol).cast("long").as("y"))
      .groupBy(col("grp"), col("x"), col("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // each unordered cell pair counted once via xa < xb; same-x pairs
    // are ties on x and contribute to neither nc nor nd
    val prod = g.select(col("grp"), col("x").as("xa"), col("y").as("ya"),
                        col("c").as("ca"))
      .join(g.select(col("grp"), col("x").as("xb"), col("y").as("yb"),
                     col("c").as("cb")), Seq("grp"))
      .filter(col("xa") < col("xb"))
    val byGrp = prod.groupBy(col("grp")).agg(
      sum(when(col("ya") < col("yb"), col("ca") * col("cb"))
            .otherwise(0L)).as("nc"),
      sum(when(col("ya") > col("yb"), col("ca") * col("cb"))
            .otherwise(0L)).as("nd"))
    val tx = g.groupBy(col("grp"), col("x"))
      .agg(sum(col("c")).as("t"))
      .groupBy(col("grp"))
      .agg(sum(expr("t * (t - 1) div 2")).as("tie_x"),
           sum(col("t")).as("n"))
    val ty = g.groupBy(col("grp"), col("y"))
      .agg(sum(col("c")).as("t"))
      .groupBy(col("grp"))
      .agg(sum(expr("t * (t - 1) div 2")).as("tie_y"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    byGrp.join(tx, Seq("grp")).join(ty, Seq("grp"))
      .withColumn("n0", expr("n * (n - 1) div 2"))
      .select(col("grp").as(groupCol), col("n"), col("nc"), col("nd"),
        round((d(col("nc")) - d(col("nd"))) /
              (sqrt(d(col("n0")) - d(col("tie_x"))) *
               sqrt(d(col("n0")) - d(col("tie_y")))), 6).as("tau_b"))
  }

  /** First-order partial correlation per group — "does x correlate
    * with y once z is held fixed": r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1 − r_xz²)(1 − r_yz²)), the one-confounder deconfounding
    * next to [[graft.stats.Hypothesis.mantelHaenszel]]'s categorical
    * version. A raw x–y correlation between two metrics both driven
    * by volume says nothing; the partial asks what is left.
    *
    * Quantized-contract exactness: the three pairwise Pearson r's
    * are computed from exact decimal(38) moment sums (n, Σx, Σx²,
    * Σxy, …) and e6-rounded FIRST; the partial is then one small
    * double tree over the three quantized integers — so the oracle
    * replays integers-in/one-tree-out rather than a deep float
    * expression. One corpus aggregate per group, no windows.
    *
    * @param df (group, x, y, z) rows; exact integer metrics
    * @return per group: (group, n, rxy_e6, rxz_e6, ryz_e6, pr_e6) —
    *         null pr when any pairwise r is null (zero variance) or
    *         |r_xz| or |r_yz| = 1 (degenerate denominator) */
  def partialCorr(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String, zCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val rows = df.select(col(groupCol).as("grp"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"),
      col(zCol).cast("long").as("z"))
    val a = rows.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("z")).as("sz"),
      sum(expr(s"CAST(x AS $d38) * x")).as("qx"),
      sum(expr(s"CAST(y AS $d38) * y")).as("qy"),
      sum(expr(s"CAST(z AS $d38) * z")).as("qz"),
      sum(expr(s"CAST(x AS $d38) * y")).as("pxy"),
      sum(expr(s"CAST(x AS $d38) * z")).as("pxz"),
      sum(expr(s"CAST(y AS $d38) * z")).as("pyz"))
    // pairwise r from exact moments: (n·Σab − Σa·Σb) /
    // (√(n·Σa²−Σa²̄)·√(n·Σb²−Σb²̄)) — numerator/radicands exact
    // decimals, one double division, e6-rounded
    def rE6(p: String, sa: String, sb: String, qa: String, qb: String) = {
      val numI = expr(s"CAST(n AS $d38) * $p - CAST($sa AS $d38) * $sb")
      val ra = expr(s"CAST(n AS $d38) * $qa - CAST($sa AS $d38) * $sa")
      val rb = expr(s"CAST(n AS $d38) * $qb - CAST($sb AS $d38) * $sb")
      when(ra <= lit(0L).cast("decimal(38,0)") ||
           rb <= lit(0L).cast("decimal(38,0)"), lit(null).cast("long"))
        .otherwise(round(numI.cast("double") /
          (sqrt(ra.cast("double")) * sqrt(rb.cast("double"))) * 1e6)
          .cast("long"))
    }
    val q = a
      .withColumn("rxy_e6", rE6("pxy", "sx", "sy", "qx", "qy"))
      .withColumn("rxz_e6", rE6("pxz", "sx", "sz", "qx", "qz"))
      .withColumn("ryz_e6", rE6("pyz", "sy", "sz", "qy", "qz"))
    // the partial over the QUANTIZED r's: integers in, one tree out
    val rxy = col("rxy_e6").cast("double") / 1e6
    val rxz = col("rxz_e6").cast("double") / 1e6
    val ryz = col("ryz_e6").cast("double") / 1e6
    val den = sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz))
    q.select(col("grp").as(groupCol), col("n"),
      col("rxy_e6"), col("rxz_e6"), col("ryz_e6"),
      when(col("rxy_e6").isNull || col("rxz_e6").isNull ||
           col("ryz_e6").isNull || den <= lit(0.0),
        lit(null).cast("long"))
        .otherwise(round((rxy - rxz * ryz) / den * 1e6).cast("long"))
        .as("pr_e6"))
  }
}
