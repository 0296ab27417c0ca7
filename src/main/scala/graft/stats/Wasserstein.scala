package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 1-D Wasserstein-1 (earth-mover) distance between group value
  * distributions — the drift metric that, unlike KS (q225, max CDF
  * gap), weighs HOW FAR mass moved: W₁ = ∫|F_A − F_B| dv, computed
  * exactly on a bucketed value grid as
  * Σ_cells |cumA·n_B − cumB·n_A| · Δv / (n_A·n_B) — the cross-
  * multiplied integer form (no per-cell division, no float drift in
  * the sum).
  *
  * Grid contract: values are floor-bucketed to `bucketWidth` (W₁ on
  * the bucketed distribution — resolution is a CONFIG, the bucketed
  * grid is domain/width-bounded, so the per-pair lead window is the
  * documented bounded-grid shape); cumulative counts still ride
  * [[graft.scale.GridPrefix.groupedPrefixSums]] keyed by PAIR, so
  * even a wide grid never sorts in one task. Cell terms are summed
  * in DECIMAL(38) (cum·n·Δv exceeds int64 at corpus scale); the
  * single final division is one rounded double.
  *
  * Pair frame is group-count² by contract (groups are sources/arms/
  * priorities). Values must be non-negative (floor bucketing via
  * `div` — extend with a pmod floor for signed domains). */
object Wasserstein {

  /** @return per pair (a < b): (key_a, key_b, n_a, n_b, n_cells,
    *         emd) — emd in ORIGINAL value units, rounded to 6 */
  def emd1dPairs(obs: DataFrame, groupCol: String, valueCol: String,
                 bucketWidth: Long = 1L): DataFrame = {
    require(bucketWidth >= 1, "bucketWidth must be >= 1")
    val grid = obs
      .select(col(groupCol).as("g"),
              expr(s"(CAST($valueCol AS BIGINT) div $bucketWidth) " +
                   s"* $bucketWidth").as("vb"))
      .groupBy(col("g"), col("vb"))
      .agg(count(lit(1)).as("c"))
    val totals = grid.groupBy(col("g")).agg(sum(col("c")).as("n"))
    val groups = totals.select(col("g"))
    val onlyPairs = groups.select(col("g").as("ka"))
      .crossJoin(groups.select(col("g").as("kb")))
      .filter(col("ka") < col("kb"))
    val fromA = onlyPairs.join(grid.withColumnRenamed("g", "ka"),
        Seq("ka"))
      .select(col("ka"), col("kb"), col("vb"), col("c").as("ca"),
              lit(0L).as("cb"))
    val fromB = onlyPairs.join(grid.withColumnRenamed("g", "kb"),
        Seq("kb"))
      .select(col("ka"), col("kb"), col("vb"), lit(0L).as("ca"),
              col("c").as("cb"))
    val merged = fromA.unionByName(fromB)
      .groupBy(col("ka"), col("kb"), col("vb"))
      .agg(sum(col("ca")).as("ca"), sum(col("cb")).as("cb"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
      merged, Seq("ka", "kb"), "vb", Seq("ca", "cb"))
    val wp = Window.partitionBy(col("ka"), col("kb")).orderBy(col("vb"))
    val withTot = pre
      .join(totals.select(col("g").as("ka"), col("n").as("n_a")), Seq("ka"))
      .join(totals.select(col("g").as("kb"), col("n").as("n_b")), Seq("kb"))
      .withColumn("dv", lead(col("vb"), 1).over(wp) - col("vb"))
      .filter(col("dv").isNotNull)
      .withColumn("term",
        abs(col("cum_ca").cast("decimal(38,0)") * col("n_b") -
            col("cum_cb").cast("decimal(38,0)") * col("n_a"))
          * col("dv"))
    withTot.groupBy(col("ka").as("key_a"), col("kb").as("key_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
           (count(lit(1)) + 1L).as("n_cells"),
           sum(col("term")).as("ts"))
      .select(col("key_a"), col("key_b"), col("n_a"), col("n_b"),
        col("n_cells"),
        round(col("ts").cast("double") /
          (col("n_a").cast("double") * col("n_b")), 6).as("emd"))
  }
}
