package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram decision stump — the distributed GBDT building block
  * (LightGBM-style): for each integer feature, scan every distinct
  * value as a candidate `x ≤ v` split and pick the one maximizing the
  * Gini purity score Σ_side (pos² + neg²)/n_side. One stump is the
  * seed-labeled quality-filter baseline ("is n_chars alone enough?")
  * and the per-feature scan IS the histogram-split primitive a full
  * tree repeats per node.
  *
  * Exactness: class counts per (feature, value) are exact longs;
  * cumulative counts ride [[graft.scale.GridPrefix.groupedPrefixSums]]
  * (per-feature value grids never sort in one task); the score is ONE
  * deterministic double expression rounded to e6, argmax ties break
  * by smallest threshold — fully SQL-replayable.
  *
  * Scale shape: melt is a map-side explode (×|features|); histograms
  * are one keyed groupBy over (feature, value); the candidate scan is
  * the distributed prefix + a keyed rank. Nothing corpus-global. */
object Stump {

  /** @param labelCol 0/1 integer label
    * @return one row per feature: (feature, threshold, n_left,
    *         n_right, score_e6) for the best `x ≤ threshold` split
    *         (thresholds whose right side would be empty are not
    *         candidates) */
  def bestSplits(df: DataFrame, featureCols: Seq[String],
                 labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    val stackExpr = featureCols
      .map(f => s"'$f', CAST($f AS BIGINT)").mkString(", ")
    val rows = df.selectExpr(
      s"stack(${featureCols.size}, $stackExpr) AS (feature, v)",
      s"CAST($labelCol AS BIGINT) AS y")
    val grid = rows.groupBy(col("feature"), col("v"))
      .agg(sum(col("y")).as("pos"), sum(lit(1L) - col("y")).as("neg"))
    val pre = graft.scale.GridPrefix.groupedPrefixSums(
      grid, "feature", "v", Seq("pos", "neg"))
    val tot = grid.groupBy(col("feature"))
      .agg(sum(col("pos")).as("t_pos"), sum(col("neg")).as("t_neg"))
    val cand = pre.join(tot, Seq("feature"))
      .withColumn("n_l", col("cum_pos") + col("cum_neg"))
      .withColumn("n_r", col("t_pos") + col("t_neg") - col("n_l"))
      .filter(col("n_r") > 0L)
      .withColumn("score_e6", round((
        (col("cum_pos").cast("double") * col("cum_pos")
          + col("cum_neg").cast("double") * col("cum_neg")) / col("n_l")
        + ((col("t_pos") - col("cum_pos")).cast("double")
             * (col("t_pos") - col("cum_pos"))
           + (col("t_neg") - col("cum_neg")).cast("double")
             * (col("t_neg") - col("cum_neg"))) / col("n_r")
        ) * 1e6).cast("long"))
    val wf = Window.partitionBy(col("feature"))
      .orderBy(col("score_e6").desc, col("v"))
    cand.withColumn("rn", row_number().over(wf))
      .filter(col("rn") === 1)
      .select(col("feature"), col("v").as("threshold"),
              col("n_l").as("n_left"), col("n_r").as("n_right"),
              col("score_e6"))
  }
}
