package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Simplified-silhouette cluster quality — the standard "are these
  * clusters real" readout at corpus scale: per point, a = distance to
  * its OWN cluster centroid, b = distance to the nearest OTHER
  * centroid, s = (b − a)/max(a, b) ∈ [−1, 1]. The simplified variant
  * (centroid distances, not all-pairs) is the one that scales — n·k
  * distances instead of n².
  *
  * Exactness: embeddings quantize to an integer milli-grid (the
  * oracle-replayable k-means convention), centroids are truncated
  * integer means on the same grid, squared distances are EXACT longs;
  * sqrt + the silhouette ratio is ONE double expression per point,
  * e6-rounded before the per-cluster mean (exact long sum div n) —
  * so a SQL oracle replays every value.
  *
  * Scale shape: one posexplode + a (label, dim)-keyed centroid
  * aggregate; the point×centroid join multiplies by k·dims (cluster
  * count × dimension — hyperparameters, not corpus); per-cluster
  * stats are one keyed aggregate. */
object ClusterEval {

  /** @param vecCol array<float/double> column; quantized ×1000
    * @return per cluster: (label, n, mean_sil_e6, min_sil_e6,
    *         max_sil_e6) */
  def simplifiedSilhouette(df: DataFrame, idCol: String, labelCol: String,
                           vecCol: String): DataFrame = {
    val pts = df.select(col(idCol).as("id"), col(labelCol).as("lbl"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("i", "x")))
      .withColumn("q", round(col("x") * 1000).cast("long"))
    val cent = pts.groupBy(col("lbl").as("cl"), col("i"))
      .agg(expr("sum(q) div count(1)").as("c"))
    val d2 = pts.join(cent, Seq("i"))
      .groupBy(col("id"), col("lbl"), col("cl"))
      .agg(sum((col("q") - col("c")) * (col("q") - col("c"))).as("d2"))
    val ab = d2.groupBy(col("id"), col("lbl"))
      .agg(max(when(col("cl") === col("lbl"), col("d2"))).as("a2"),
           min(when(col("cl") =!= col("lbl"), col("d2"))).as("b2"))
    val sil = ab.withColumn("s_e6",
      when(greatest(col("a2"), col("b2")) === 0L, 0L)
        .otherwise(round((sqrt(col("b2")) - sqrt(col("a2")))
          / greatest(sqrt(col("a2")), sqrt(col("b2"))) * 1e6)
          .cast("long")))
    sil.groupBy(col("lbl").as("label"))
      .agg(count(lit(1)).as("n"),
           expr("sum(s_e6) div count(1)").as("mean_sil_e6"),
           min(col("s_e6")).as("min_sil_e6"),
           max(col("s_e6")).as("max_sil_e6"))
  }
}
