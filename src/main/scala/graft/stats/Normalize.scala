package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Quantile normalization across groups — map every group's value
  * distribution onto the POOLED distribution by percentile matching,
  * so groups become comparable without trusting their raw scales
  * (cross-source quality scores before a corpus-mix cut, lab-batch
  * effect removal, cross-language length scores). A group value with
  * within-group ceil-rank r of n_g maps to the pooled value at
  * ceil-rank (r·n_tot + n_g − 1) div n_g — exact integers end to
  * end, no percentile doubles anywhere.
  *
  * Plan shape: both CDFs ride the repo's value-grid discipline
  * (windows over DISTINCT values, and BOTH prefixes are distributed:
  * the pooled grid through
  * [[graft.scale.GridPrefix.prefixSums]] and the per-source grids
  * through [[graft.scale.GridPrefix.groupedPrefixSums]], so neither
  * a wide pooled grid nor one wide source ever sorts in a single
  * task), and the rank→pooled-value lookup
  * is the cover-interval range join decomposed through
  * [[graft.joins.RangeJoin.rangeJoin]]'s bucketized equi-join (the
  * pooled cover intervals PARTITION [1, n_tot], so exploded bucket
  * volume is n_tot/bucketWidth + grid size — never a nested-loop
  * join). Identity on a single group by construction (r·n+n−1 div n
  * = r exactly). */
object Normalize {

  /** @param bucketWidth rank-space bucket for the cover join; any
    *                    positive value is correct, ~1024 keeps the
    *                    interval explode cheap at every n_tot
    * @return one row per (group, distinct value): (group, value,
    *         count, norm_value) */
  def quantileNormalize(df: DataFrame, groupCol: String, valueCol: String,
                        bucketWidth: Long = 1024L): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"), col(valueCol).cast("long").as("v"))
    val srcGrid = rows.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
    val nG = srcGrid.groupBy(col("grp")).agg(sum(col("c")).as("n_g"))
    // per-group CDF via the GROUPED distributed prefix — one source's
    // value grid approaches corpus cardinality for cents metrics, so
    // the within-group cumulative must not be a one-task sort
    val src = graft.scale.GridPrefix.groupedPrefixSums(srcGrid, "grp", "v",
        Seq("c"))
      .withColumnRenamed("cum_c", "cum")
      .drop("cum_before_c")
      .join(nG, Seq("grp"))
    val poolGrid = rows.groupBy(col("v")).agg(count(lit(1)).as("c_all"))
    val pool = graft.scale.GridPrefix.prefixSums(poolGrid, "v", "c_all")
      .select(col("v").as("norm_v"),
              (col("cum") - col("c_all") + 1L).as("lo"),
              col("cum").as("hi"))
    // total from the (checkpointed) grid's max running sum — NOT a
    // second full-corpus pass
    val nTot = pool.agg(max(col("hi")).as("n_tot"))
    val pts = src.crossJoin(nTot)
      .withColumn("tr",
        expr("(cum * n_tot + n_g - 1) div n_g"))
      .select(col("grp"), col("v"), col("c"), col("tr"))
    graft.joins.RangeJoin.rangeJoin(pts, pool, "tr", "lo", "hi",
        keyCols = Seq.empty, bucketWidth = bucketWidth)
      .select(col("grp").as(groupCol), col("v").as(valueCol),
              col("c").as("n"), col("norm_v"))
  }
}
