package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality report a warehouse runs before
  * trusting a new drop: per column, row count, null count, and EXACT
  * distinct cardinality, in long format (one row per column).
  *
  * Scale note: exact multi-column distinct counts plan as ONE
  * aggregate with an Expand (the input is replicated once per
  * distinct-aggregate), so cost is ncols × one scan-shuffle — honest,
  * and the right default for a profiling pass that runs rarely. At
  * 100 TB × wide schemas, swap the exact counts for the HLL tier
  * ([[CorpusSketch.hllSketch]], mergeable registers) and keep this
  * exact form for the columns where cardinality drives decisions. */
object TableProfile {

  /** @return (col_name, n_rows, n_null, n_distinct) per requested
    *         column; `n_distinct` excludes nulls (SQL convention). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile of zero columns")
    val aggCols = cols.flatMap(c =>
      Seq(count(col(c)).as(s"nn_$c"), countDistinct(col(c)).as(s"nd_$c"))) :+
      count(lit(1)).as("n_rows")
    val one = df.agg(aggCols.head, aggCols.tail: _*)
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ") +
      ") as (col_name, n_nonnull, n_distinct)"
    one.select(col("n_rows"), expr(stackExpr))
      .select(col("col_name"), col("n_rows").cast("long").as("n_rows"),
        (col("n_rows") - col("n_nonnull")).cast("long").as("n_null"),
        col("n_distinct").cast("long").as("n_distinct"))
  }
}
