package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the operator SURVEY §2.5 identifies as the
  * *right* tool for the reference's covariate alignment (which it
  * approximates with equi-joins on exact timestamps, `app.py:169`).
  *
  * Semantics: for each left row, attach the single latest right row
  * with `right.ds <= left.ds` within the same series (DuckDB
  * `ASOF LEFT JOIN` semantics; rows with no earlier right row get
  * nulls).
  *
  * Plan shape: union both sides, one window sort per series partition,
  * running `last(ignoreNulls)` — O((|L|+|R|) log) per series with NO
  * range-join row explosion and no custom physical operator. At 100 TB
  * the series key partitions the sort; a keyless call degenerates to a
  * single-partition sort (callers should always pass series columns at
  * scale).
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, valueCols: Seq[String],
               seriesCols: Seq[String]): DataFrame = {
    require(seriesCols.nonEmpty, "pass the series key (scale: partitions the sort)")
    val others = left.columns.toSeq.filterNot(c => seriesCols.contains(c) || c == "ds")
    val lNorm = left.select(
      seriesCols.map(col) ++ Seq(col("ds"), lit(1).as("__side")) ++
        others.map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__v_$c")): _*)
    val rNorm = right.select(
      seriesCols.map(col) ++ Seq(col("ds"), lit(0).as("__side")) ++
        others.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    // right rows sort BEFORE left rows at equal ds → ties are inclusive
    // (right.ds == left.ds matches), exactly like ASOF's >=
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col("ds"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lNorm.unionByName(rNorm)
      .select(
        seriesCols.map(col) ++ Seq(col("ds"), col("__side")) ++ others.map(col) ++
          valueCols.map(c => last(col(s"__v_$c"), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
      .drop("__side")
  }
}
