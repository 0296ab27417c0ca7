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
    // the whole right row travels as ONE struct so every value column is
    // attached from the SAME matched right row — per-column running-last
    // would let a null in one column pull that value from an older row
    // (DuckDB ASOF attaches rows, nulls included)
    val rowStruct = struct(valueCols.map(col): _*)
    val nullStruct = {
      val dt = org.apache.spark.sql.types.StructType(valueCols.map(c => right.schema(c)))
      lit(null).cast(dt)
    }
    val lNorm = left.select(
      seriesCols.map(col) ++ Seq(col("ds"), lit(1).as("__side")) ++
        others.map(col) :+ nullStruct.as("__v"): _*)
    val rNorm = right.select(
      seriesCols.map(col) ++ Seq(col("ds"), lit(0).as("__side")) ++
        others.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rowStruct.as("__v"): _*)
    // right rows sort BEFORE left rows at equal ds → ties are inclusive
    // (right.ds == left.ds matches), exactly like ASOF's >=
    val w = Window.partitionBy(seriesCols.map(col): _*)
      .orderBy(col("ds"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    lNorm.unionByName(rNorm)
      .select(
        seriesCols.map(col) ++ Seq(col("ds"), col("__side")) ++ others.map(col) :+
          last(col("__v"), ignoreNulls = true).over(w).as("__v"): _*)
      .filter(col("__side") === 1)
      .select(
        seriesCols.map(col) ++ Seq(col("ds")) ++ others.map(col) ++
          valueCols.map(c => col(s"__v.$c").as(c)): _*)
  }
}
