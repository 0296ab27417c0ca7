package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-key skew diagnostics — "know your shuffle before you run
  * it": per candidate key column, exact key cardinality, hottest-key
  * share, and the Gini concentration of the key distribution, all
  * computed from the COUNT-OF-COUNTS grid. The grid is provably
  * small: distinct positive per-key counts summing to n number at
  * most √(2n) (1+2+…+k ≤ n), so the one ungrouped window in the
  * chain sorts ≤ √(2n) rows — a 10¹² -row fact's grid is ≤ ~1.4 M
  * rows. Nothing corpus-sized is ever sorted or collected.
  *
  * The Gini uses the grouped exact form: with count values v
  * ascending, keys of equal count are interchangeable, so the rank
  * sum over a value's f keys after F predecessors is
  * v·(f·F + f(f+1)/2) — integer-exact, order-independent. */
object SkewReport {

  /** @return one row per analyzed column:
    *         (col_name, n_rows, n_keys, max_c, top1_share_e6,
    *          gini_e6) */
  def keySkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "skew report of zero columns")
    cols.map { c =>
      val counts = df.groupBy(col(c).cast("string").as("k"))
        .agg(count(lit(1)).as("cnt"))
      val grid = counts.groupBy(col("cnt")).agg(count(lit(1)).as("f"))
      val w = Window.orderBy(col("cnt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val s = grid
        .withColumn("fp", coalesce(sum(col("f")).over(w), lit(0L)))
        .agg(sum(col("f")).as("n_keys"),
          sum(col("cnt") * col("f")).as("n_rows"),
          sum(expr("cnt * (f * fp + f * (f + 1) div 2)")).as("s"),
          max(col("cnt")).as("max_c"))
      val giniD = lit(1000000.0) *
        (lit(2.0) * col("s").cast("double") /
          (col("n_keys").cast("double") * col("n_rows").cast("double")) -
         (col("n_keys") + 1).cast("double") / col("n_keys").cast("double"))
      s.select(lit(c).as("col_name"),
        col("n_rows").cast("long").as("n_rows"),
        col("n_keys").cast("long").as("n_keys"),
        col("max_c").cast("long").as("max_c"),
        expr("max_c * 1000000 div n_rows").as("top1_share_e6"),
        round(giniD).cast("long").as("gini_e6"))
    }.reduce(_ unionByName _)
  }
}
