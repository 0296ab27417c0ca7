package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-dimensional SKYLINE (Pareto frontier) per group — the
  * "best tradeoffs" query (Börzsönyi et al. 2001: cheapest-yet-
  * largest, shortest-yet-highest-quality): all rows not DOMINATED
  * within their group, where a dominates b iff a is ≤ on the
  * minimized axis, ≥ on the maximized axis, and strictly better on
  * at least one.
  *
  * For two dimensions the frontier is computable with NO pairwise
  * join at all — sort by the minimized axis and a row survives iff
  * its maximized value strictly exceeds every value at a strictly
  * smaller x (one running max) and is the max within its own x (one
  * grid aggregate). This engine runs that decomposition on the
  * DISTINCT-x value grid: a keyed grid aggregate, one GRID-sized
  * keyed window (never corpus rows — the [[graft.pipeline
  * .CorpusSketch.exactPercentiles]] discipline), and one keyed join
  * back to rows. Equal (x, y) twins are all non-dominated and all
  * kept — dominance is strict.
  *
  * Inputs ride exact integer grids (cents / sizes), so the oracle
  * replays grid, running max, and cover filter bit-for-bit. */
object Skyline {

  /** @param minCol axis to minimize (cast to long — pre-scale
    *               decimals to cents)
    * @param maxCol axis to maximize (cast to long)
    * @return (group, id, x, y) — the frontier rows, x = minCol,
    *         y = maxCol */
  def skyline2d(df: DataFrame, groupCol: String, idCol: String,
                minCol: String, maxCol: String): DataFrame = {
    val rows = df.select(col(groupCol).as("grp"), col(idCol).as("rid"),
      col(minCol).cast("long").as("x"), col(maxCol).cast("long").as("y"))
    val grid = rows.groupBy(col("grp"), col("x")).agg(max(col("y")).as("ymax"))
    val wPrev = Window.partitionBy(col("grp")).orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val front = grid
      .withColumn("m1", max(col("ymax")).over(wPrev))
      .filter(col("m1").isNull || col("m1") < col("ymax"))
      .select(col("grp"), col("x"), col("ymax"))
    rows.join(front, Seq("grp", "x"))
      .filter(col("y") === col("ymax"))
      .select(col("grp").as(groupCol), col("rid").as(idCol),
              col("x"), col("y"))
  }
}
