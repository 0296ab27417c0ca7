package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed ridge / OLS regression via GRAM AGGREGATION — the
  * scale recipe for linear models: X'X and X'y are sums of per-row
  * products, so ONE keyed aggregate reduces any corpus to a
  * p(p+3)/2-value Gram summary and the solve is corpus-free. Here
  * p = 2 features + intercept with the Cramer closed form, so the
  * whole fit — sums, determinants, coefficients — is SQL-expressible
  * and oracle-replayable (the general-p path aggregates the same
  * sums and solves the tiny system outside the scan).
  *
  * Exactness: every Gram sum is an exact long (callers pass integer
  * grids — whole currency, counts); the determinants and
  * coefficients are built from ONE shared SQL formula string
  * ([[detFormulas]]) evaluated by BOTH Spark and the DuckDB oracle,
  * so the IEEE expression shape is identical by construction.
  * Determinant products run in double (long³ would overflow int64 at
  * corpus scale — that is the point of casting BEFORE the product).
  *
  * Scale shape: one full-table aggregate (map-side partials), one
  * single-row projection. Nothing else. */
object Ridge {

  /** Shared engine/oracle formula strings over the canonical sum
    * names (n, sx1, sx2, s11, s12, s22, sy, s1y, s2y) with the ridge
    * penalty inlined. Coefficients via Cramer on
    * [[n, sx1, sx2], [sx1, s11+λ, s12], [sx2, s12, s22+λ]]. */
  def detFormulas(lambda: Long): Map[String, String] = {
    val a11 = s"(CAST(s11 AS DOUBLE) + $lambda)"
    val a22 = s"(CAST(s22 AS DOUBLE) + $lambda)"
    val det =
      s"""(CAST(n AS DOUBLE) * ($a11 * $a22 - CAST(s12 AS DOUBLE) * s12)
         | - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * $a22
         |     - CAST(s12 AS DOUBLE) * sx2)
         | + CAST(sx2 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * s12
         |     - $a11 * sx2))""".stripMargin
    val det0 =
      s"""(CAST(sy AS DOUBLE) * ($a11 * $a22 - CAST(s12 AS DOUBLE) * s12)
         | - CAST(sx1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * $a22
         |     - CAST(s12 AS DOUBLE) * s2y)
         | + CAST(sx2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12
         |     - $a11 * s2y))""".stripMargin
    val det1 =
      s"""(CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * $a22
         |     - CAST(s12 AS DOUBLE) * s2y)
         | - CAST(sy AS DOUBLE) * (CAST(sx1 AS DOUBLE) * $a22
         |     - CAST(s12 AS DOUBLE) * sx2)
         | + CAST(sx2 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * s2y
         |     - CAST(s1y AS DOUBLE) * sx2))""".stripMargin
    val det2 =
      s"""(CAST(n AS DOUBLE) * ($a11 * s2y - CAST(s1y AS DOUBLE) * s12)
         | - CAST(sx1 AS DOUBLE) * (CAST(sx1 AS DOUBLE) * s2y
         |     - CAST(s1y AS DOUBLE) * sx2)
         | + CAST(sy AS DOUBLE) * (CAST(sx1 AS DOUBLE) * s12
         |     - $a11 * sx2))""".stripMargin
    Map("det" -> det, "det0" -> det0, "det1" -> det1, "det2" -> det2)
  }

  /** Gram-sum aggregation expressions (shared by the oracle): input
    * columns must already be named y, x1, x2. */
  val gramExprs: Seq[String] = Seq(
    "CAST(count(*) AS BIGINT) AS n",
    "CAST(sum(x1) AS BIGINT) AS sx1",
    "CAST(sum(x2) AS BIGINT) AS sx2",
    "CAST(sum(x1 * x1) AS BIGINT) AS s11",
    "CAST(sum(x1 * x2) AS BIGINT) AS s12",
    "CAST(sum(x2 * x2) AS BIGINT) AS s22",
    "CAST(sum(y) AS BIGINT) AS sy",
    "CAST(sum(x1 * y) AS BIGINT) AS s1y",
    "CAST(sum(x2 * y) AS BIGINT) AS s2y")

  /** The same sums as one SQL projection list, for oracle CTEs. */
  val gramSql: String = gramExprs.mkString(",\n")

  /** @return one row: (n, b0, b1, b2) rounded to 6 — intercept and
    *         the two feature coefficients; null when the system is
    *         singular (|det| below 1e-9 of scale) */
  def ridge2(df: DataFrame, yCol: String, x1Col: String, x2Col: String,
             lambda: Long = 0L): DataFrame = {
    require(lambda >= 0, "lambda must be >= 0")
    val f = detFormulas(lambda)
    df.select(col(yCol).cast("long").as("y"),
              col(x1Col).cast("long").as("x1"),
              col(x2Col).cast("long").as("x2"))
      .selectExpr(gramExprs: _*)
      .selectExpr("n",
        s"CASE WHEN abs(${f("det")}) < 1e-9 THEN NULL " +
          s"ELSE round(${f("det0")} / ${f("det")}, 6) END AS b0",
        s"CASE WHEN abs(${f("det")}) < 1e-9 THEN NULL " +
          s"ELSE round(${f("det1")} / ${f("det")}, 6) END AS b1",
        s"CASE WHEN abs(${f("det")}) < 1e-9 THEN NULL " +
          s"ELSE round(${f("det2")} / ${f("det")}, 6) END AS b2")
  }
}
