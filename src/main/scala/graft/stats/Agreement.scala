package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-rater agreement — Cohen's κ between two binary verdict
  * columns (two quality gates, a model vs a rule, two dedup passes):
  * how much the raters agree BEYOND the agreement their marginal
  * rates would produce by chance. Raw agreement flatters any pair of
  * gates that both say "keep" 95% of the time; κ subtracts that.
  *
  * Exactness: κ = (p_o − p_e)/(1 − p_e) clears denominators to
  * κ = (n·agree − Σ marginal products) / (n² − Σ marginal products)
  * — every term an exact count product (decimal(38); n·agree
  * overflows int64 past ~3·10⁹ rows), one truncating integer
  * division at the end. One keyed-free aggregate; corpus touched
  * once. */
object Agreement {

  /** @param df rows with two 0/1 (or boolean) verdict columns
    * @return one row: (n, n_agree, kappa_e6) — kappa_e6 null when
    *         the chance-agreement denominator vanishes (a rater is
    *         constant and matches the other's marginal exactly) */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val agg = df.select(col(aCol).cast("long").as("a"),
                        col(bCol).cast("long").as("b"))
      .agg(count(lit(1)).as("n"),
           sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"),
           sum(col("a")).as("ma1"), sum(col("b")).as("mb1"))
      // Σ marginal products = ma1·mb1 + ma0·mb0 (the chance-agreement
      // numerator p_e·n²)
      .withColumn("pe_n2",
        col("ma1").cast(d38) * col("mb1") +
          (col("n") - col("ma1")).cast(d38) * (col("n") - col("mb1")))
      .withColumn("den", col("n").cast(d38) * col("n") - col("pe_n2"))
    agg.select(col("n"), col("n_agree"),
      when(col("den") === lit(0), lit(null).cast("long"))
        .otherwise(expr(
          "CAST((CAST(n AS DECIMAL(38,0)) * n_agree - pe_n2) * 1000000" +
            " div den AS BIGINT)")).as("kappa_e6"))
  }
}
