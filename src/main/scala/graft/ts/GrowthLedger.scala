package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Period-over-period growth ledger — the month-over-month /
  * year-over-year report every revenue dashboard opens with, done
  * RIGHT: comparisons join on the CALENDAR (add_months), not on row
  * offsets, so a missing month yields an honest null instead of
  * silently comparing against the wrong period.
  *
  * Exactness: growth shares are integer micro-units
  * ((cur − prev)·1e6 div |prev|, truncating) — null when the base
  * period is missing or zero (no division-by-zero sentinel values).
  *
  * Scale shape: one keyed monthly aggregate + two self-joins on
  * (key, calendar month) — all keyed equi-joins on the bounded
  * month grid. */
object GrowthLedger {

  /** @return per (key, month): (key, month, rev_c, mom_e6, yoy_e6) */
  def momYoy(df: DataFrame, keyCol: String, dateCol: String,
             valueCentsCol: String): DataFrame = {
    val monthly = df
      .select(col(keyCol).as("k"),
              to_date(date_trunc("month", col(dateCol))).as("mo"),
              col(valueCentsCol).cast("long").as("v"))
      .groupBy(col("k"), col("mo"))
      .agg(sum(col("v")).as("rev_c"))
    def lagJoin(months: Int, out: String) = monthly.select(
      col("k"), add_months(col("mo"), months).as("mo"),
      col("rev_c").as(out))
    def share(cur: String, prev: String) =
      when(col(prev).isNull || col(prev) === 0L, lit(null))
        .otherwise(expr(s"(($cur - $prev) * 1000000) div abs($prev)"))
        .cast("long")
    monthly
      .join(lagJoin(1, "prev_m"), Seq("k", "mo"), "left")
      .join(lagJoin(12, "prev_y"), Seq("k", "mo"), "left")
      .select(col("k").as(keyCol), col("mo"), col("rev_c"),
        share("rev_c", "prev_m").as("mom_e6"),
        share("rev_c", "prev_y").as("yoy_e6"))
  }

  /** New-vs-returning split — each month's revenue divided by whether
    * the customer's FIRST-EVER order landed that month: the
    * acquisition-vs-retention decomposition. First month per customer
    * is one keyed aggregate; everything joins on (customer) then
    * aggregates on the month grid. */
  def newVsReturning(df: DataFrame, custCol: String, dateCol: String,
                     valueCentsCol: String): DataFrame = {
    val rows = df.select(col(custCol).as("c"),
      to_date(date_trunc("month", col(dateCol))).as("mo"),
      col(valueCentsCol).cast("long").as("v"))
    val firstMo = rows.groupBy(col("c")).agg(min(col("mo")).as("mo0"))
    rows.join(firstMo, Seq("c"))
      .withColumn("is_new", (col("mo") === col("mo0")).cast("long"))
      .groupBy(col("mo"))
      .agg(sum(when(col("is_new") === 1L, col("v")).otherwise(0L))
             .as("new_rev_c"),
           sum(when(col("is_new") === 0L, col("v")).otherwise(0L))
             .as("ret_rev_c"),
           countDistinct(when(col("is_new") === 1L, col("c")))
             .as("new_custs"),
           countDistinct(when(col("is_new") === 0L, col("c")))
             .as("ret_custs"))
      .withColumn("new_share_e6",
        when(col("new_rev_c") + col("ret_rev_c") === 0L, lit(null))
          .otherwise(expr("(new_rev_c * 1000000) div (new_rev_c + ret_rev_c)"))
          .cast("long"))
  }
}
