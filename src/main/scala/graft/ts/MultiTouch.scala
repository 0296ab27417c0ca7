package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — the credit models beyond q207's
  * last-touch: LINEAR (every touch in the window shares equally),
  * U-SHAPED / position-based (40% first touch, 40% last, 20% spread
  * over the middle — the standard "position-based" model), and
  * TIME-DECAY (unnormalized exponential recency weight per touch).
  *
  * Exactness: linear and U-shape credits are integer micro-shares
  * that sum to EXACTLY 1e6 per conversion — each touch gets the
  * truncated share and the division remainder goes to the earliest
  * touches one micro-unit each (the deterministic largest-remainder
  * rule on a rank). Decay is one fixed-shape IEEE expression per
  * touch (2^(−age/halflife) via a literal ln 2, e6-rounded), summed
  * as longs.
  *
  * Scale shape: the conversion×touch pairing is the bucketized
  * interval join ([[graft.joins.RangeJoin]], window-sized buckets —
  * each conversion explodes to ≤2 buckets), keyed by user; per-
  * conversion ranks are a window KEYED by conversion id (touch count
  * per conversion is bounded by one user's activity in one window —
  * document skew, don't global-sort). */
object MultiTouch {

  /** @return per touch channel: (touch_type, n_touches, n_convs,
    *         linear_e6, ushape_e6, decay_e6) */
  def multiTouchAttribution(events: DataFrame, userCol: String,
                            typeCol: String, tsCol: String, idCol: String,
                            touchTypes: Seq[String], convType: String,
                            windowSec: Long,
                            halfLifeSec: Long = 86400L): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
            "touch types must be non-empty and exclude the conversion type")
    require(windowSec > 0 && halfLifeSec > 0, "window/halflife positive")
    val base = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"),
      col(tsCol).cast("timestamp").cast("long").as("sec"),
      col(idCol).as("eid"))
    val touches = base.filter(col("et").isInCollection(touchTypes))
      .select(col("user_id"), col("et").as("touch_type"),
              col("sec").as("t_sec"), col("eid").as("touch_id"))
    val convs = base.filter(col("et") === convType)
      .select(col("user_id"), col("eid").as("conv_id"),
              (col("sec") - windowSec).as("w_start"),
              col("sec").as("c_sec"))
    val joined = graft.joins.RangeJoin.rangeJoin(
      touches, convs, "t_sec", "w_start", "c_sec",
      keyCols = Seq("user_id"), bucketWidth = windowSec)
    val wc = Window.partitionBy(col("conv_id"))
      .orderBy(col("t_sec"), col("touch_id"))
    val ranked = joined
      .withColumn("rk", row_number().over(wc).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("conv_id"))))
    // ln 2 as a shared literal so both engines evaluate the identical
    // IEEE expression (JVM Math.log(2) == this constant)
    val ln2 = 0.6931471805599453
    val credited = ranked
      .withColumn("linear_e6",
        expr("1000000 div n") +
          when(col("rk") <= expr("1000000 % n"), 1L).otherwise(0L))
      .withColumn("ushape_e6",
        when(col("n") === 1L, 1000000L)
          .when(col("n") === 2L, 500000L)
          .when(col("rk") === 1L, 400000L)
          .when(col("rk") === col("n"), 400000L)
          .otherwise(expr("200000 div (n - 2)") +
            when(col("rk") - 1L <= expr("200000 % (n - 2)"), 1L)
              .otherwise(0L)))
      .withColumn("decay_e6",
        round(exp(lit(-ln2) * (col("c_sec") - col("t_sec"))
          / halfLifeSec.toDouble) * 1e6).cast("long"))
    credited.groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
           countDistinct(col("conv_id")).as("n_convs"),
           sum(col("linear_e6")).as("linear_e6"),
           sum(col("ushape_e6")).as("ushape_e6"),
           sum(col("decay_e6")).as("decay_e6"))
  }
}
