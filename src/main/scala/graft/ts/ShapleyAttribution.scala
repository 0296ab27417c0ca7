package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Shapley-value attribution — the game-theoretic credit model
  * next to [[MultiTouch]]'s positional heuristics: each channel's
  * credit is its average marginal contribution to the conversion
  * rate over all orderings of the channel set (the data-driven
  * attribution recipe: coalition value v(S) = observed conversion
  * rate of journeys exposed to exactly S; unobserved coalitions
  * carry v = 0, the standard simplification — and since Shapley is
  * efficient for ANY characteristic function, Σφ still equals
  * v(full set) exactly, which the spec pins). A corollary the spec
  * also pins: when a superset coalition is UNOBSERVED, a channel's
  * marginal against an observed subset is negative (0 − v(S)), so
  * sparse coalition coverage can hand a channel negative credit —
  * that is the convention speaking, not a bug.
  *
  * Exactness: v(S) is an integer-div micro-rate; the per-channel
  * Shapley numerator Σ ±s!(k−1−s)!·v_e6(S) is exact decimal(38)
  * arithmetic over factorial literals, divided once by k! at the
  * end (truncation toward zero, both engines). No floats anywhere.
  *
  * Scale shape: journeys aggregate to their channel-set BITMASK with
  * one keyed groupBy (sum DISTINCT of power-of-two bits ≡ bit-or);
  * everything after runs on the coalition GRID — ≤ 2^k rows for the
  * config channel list (k ≤ 16 enforced), exploded ×k. The corpus
  * is touched exactly twice (touch mask + conversion probe); no
  * window, no collect. */
object ShapleyAttribution {

  /** @param touches one row per channel exposure; rows whose channel
    *        is not in `channels` are ignored
    * @param convs journeys that converted (same jid columns;
    *        duplicates collapse)
    * @param channels the config channel universe, k ≤ 16
    * @return per channel: (channel, n_journeys, n_convs, phi_e6) —
    *         coverage counts over journeys whose set contains the
    *         channel; phi_e6 the exact Shapley credit in micro
    *         conversion-rate units */
  def shapley(touches: DataFrame, jidCols: Seq[String], chanCol: String,
              convs: DataFrame, channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.distinct.size == channels.size,
            "channels must be non-empty and distinct")
    require(channels.size <= 16, "channel universe is config-bounded (<= 16)")
    val k = channels.size
    val fact = (1 to k).scanLeft(1L)(_ * _).toArray
    val wNum: Seq[Long] = (0 until k).map(s => fact(s) * fact(k - 1 - s))
    val jid = jidCols.map(col)
    val bitOf = channels.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (c, i)) => when(col("ch") === c, lit(1L << i)).otherwise(acc)
    }
    val tm = touches.select(jid :+ col(chanCol).as("ch"): _*)
      .withColumn("bit", bitOf).filter(col("bit").isNotNull)
    val mask = tm.groupBy(jid: _*).agg(sum_distinct(col("bit")).as("mask"))
    val cv = convs.select(jid: _*).distinct().withColumn("cv", lit(1L))
    val j = mask.join(cv, jidCols, "left")
      .withColumn("cv", coalesce(col("cv"), lit(0L)))
    val popcount = (0 until k)
      .map(i => s"(mask div ${1L << i}) % 2").mkString(" + ")
    val coal = j.groupBy(col("mask"))
      .agg(count(lit(1)).as("n_j"), sum(col("cv")).as("n_c"))
      .withColumn("v_e6", expr("n_c * 1000000 div n_j"))
      .withColumn("pc", expr(popcount))
    val chTab = channels.zipWithIndex.map { case (c, i) => (c, 1L << i) }
    val ex = coal
      .select(col("mask"), col("n_j"), col("n_c"), col("v_e6"), col("pc"),
              explode(typedlit(chTab)).as("ch"))
      .withColumn("present", col("mask").bitwiseAND(col("ch._2")) > 0L)
      .withColumn("s_excl",
        (col("pc") - when(col("present"), 1L).otherwise(0L)).cast("int"))
      .withColumn("w_num",
        element_at(typedlit(wNum), col("s_excl") + 1).cast("decimal(38,0)"))
      .withColumn("term",
        when(col("present"), col("w_num") * col("v_e6"))
          .otherwise(-col("w_num") * col("v_e6")))
    ex.groupBy(col("ch._1").as("channel"))
      .agg(sum(when(col("present"), col("n_j")).otherwise(0L))
             .as("n_journeys"),
           sum(when(col("present"), col("n_c")).otherwise(0L))
             .as("n_convs"),
           sum(col("term")).as("phi_num"))
      .select(col("channel"), col("n_journeys"), col("n_convs"),
        expr(s"CAST(phi_num div ${fact(k)} AS BIGINT)").as("phi_e6"))
  }
}
