package graft.ts

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov removal-effect attribution (Anderl et al.'s data-driven
  * model) — the path-aware credit next to [[ShapleyAttribution]]'s
  * set-based one: journeys become a first-order Markov chain
  * START → touches → CONV/NULL, each channel's credit is how much
  * the chain's conversion probability DROPS when that channel's
  * node is removed (edges into it redirect to NULL — the standard
  * removal semantics), normalized into shares.
  *
  * Exactness: transition counts are exact; the absorption
  * probability is evaluated by value iteration ON THE INTEGER e6
  * GRID — V'(s) = Σ c(s,v)·V(v) div n_s with BigInt products — for
  * a config iteration count, so every iterate (and the final
  * removal shares) is exactly replayable; the oracle unrolls the
  * same iterations per scenario in SQL.
  *
  * Scale shape: the corpus is touched ONCE to build journey edges
  * (per-journey ordered window — the session contract); the
  * transition table is ≤ (k+3)² rows for k config channels and is
  * collected to the driver (the Ridge/Pca config-bounded-state
  * precedent); all k+1 chain solves run there in exact BigInt. */
object MarkovAttribution {

  /** @param events one row per touch/conversion event
    * @param channels config channel universe (k ≤ 16); events with
    *        other types are ignored
    * @param convType the conversion event type
    * @param iters value-iteration count (config)
    * @return per channel: (channel, p_full_e6, p_removed_e6,
    *         removal_e6, share_e6) — removal_e6 the micro drop
    *         1 − P_removed/P_full (clamped at ≥ 0), share_e6 its
    *         share of the total removal mass (0 when all effects
    *         are 0 or the full chain never converts) */
  def removalEffects(events: DataFrame, jidCols: Seq[String],
                     typeCol: String, tsCol: String, idCol: String,
                     channels: Seq[String], convType: String,
                     iters: Int = 12): DataFrame = {
    require(channels.nonEmpty && channels.distinct.size == channels.size &&
            channels.size <= 16, "channels config-bounded (<= 16, distinct)")
    require(!channels.contains(convType), "channels must exclude convType")
    require(iters >= 1 && iters <= 64, "iters config-bounded")
    val spark = events.sparkSession
    val jid = jidCols.map(col)
    val base = events.select(jid ++ Seq(col(typeCol).as("et"),
      col(tsCol).cast("timestamp").cast("long").as("sec"),
      col(idCol).as("eid")): _*)
    val touches = base.filter(col("et").isInCollection(channels))
    val convJ = base.filter(col("et") === convType)
      .select(jid: _*).distinct().withColumn("has_conv", lit(1L))
    // per-journey ordered touch sequence -> edges START->first,
    // t_i->t_{i+1}, last->CONV/NULL (one keyed window — the
    // session-bounded contract)
    val wOrd = Window.partitionBy(jid: _*).orderBy(col("sec"), col("eid"))
    val seq0 = touches
      .withColumn("nxt", lead(col("et"), 1).over(wOrd))
      .withColumn("rk", row_number().over(wOrd))
    val lastFix = seq0.join(convJ, jidCols, "left")
      .withColumn("dst",
        coalesce(col("nxt"),
          when(col("has_conv") === 1L, lit("CONV")).otherwise(lit("NULL"))))
    val starts = lastFix.filter(col("rk") === 1)
      .select(lit("START").as("src"), col("et").as("dst"))
    val edges = lastFix.select(col("et").as("src"), col("dst"))
      .unionByName(starts)
    val trans = edges.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> BigInt(r.getLong(2)))
      .toMap
    // driver-side exact value iteration per scenario
    val e6 = BigInt(1000000)
    val states = "START" +: channels
    def absorb(removed: Option[String]): BigInt = {
      // removal: edges into `removed` redirect to NULL; its outgoing
      // row never evaluates (V(removed) pinned 0)
      val keep = states.filterNot(removed.contains)
      val out = keep.map { s =>
        s -> channels.filterNot(removed.contains).map(d =>
          d -> trans.getOrElse((s, d), BigInt(0))).filter(_._2 > 0)
      }.toMap
      val conv = keep.map(s => s -> trans.getOrElse((s, "CONV"), BigInt(0))).toMap
      val tot = keep.map { s =>
        s -> (channels.map(d => trans.getOrElse((s, d), BigInt(0))).sum +
          trans.getOrElse((s, "CONV"), BigInt(0)) +
          trans.getOrElse((s, "NULL"), BigInt(0)))
      }.toMap
      var v = keep.map(_ -> BigInt(0)).toMap
      for (_ <- 0 until iters) {
        v = keep.map { s =>
          val n = tot(s)
          if (n == 0) s -> BigInt(0)
          else {
            val num = conv(s) * e6 +
              out(s).map { case (d, c) => c * v(d) }.sum
            s -> num / n
          }
        }.toMap
      }
      v("START")
    }
    val pFull = absorb(None)
    val rows = channels.map { c =>
      val pRem = absorb(Some(c))
      val eff = if (pFull == 0) BigInt(0)
        else ((pFull - pRem).max(BigInt(0)) * e6) / pFull
      (c, pFull, pRem, eff)
    }
    val effSum = rows.map(_._4).sum
    val out = rows.map { case (c, pf, pr, eff) =>
      Row(c, pf.toLong, pr.toLong, eff.toLong,
          if (effSum == 0) 0L else ((eff * e6) / effSum).toLong)
    }
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("p_full_e6", LongType, nullable = false),
      StructField("p_removed_e6", LongType, nullable = false),
      StructField("removal_e6", LongType, nullable = false),
      StructField("share_e6", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }
}
