package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — point-in-interval matching, the other join
  * SURVEY §2.5's equi-join family cannot express. Spark plans a naive
  * `p.ts BETWEEN i.start AND i.end` predicate as
  * BroadcastNestedLoopJoin — O(|P|·|I|) and the canonical accidental
  * scale-killer — so this operator applies the standard bucketized
  * decomposition instead: points land in ⌊t/w⌋ overlap buckets,
  * intervals explode to every bucket they cover, and the match becomes
  * a hash EQUI-join on (keys…, bucket) + a residual filter. Each
  * (point, interval) pair meets in exactly ONE bucket (the point's),
  * so no dedup pass is paid.
  *
  * Cost model: interval replication = ⌈len/w⌉ + 1 rows per interval;
  * join fan-in per bucket = points-in-bucket × intervals-covering-it.
  * Choose `bucketWidth` near the TYPICAL interval length — much
  * smaller explodes intervals, much larger densifies buckets. Pass
  * `keyCols` whenever the data has a natural partition (user, series,
  * shard): the join key becomes (keys…, bucket) and skew follows the
  * keyed-join playbook (AQE skew split, salting) instead of one global
  * bucket axis.
  */
object RangeJoin {

  /** `points` joined to every `intervals` row with
    * `start <= point <= end` (inclusive both ends), equi-keyed on
    * `keyCols` first. Column sets must be disjoint apart from
    * `keyCols`. `pointCol`/`startCol`/`endCol` are integral (seconds,
    * micros — any consistent unit). */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointCol: String, startCol: String, endCol: String,
                keyCols: Seq[String], bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // exact integer floor division at any magnitude/sign: a double
    // round-trip loses precision past 2^53 (nano timestamps), and bare
    // DIV truncates toward zero — the pmod correction makes it a floor
    def bucket(c: String) =
      s"(CAST($c AS BIGINT) - pmod(CAST($c AS BIGINT), ${bucketWidth}L)) DIV ${bucketWidth}L"
    val p = points.withColumn("__b", expr(bucket(pointCol)))
    val i = intervals.withColumn("__b",
      explode(expr(s"sequence(${bucket(startCol)}, ${bucket(endCol)})")))
    p.join(i, keyCols :+ "__b")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__b")
  }
}
