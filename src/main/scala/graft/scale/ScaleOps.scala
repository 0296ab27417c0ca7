package graft.scale

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale join machinery (build brief: "bucketing for co-located
  * joins, salting for skew"). These are the knobs a 1000-executor run
  * turns when the default shuffle plans stop being enough; each is
  * plan-verified by `ScaleOpsSpec` (bucketed join compiles to ZERO
  * shuffle exchanges; salted join returns exactly the plain-join rows).
  */
object ScaleOps {

  /** Persist a frame bucketed+sorted by the join key. Two tables
    * bucketed the same way join with no Exchange at any scale — the
    * 100 TB fact⋈fact pattern (e.g. lineitem ⋈ orders nightly). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Skew-safe equi-join of a skewed fact against a dimension: the fact
    * side gets a deterministic per-row salt, the dim side is replicated
    * across all salts, and the join key becomes (key, salt) — hot keys
    * spread over `salts` reducers. Result rows are identical to the
    * plain join (verified by spec); AQE's skew-join handles moderate
    * skew automatically, this is the explicit form for extreme keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 joinType: String = "inner",
                 saltSrc: Option[String] = None): DataFrame = {
    require(salts > 0)
    // saltSrc: derive the salt from a well-spread fact COLUMN (an id)
    // instead of monotonically_increasing_id — any choice is
    // result-invisible, but a column-derived salt is deterministic
    // across runs/retries (same row → same reducer), which keeps
    // speculative-execution and plan-replay behavior reproducible.
    // hash() (not a numeric cast) so non-numeric salt sources spread
    // instead of casting to NULL and silently dropping fact rows.
    val saltCol = saltSrc
      .map(c => pmod(hash(col(c)), lit(salts)))
      .getOrElse(pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedFact = fact.withColumn("__salt", saltCol)
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
