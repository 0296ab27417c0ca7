package graft.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-breaking equi-join: when the join key is low-cardinality (or
  * Zipf-hot), a plain hash join puts every row of a hot key in ONE
  * shuffle partition — one straggler task does the work of the
  * cluster. Salting splits each fact key across `salts` partitions
  * and replicates the (small, but possibly over-broadcast-threshold)
  * dim side once per salt, so the shuffle spreads |hot key| / salts
  * rows per task. AQE's skew-join handles the sort-merge case at
  * runtime; explicit salting is the plan-level form that also covers
  * hash joins and makes the spread deterministic and testable.
  *
  * Result-identical to the plain join (the salt column is internal
  * and dropped): the salt on the fact side is an arbitrary
  * deterministic function of a fact column, and the dim side carries
  * EVERY salt value, so each fact row matches exactly its original
  * dim row once. */
object SaltedJoin {

  /** @param fact     large skewed side
    * @param dim      per-key side (one row per key for the usual
    *                 enrichment join; general m-row keys replicate
    *                 m·salts rows)
    * @param keyCols  equi-join key(s)
    * @param saltSrc  fact column the salt is derived from (any
    *                 well-spread column — an id, not the hot key)
    * @param salts    spread factor (tasks per hot key) */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
                     saltSrc: String, salts: Int): DataFrame = {
    require(salts >= 1 && salts <= 4096, "salts in [1, 4096]")
    val salted = fact.withColumn("__salt",
      pmod(col(saltSrc).cast("long"), lit(salts.toLong)))
    val dimRep = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(dimRep, keyCols :+ "__salt").drop("__salt")
  }
}
