package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build: collapse an
  * attribute change stream into effective-dated versions — the
  * dimensional-modeling twin of [[graft.pipeline.Snapshot]]'s
  * snapshot diff (diff compares two frozen corpus states; SCD2
  * builds the full validity interval history from the event stream
  * itself).
  *
  * Scale shape: two windows, both partitioned by the entity key and
  * ordered by the (date, event-id) total order — per-entity history
  * is the short dimension, entity count the parallel axis. No joins,
  * no driver state. */
object Scd {

  /** Type-2 history: keep each row where `attrCol` differs from the
    * entity's previous value (or is the first observation), then
    * effective-date each kept version:
    *   - `valid_from` — the change row's date
    *   - `valid_to`   — the NEXT version's date (null while current;
    *                    half-open [from, to) convention)
    *   - `version`    — 1-based change counter per entity
    *   - `is_current` — 1 on the open version
    * Ties inside one date are ordered by `idCol` (total order), so
    * same-day flip-flops produce deterministic zero-length versions
    * rather than engine-dependent collapses. */
  def scd2(changes: DataFrame, keyCol: String, dateCol: String,
           attrCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dateCol), col(idCol))
    val marked = changes
      .select(col(keyCol), col(dateCol), col(attrCol), col(idCol))
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attrCol))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col(dateCol), col(idCol))
    marked
      .withColumn("valid_to", lead(col(dateCol), 1).over(wv))
      .withColumn("version", row_number().over(wv).cast("long"))
      .select(col(keyCol), col(attrCol),
        col(dateCol).as("valid_from"), col("valid_to"),
        col("version"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** CDC materialization, latest-wins: collapse a change stream
    * (upserts + delete tombstones) to the live table state — the
    * Type-1 complement of [[scd2]], and the batch form of every
    * replication-apply job. Per key ONE keyed `max_by` aggregate on
    * the (ordCols…) total order — no window, no per-key sort beyond
    * the aggregate's own partial/final combine — then keys whose
    * LATEST op is the tombstone drop out (a delete followed by a
    * re-insert correctly survives).
    *
    * @param ordCols  columns forming a TOTAL order within a key
    *                 (e.g. second-truncated time + unique id);
    *                 ties would make the winner engine-dependent
    * @param payloadCols carried value columns
    * @return (key, last_<ord…>, last_<payload…>, n_changes) for
    *         every live key */
  def applyCdc(changes: DataFrame, keyCol: String, opCol: String,
               deleteOp: String, ordCols: Seq[String],
               payloadCols: Seq[String]): DataFrame = {
    val carried = (opCol +: (ordCols ++ payloadCols)).distinct
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max_by(struct(carried.map(col): _*),
                  struct(ordCols.map(col): _*)).as("last"),
           count(lit(1)).as("n_changes"))
      .filter(col(s"last.$opCol") =!= deleteOp)
    latest.select(
      col(keyCol) +:
      (ordCols ++ payloadCols).map(c => col(s"last.$c").as(s"last_$c")) :+
      col("n_changes"): _*)
  }
}
