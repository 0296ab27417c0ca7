package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Needleman–Wunsch global alignment against a CANONICAL reference
  * sequence — funnel-conformance scoring: how closely does each
  * session's event stream follow the designed signup→view→click→
  * purchase path, tolerating insertions (extra events) and deletions
  * (skipped steps) at an explicit gap cost, unlike the subsequence-
  * only ordered funnel (q166). Linear in sessions (every session
  * aligns to ONE literal reference — never session×session pairs;
  * the n² variant is the caller's explicit pairing, as in DTW).
  *
  * Exact max-plus integers end to end (match +2, mismatch −1, gap −1
  * by default): the engine folds the DP row-by-row inside one
  * codegen'd `aggregate`; the oracle replays anti-diagonally — same
  * order-free algebra as [[Dtw]].
  *
  * Scale shape: one keyed sort-collect per session (bounded by the
  * session-length cap), the DP a pure projection over the
  * |seq|×|ref| lattice. */
object SeqAlign {

  /** @param maxLen sessions longer than this are excluded up front
    *               (the bounded-sequence contract — cap, don't sort
    *               unbounded streams into one row)
    * @return per (key, bucket): (key, bucket, n_events, score) */
  def alignToReference(events: DataFrame, keyCol: String, bucketCol: String,
                       typeCol: String, orderCols: Seq[String],
                       reference: Seq[String], matchScore: Int = 2,
                       mismatch: Int = -1, gap: Int = -1,
                       maxLen: Int = 64): DataFrame = {
    require(reference.nonEmpty, "reference must be non-empty")
    require(matchScore > 0 && mismatch <= 0 && gap <= 0,
            "scores: match > 0, mismatch/gap <= 0")
    val m = reference.size
    val refLit = reference.map(t => s"'${t.replace("'", "''")}'")
      .mkString("array(", ", ", ")")
    val ord = orderCols.map(col)
    val packed = events
      .select(col(keyCol).as("k"), col(bucketCol).as("b"),
              col(typeCol).as("et"), struct(ord: _*).as("o"))
      .groupBy(col("k"), col("b"))
      .agg(sort_array(collect_list(struct(col("o"), col("et")))).as("s"))
      .filter(size(col("s")) <= maxLen)
      .select(col("k"), col("b"), expr("transform(s, x -> x.et)").as("va"))
    val dp = s"""
      |aggregate(
      |  va,
      |  transform(sequence(0, $m), j -> CAST(j * $gap AS BIGINT)),
      |  (prev, ai) -> aggregate(
      |    transform($refLit, (bj, j) -> named_struct('t', bj, 'j', j)),
      |    array(element_at(prev, 1) + CAST($gap AS BIGINT)),
      |    (acc, x) -> array_append(acc,
      |      greatest(
      |        element_at(prev, x.j + 1) +
      |          CASE WHEN ai = x.t THEN $matchScore ELSE $mismatch END,
      |        element_at(prev, x.j + 2) + $gap,
      |        element_at(acc, size(acc)) + $gap)),
      |    acc -> acc),
      |  row -> element_at(row, size(row)))""".stripMargin
    packed.select(col("k").as(keyCol), col("b").as(bucketCol),
                  size(col("va")).cast("long").as("n_events"),
                  expr(dp).as("score"))
  }
}
