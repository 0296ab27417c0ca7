package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dynamic Time Warping distance between series pairs — THE classic
  * temporal-retrieval similarity: unlike pointwise L1/Pearson, DTW
  * aligns series that run the same shape at shifted/stretched pace
  * (a promo spike a week late still matches), which is why it's the
  * standard baseline for time-series nearest-neighbor search.
  *
  * Exact integers end to end: L1 local cost over the caller's integer
  * grid, DP minima over longs (no floats anywhere), so any evaluation
  * ORDER gives identical results — the engine folds the DP row by row
  * inside one codegen'd `aggregate` expression; a SQL oracle can
  * replay it anti-diagonally (the min-plus algebra is order-free).
  *
  * Scale shape: series are collected to one array row each (the
  * bounded-calendar-grid contract — monthly/weekly grids, NOT raw
  * events); the pair frame is key-count² by contract (keys are
  * groups: priorities, regions, SKnamespaces — pair explicitly, the
  * all-pairs cost is the caller's call); per-pair cost is n·m inside
  * a pure projection — zero shuffle beyond the pairing join. */
object Dtw {

  private val INF = 4000000000000000L

  /** @return one row per key pair (a < b): (key_a, key_b, n_a, n_b,
    *         dtw) — unconstrained-path DTW with L1 local cost */
  def dtwPairs(df: DataFrame, keyCol: String, timeCol: String,
               vCol: String): DataFrame = {
    val packed = df
      .select(col(keyCol).as("k"), col(timeCol).as("t"),
              col(vCol).cast("long").as("y"))
      .groupBy(col("k"))
      .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("s"))
      .select(col("k"), expr("transform(s, x -> x.y)").as("v"))
    val a = packed.select(col("k").as("key_a"), col("v").as("va"))
    val b = packed.select(col("k").as("key_b"), col("v").as("vb"))
    val dp = s"""
      |aggregate(
      |  va,
      |  concat(array(CAST(0 AS BIGINT)), array_repeat($INF, size(vb))),
      |  (prev, ai) -> aggregate(
      |    transform(vb, (bj, j) -> named_struct('b', bj, 'j', j)),
      |    array($INF),
      |    (acc, x) -> array_append(acc,
      |      abs(ai - x.b) + least(element_at(prev, x.j + 2),
      |                            element_at(acc, size(acc)),
      |                            element_at(prev, x.j + 1))),
      |    acc -> acc),
      |  row -> element_at(row, size(row)))""".stripMargin
    a.crossJoin(b)
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
              size(col("va")).cast("long").as("n_a"),
              size(col("vb")).cast("long").as("n_b"),
              expr(dp).as("dtw"))
  }
}
