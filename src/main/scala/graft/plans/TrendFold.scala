package graft.plans

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: the Mann–Kendall / Theil–Sen pair
  * statistics of ONE series, folded in-row over its packed
  * calendar grid — `trend_fold(days, ys)` where `days` is the
  * day-sorted epoch-day grid (`array<int>`) and `ys` the matching
  * values (`array<long>`).
  *
  * Replaces the r14 distributed pair self-join
  * (n·(n−1)/2 shuffled rows per key, two grid-prefix
  * materializations): the documented bounded-grid contract
  * ([[graft.ts.TrendTest]] — daily/weekly/monthly grids, never raw
  * events) means each key's grid fits one array row, exactly like
  * `ts/Dtw.scala` / `ts/SeqAlign.scala` and every ExpSmooth fold —
  * so the quadratic pair pass runs over primitive arrays inside one
  * projection, zero shuffle beyond the `collect_list`. A decade of
  * days is ~6.7M slopes (= one 53 MB scratch long[] per row,
  * transient), sorted with the primitive dual-pivot sort; the
  * per-key cost that used to be a 14M-row shuffle plus two
  * checkpoints is now ~0.1 s of task-local arithmetic.
  *
  * Exact semantics preserved from the pair form (oracles unchanged):
  *   - pairs are time-ordered with `day_i < day_j` STRICT — equal-day
  *     pairs contribute to neither S nor the slope multiset;
  *   - `slope_e6 = (dy · 10⁶) div dd`, integral division truncating
  *     toward zero in both engines (the q260 probe); dy beyond
  *     int64/10⁶ takes the exact BigInteger path (the oracle's
  *     HUGEINT);
  *   - `tie18 = Σ_values t(t−1)(2t+5)` over the value multiset (the
  *     standard Mann–Kendall tie correction, scaled ×18);
  *   - the Theil–Sen estimate is the LOWER median — the slope at
  *     1-indexed rank ⌈m/2⌉ of the sorted slope multiset.
  *
  * @return struct(n_obs, s_stat, tie18, n_pairs, slope_e6) with
  *         slope_e6 null when the key has no distinct-day pair */
case class TrendFold(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType | DateType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      "trend_fold requires (ARRAY<INT|DATE> days, ARRAY<BIGINT> ys), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = TrendFold.schema
  override def prettyName: String = "trend_fold"

  override protected def nullSafeEval(days: Any, ys: Any): Any =
    TrendFold.fold(days.asInstanceOf[ArrayData], ys.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, y) => s"graft.plans.TrendFold.fold($d, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrendFold =
    copy(left = newLeft, right = newRight)
}

object TrendFold {

  val schema: StructType = StructType(Seq(
    StructField("n_obs", LongType, nullable = false),
    StructField("s_stat", LongType, nullable = false),
    StructField("tie18", LongType, nullable = false),
    StructField("n_pairs", LongType, nullable = false),
    StructField("slope_e6", LongType, nullable = true)))

  // |dy| bound under which dy * 1e6 stays inside int64
  private val FastDy = Long.MaxValue / 1000000L
  private val E6 = BigInteger.valueOf(1000000L)

  /** dy·10⁶ div dd, truncating toward zero — Java integral division
    * on the fast path; exact BigInteger (the oracle's HUGEINT) when
    * the product would overflow int64. */
  def slopeE6(dy: Long, dd: Int): Long =
    if (dy >= -FastDy && dy <= FastDy) dy * 1000000L / dd
    else BigInteger.valueOf(dy).multiply(E6)
      .divide(BigInteger.valueOf(dd.toLong)).longValue()

  /** Static helper invoked from generated code. `days` must be
    * sorted ascending (the caller packs via `sort_array`). */
  def fold(days: ArrayData, ys: ArrayData): InternalRow = {
    val n = days.numElements()
    require(ys.numElements() == n,
      s"trend_fold: days/ys length mismatch ($n vs ${ys.numElements()})")
    val mMax = n.toLong * (n - 1) / 2
    require(mMax <= Int.MaxValue,
      s"trend_fold: $n grid points exceed the bounded-calendar contract")
    val d = days.toIntArray()
    val y = ys.toLongArray()
    val slopes = new Array[Long](mMax.toInt)
    var s = 0L
    var m = 0
    var i = 0
    while (i < n) {
      val di = d(i); val yi = y(i)
      var j = i + 1
      while (j < n) {
        val dd = d(j) - di
        if (dd != 0) {
          val dy = y(j) - yi
          s += java.lang.Long.signum(dy)
          slopes(m) = slopeE6(dy, dd)
          m += 1
        }
        j += 1
      }
      i += 1
    }
    var tie18 = 0L
    if (n > 0) {
      val ysort = y.clone()
      java.util.Arrays.sort(ysort)
      var a = 0
      while (a < n) {
        var b = a + 1
        while (b < n && ysort(b) == ysort(a)) b += 1
        val t = (b - a).toLong
        tie18 += t * (t - 1) * (2 * t + 5)
        a = b
      }
    }
    val out = new GenericInternalRow(5)
    out.setLong(0, n.toLong)
    out.setLong(1, s)
    out.setLong(2, tie18)
    out.setLong(3, m.toLong)
    if (m > 0) {
      java.util.Arrays.sort(slopes, 0, m)
      out.setLong(4, slopes((m + 1) / 2 - 1))
    } else out.setNullAt(4)
    out
  }
}
