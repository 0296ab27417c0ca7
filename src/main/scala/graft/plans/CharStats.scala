package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-document character-distribution
  * statistics — (n_chars, n_distinct, entropy_e6) where entropy_e6 is
  * the Shannon entropy (nats) of the code-point distribution,
  * accumulated as PER-CHARACTER integer micro-terms:
  * `Σ_ch round((c/N)·ln(N/c)·1e6)`. The quality-filter family's
  * randomness axis: binary-ish blobs and key dumps score near the
  * ln(alphabet) ceiling, single-char floods near 0, natural text in a
  * band between — the filter rulebooks' complement to the
  * length/stopword and repetition axes (which see word structure but
  * not character structure).
  *
  * Determinism contract (the q168 micro-grid idiom, moved inside one
  * expression): each distinct character contributes an ALREADY-ROUNDED
  * e6 integer term, so the output is an exact integer sum —
  * order-independent, bit-reproducible, and replayable in SQL by
  * grouping characters and summing the same rounded terms. Terms are
  * non-negative (c ≤ N ⇒ ln(N/c) ≥ 0), so SQL `round` (half away
  * from zero) is `floor(x + 0.5)` — what this expression computes.
  *
  * One codegen'd pass per row over code points (the CdcChunks unit —
  * DuckDB `string_split(s, '')` splits the same way for BMP text);
  * zero shuffles, streaming-safe. Null for empty/whitespace-free-null
  * input mirrors length semantics: empty string → (0, 0, 0). */
case class CharStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_stats requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = CharStats.statType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_stats"

  override protected def nullSafeEval(input: Any): Any =
    CharStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.plans.CharStats.compute($in);
    """)

  override protected def withNewChildInternal(newChild: Expression): CharStats =
    copy(child = newChild)
}

object CharStats {
  val statType: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy_e6", LongType, nullable = false)))

  /** Static helper invoked from generated code. */
  def compute(text: UTF8String): GenericInternalRow = {
    val s = text.toString
    val counts = new java.util.HashMap[Integer, Array[Int]]()
    var si = 0
    var n = 0L
    while (si < s.length) {
      val cp = s.codePointAt(si)
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
      n += 1
      si += Character.charCount(cp)
    }
    var entropyE6 = 0L
    if (n > 0) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0).toLong
        // SQL round (half away from zero) on a non-negative term
        entropyE6 += math.floor((c.toDouble / n) * math.log(n.toDouble / c)
                                * 1e6 + 0.5).toLong
      }
    }
    new GenericInternalRow(Array[Any](n, counts.size().toLong, entropyE6))
  }

  def fromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, s"char_stats expects (text), got ${exprs.length} args")
    CharStats(exprs.head)
  }
}
