package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: winnowing fingerprint selection
  * (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003 — the MOSS algorithm). The
  * dedup family's LOCAL-GUARANTEE member: from the k-gram hash stream
  * of a document, select the minimum hash of every window of `w`
  * consecutive grams (rightmost position on ties), deduplicated.
  * Unlike MinHash (one global sketch, no positions) this guarantees
  * that ANY shared substring of length ≥ w + k − 1 between two
  * documents yields at least one shared selected fingerprint — the
  * property clone/plagiarism detection needs — at expected density
  * 2/(w+1) of the gram stream.
  *
  * Gram hash: the repo's [[RollingHash]] polynomial (base 257,
  * mod 1e9+7) over Unicode CODE POINTS (the [[CdcChunks]] unit — SQL
  * `substr`/`ascii` semantics in both engines), maintained with the
  * O(1) rolling update, so the DuckDB oracle can recompute every
  * position's gram hash POSITIONALLY with exact BIGINT arithmetic.
  *
  * Tie-break parity with SQL: selection per window minimizes the
  * encoded key `h · 2³¹ + (2³¹ − 1 − pos)` (h < 2³⁰ keeps the
  * product < 2⁶¹), which is exactly "min h, rightmost pos" — the
  * oracle replays the same window min over the encoded BIGINT.
  *
  * Short inputs: fewer grams than `w` (but ≥ 1 gram) form a single
  * window over the whole stream — the document still contributes its
  * global min fingerprint. Fewer code points than `k` → null.
  *
  * Selected positions are strictly increasing (windows only move
  * right and a window never re-selects a dropped position), so
  * consecutive dedup equals global per-pos dedup. One codegen'd
  * O(n) pass per row (monotonic deque); zero shuffles — the
  * fingerprint EXPLODE and the downstream inverted-index join are the
  * only distributed stages, both keyed. */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && k <= 64, s"winnow k out of range: $k")
  require(w >= 2 && w <= 1024, s"winnow w out of range: $w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(WinnowFps.fpType, containsNull = false)
  // null when the document is shorter than one gram
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    WinnowFps.select(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.plans.WinnowFps.select($in, $k, $w);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

object WinnowFps {
  val fpType: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))

  /** Static helper invoked from generated code. Returns the selected
    * (1-based gram position, gram hash) pairs in increasing position
    * order, or null when the text has fewer than `k` code points. */
  def select(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n < k) return null
    val cps = new Array[Int](n)
    var si = 0
    var ci = 0
    while (si < s.length) {
      val cp = s.codePointAt(si)
      cps(ci) = cp
      ci += 1
      si += Character.charCount(cp)
    }
    val M = RollingHash.Mod
    val B = RollingHash.Base
    var powK = 1L // 257^k mod M for the outgoing code point
    var t = 0
    while (t < k) { powK = powK * B % M; t += 1 }
    val g = n - k + 1 // gram count; gram p (1-based) covers cps[p-1 .. p+k-2]
    val hs = new Array[Long](g + 1) // 1-based
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * B + cps(i)) % M
      if (i >= k) h = ((h - cps(i - k).toLong * powK) % M + M) % M
      if (i >= k - 1) hs(i - k + 2) = h
      i += 1
    }
    val selPos = scala.collection.mutable.ArrayBuffer.empty[Int]
    if (g <= w) {
      // single window over the whole gram stream: global min, rightmost tie
      var best = 1
      var p = 2
      while (p <= g) { if (hs(p) <= hs(best)) best = p; p += 1 }
      selPos += best
    } else {
      // sliding-window minimum via monotonic deque of gram positions;
      // back-pop on >= keeps the RIGHTMOST position among equal hashes
      val dq = new Array[Int](g + 1)
      var head = 0
      var tail = 0 // exclusive
      var last = -1
      var p = 1
      while (p <= g) {
        while (tail > head && hs(dq(tail - 1)) >= hs(p)) tail -= 1
        dq(tail) = p; tail += 1
        if (p >= w) {
          val start = p - w + 1
          while (dq(head) < start) head += 1
          val sel = dq(head)
          if (sel != last) { selPos += sel; last = sel }
        }
        p += 1
      }
    }
    val out = new Array[Any](selPos.length)
    var c = 0
    while (c < selPos.length) {
      out(c) = new GenericInternalRow(Array[Any](selPos(c), hs(selPos(c))))
      c += 1
    }
    new GenericArrayData(out)
  }

  def fromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"winnow_fps expects (text, k, w), got ${exprs.length} args")
    WinnowFps(exprs.head, GraftFunctions.intLit(exprs(1), "winnow_fps k"),
              GraftFunctions.intLit(exprs(2), "winnow_fps w"))
  }
}
