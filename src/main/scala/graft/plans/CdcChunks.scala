package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunking (CDC) — the
  * dedup-family member that catches near-identical documents with
  * INSERTIONS. Fixed-offset chunking shifts every boundary after an
  * edit, so one inserted sentence destroys all downstream chunk
  * identity; content-defined boundaries (cut where a rolling hash of
  * the last `w` bytes matches a mask) re-synchronize immediately after
  * the edit, so all untouched regions keep their chunk hashes and
  * chunk-level dedup finds them. This is the standard
  * training-corpus trick (LDC/CC pipelines, rsync/borg/restic all use
  * the same idea) between exact-hash dedup (q54: whole doc must match)
  * and MinHash near-dup (q56: similarity estimate, no byte reuse map).
  *
  * Boundary rule (STATELESS version): position i (1-based, i ≥ w) is a
  * cut after byte i iff
  * `rollingHash(bytes[i-w+1..i]) mod 2^maskBits == 2^maskBits - 1`,
  * with [[RollingHash]]'s polynomial (base 257, mod 1e9+7) — expected
  * chunk length 2^maskBits. Stateless means every cut depends only on
  * the local window: embarrassingly parallel, deterministic under any
  * partitioning, and exactly expressible in SQL (the DuckDB oracle
  * recomputes every window hash positionally) — min/max chunk-length
  * clamps would make each cut depend on the previous one; production
  * CDC adds them for worst-case bounds, and [[CdcChunks.spans]] takes
  * an optional `maxLen` forced-cut clamp (Scala-tested; the
  * oracle-checked query runs unclamped).
  *
  * UNIT: offsets and lengths are Unicode CODE POINTS, not bytes — the
  * unit of SQL `substring` in both Spark (UTF8String.substringSQL counts
  * code points) and DuckDB (`substr`), and of DuckDB's `ascii()`. The
  * rolling hash feeds on code-point values, so for ASCII input the
  * spans are bit-identical to a byte-fed hash (code point == byte),
  * while non-ASCII documents get spans that tile the text in the SAME
  * unit the downstream `md5(substring(text, start, len))` content hash
  * slices by. (An earlier form hashed UTF-8 bytes but sliced by
  * characters — silently wrong chunk contents for any non-ASCII doc.)
  *
  * Returns array<struct<start int, len int>> (1-based start offsets;
  * spans tile the document exactly), null for empty input. The chunk
  * CONTENT hash is taken downstream as md5(substr(text, start, len)) —
  * engine-portable, so the whole chunk table is hash-comparable. One
  * codegen'd pass per row; the rolling window update is O(1) per
  * code point. */
case class CdcChunks(child: Expression, window: Int, maskBits: Int,
                     maxLen: Int) extends UnaryExpression {
  require(window >= 2 && window <= 1024, s"cdc window out of range: $window")
  require(maskBits >= 1 && maskBits <= 30, s"cdc maskBits out of range: $maskBits")
  require(maxLen == 0 || maxLen >= window, s"cdc maxLen must be 0 (off) or >= window")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(CdcChunks.spanType, containsNull = false)
  // null for empty documents even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.spans(input.asInstanceOf[UTF8String], window, maskBits, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.plans.CdcChunks.spans($in, $window, $maskBits, $maxLen);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val spanType: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false)))

  /** Static helper invoked from generated code. Rolling window hash:
    * h_i = (h_{i-1}·257 − c_{i−w}·257^w + c_i) mod M over CODE-POINT
    * values c (see the unit note above), maintained in O(1) per code
    * point (the subtraction uses the precomputed 257^w mod M; negatives
    * are re-wrapped). `maxLen = 0` disables the forced-cut clamp (the
    * stateless, oracle-checked mode). */
  def spans(text: UTF8String, w: Int, maskBits: Int, maxLen: Int): ArrayData = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return null
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
    // 257^w mod M for the outgoing byte
    var powW = 1L
    var k = 0
    while (k < w) { powW = powW * B % M; k += 1 }
    val mask = (1 << maskBits) - 1
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var start = 1
    var i = 0
    while (i < n) {
      h = (h * B + cps(i)) % M
      if (i >= w) h = ((h - cps(i - w).toLong * powW) % M + M) % M
      val pos = i + 1 // 1-based
      val windowFull = pos >= w
      val cut = (windowFull && (h % (mask + 1)).toInt == mask) ||
                (maxLen > 0 && pos - start + 1 >= maxLen)
      if (cut) { cuts += pos; start = pos + 1 }
      i += 1
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    val out = new Array[Any](cuts.length)
    var prev = 0
    var c = 0
    while (c < cuts.length) {
      out(c) = new GenericInternalRow(Array[Any](prev + 1, cuts(c) - prev))
      prev = cuts(c)
      c += 1
    }
    new GenericArrayData(out)
  }

  def fromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 4,
      s"cdc_chunks expects (text, window, maskBits, maxLen), got ${exprs.length} args")
    CdcChunks(exprs.head,
      GraftFunctions.intLit(exprs(1), "cdc window"),
      GraftFunctions.intLit(exprs(2), "cdc maskBits"),
      GraftFunctions.intLit(exprs(3), "cdc maxLen"))
  }
}
