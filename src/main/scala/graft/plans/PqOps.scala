package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Native Catalyst expressions for PRODUCT QUANTIZATION (PQ) — the
  * trained-codebook memory rung past SQ8 (FAISS's IVFPQ): the vector's
  * coordinates are split into `m` contiguous sub-vectors, each encoded
  * as the index of its nearest centroid in a per-subspace codebook of
  * `ksub ≤ 256` entries, so a 64-dim float64 embedding (512 B)
  * compresses to `m` BYTES (m = 8 ⇒ 64×; SQ8's 6.4× is the
  * codebook-free rung below). The codebooks themselves are tiny
  * (m·ksub·(dim/m) = ksub·dim doubles — ~128 KB at dim 64/ksub 256)
  * and travel as analysis-time-folded literals exactly like
  * [[IvfAssign]]'s quantizer.
  *
  * Encode rule (engine-portable, replayed by the q89 oracle): nearest
  * sub-centroid by SQUARED EUCLIDEAN distance accumulated in a
  * sequential fold, ties to the LOWEST codebook index — deterministic
  * IEEE arithmetic in any engine. Reconstruction is the concatenation
  * of the chosen centroids; subspaces are disjoint coordinate blocks,
  * so dot products decompose per subspace:
  *   [[PqDot]]  (sym)  — Σ_s table_s[aₛ][bₛ], with the m·ksub² inner
  *     products precomputed ONCE at analysis time (the classic
  *     symmetric-distance table; ksub 256/m 8/dim 64 ⇒ 4 MB of tables,
  *     shipped once, each scored pair costs m table lookups);
  *   [[PqDotAsym]] (ADC) — the query stays exact floats, Σ_s
  *     dot(v_s, cb_s[codeₛ]) computed directly in ONE continuous
  *     accumulator (the FAISS default for probe-side scoring, half
  *     the quantization noise at zero extra corpus memory).
  * Float discipline (test-pinned): the ASYM form visits coordinates
  * in order through one accumulator, so it equals [[VecDot]] against
  * the explicit reconstruction bit-for-bit; the SYM form sums
  * per-subspace partials (the table grouping), which is a DIFFERENT
  * float grouping than a continuous fold — deterministic, but oracles
  * must replay exactly that grouping (q89's SQL sums per-subspace
  * dots in subspace order). */
case class PqEncode(child: Expression, cb: PqOps.Codebooks)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<DOUBLE> input, got ${t.catalogString}")
  }

  override def dataType: DataType = BinaryType
  // null for empty arrays even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqOps.encode(input.asInstanceOf[ArrayData], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("codebooks", cb, classOf[PqOps.Codebooks].getName)
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.plans.PqOps.encode($in, $c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Symmetric PQ dot product from the precomputed per-subspace tables —
  * see [[PqEncode]]. */
case class PqDot(left: Expression, right: Expression, cb: PqOps.Codebooks)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_dot requires two pq_encode codes, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqOps.dotSym(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("codebooks", cb, classOf[PqOps.Codebooks].getName)
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.PqOps.dotSym($a, $b, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDot =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric (ADC) PQ dot: exact float query × reconstructed corpus
  * code — see [[PqEncode]]. */
case class PqDotAsym(left: Expression, right: Expression, cb: PqOps.Codebooks)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_dot_asym requires (ARRAY<DOUBLE>, pq code), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_dot_asym"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqOps.dotAsym(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]], cb)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("codebooks", cb, classOf[PqOps.Codebooks].getName)
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.PqOps.dotAsym($a, $b, $c)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqDotAsym =
    copy(left = newLeft, right = newRight)
}

object PqOps {

  /** Resolved codebooks: `books(s)(j)` = centroid j of subspace s, as
    * primitive arrays. `table(s)(j*ksub + i)` = dot(books(s)(j),
    * books(s)(i)) — the symmetric-distance tables, precomputed at
    * construction (ksub² ≤ 65,536 dots of dsub dims per subspace, a
    * one-off driver cost). Subspaces must tile the dimension exactly.
    *
    * Equality is STRUCTURAL over the codebooks (not reference), for
    * the same reason as [[IvfAssign.Quantizer]]: equal-codebook calls
    * must canonicalize to the same plan or the cacheOnce index memo
    * breaks. The tables are derived, so they are excluded. */
  case class Codebooks(books: Array[Array[Array[Double]]]) {
    require(books.nonEmpty && books.forall(_.nonEmpty),
            "pq codebooks need at least one subspace with at least one entry")
    val m: Int = books.length
    val ksub: Int = books(0).length
    require(ksub <= 256, s"pq codebook entries must fit one byte, got $ksub")
    require(books.forall(_.length == ksub),
            "every subspace must have the same number of entries")
    val dsub: Int = books(0)(0).length
    require(books.forall(_.forall(_.length == dsub)),
            "every codebook entry must share one sub-dimension")
    val dim: Int = m * dsub
    val table: Array[Array[Double]] = books.map { b =>
      val t = new Array[Double](ksub * ksub)
      var j = 0
      while (j < ksub) {
        var i = 0
        while (i < ksub) {
          var s = 0.0
          var d = 0
          while (d < dsub) { s += b(j)(d) * b(i)(d); d += 1 }
          t(j * ksub + i) = s
          i += 1
        }
        j += 1
      }
      t
    }

    private def deep(a: Array[_]): Array[AnyRef] = a.asInstanceOf[Array[AnyRef]]
    override def equals(o: Any): Boolean = o match {
      case c: Codebooks => java.util.Arrays.deepEquals(deep(books), deep(c.books))
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.deepHashCode(deep(books))
  }

  /** Static helper invoked from generated code. A vector whose length
    * differs from m·dsub fails loudly (same contract as ivf_assign —
    * a truncated distance would pick a plausible-but-wrong code). */
  def encode(v: ArrayData, cb: Codebooks): Array[Byte] = {
    val n = v.numElements()
    if (n == 0) return null
    if (n != cb.dim)
      throw new IllegalArgumentException(
        s"pq_encode: input vector has $n dims, codebooks expect ${cb.dim}")
    val out = new Array[Byte](cb.m)
    var s = 0
    while (s < cb.m) {
      val off = s * cb.dsub
      val book = cb.books(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cb.ksub) {
        var dist = 0.0
        var d = 0
        while (d < cb.dsub) {
          val diff = v.getDouble(off + d) - book(j)(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestD) { bestD = dist; best = j } // strict < ⇒ ties to lowest j
        j += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  /** Static helper invoked from generated code. */
  def dotSym(a: Array[Byte], b: Array[Byte], cb: Codebooks): Double = {
    val n = math.min(math.min(a.length, b.length), cb.m)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += cb.table(i)((a(i) & 0xff) * cb.ksub + (b(i) & 0xff))
      i += 1
    }
    s
  }

  /** Static helper invoked from generated code. */
  def dotAsym(v: ArrayData, b: Array[Byte], cb: Codebooks): Double = {
    val n = math.min(b.length, cb.m)
    var s = 0.0
    var i = 0
    while (i < n) {
      val book = cb.books(i)(b(i) & 0xff)
      val off = i * cb.dsub
      var d = 0
      while (d < cb.dsub && off + d < v.numElements()) {
        s += v.getDouble(off + d) * book(d)
        d += 1
      }
      i += 1
    }
    s
  }

  /** Analysis-time fold of the foldable codebook literal (arg 1) into
    * a [[Codebooks]] — same pattern as [[IvfAssign.fromArgs]]. */
  private def fold(e: Expression): Codebooks = {
    require(e.foldable, "pq codebooks must be a literal")
    val ad = e.eval().asInstanceOf[ArrayData]
    Codebooks(Array.tabulate(ad.numElements()) { s =>
      val sub = ad.getArray(s)
      Array.tabulate(sub.numElements())(j => sub.getArray(j).toDoubleArray())
    })
  }

  def encodeFromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"pq_encode expects (v, codebooks), got ${exprs.length}")
    PqEncode(exprs.head, fold(exprs(1)))
  }

  def dotFromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"pq_dot expects (a, b, codebooks), got ${exprs.length}")
    PqDot(exprs.head, exprs(1), fold(exprs(2)))
  }

  def dotAsymFromArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, s"pq_dot_asym expects (v, code, codebooks), got ${exprs.length}")
    PqDotAsym(exprs.head, exprs(1), fold(exprs(2)))
  }
}
