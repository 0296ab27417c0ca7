package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for SQ8 scalar quantization — the
  * memory rung of the ANN family (FAISS's `SQ8`): each float of an
  * embedding is quantized to one byte against the vector's own
  * [min, max] range, so a 64-dim float64 corpus column shrinks from
  * 512 B to 64 B codes + 16 B of per-vector range parameters (~6.4×;
  * 8× against float32 storage). At 100 TB of embeddings that is the
  * difference between an index that fits executor memory and one that
  * spills — and UNLIKE product quantization there is no trained
  * codebook: encoding is pure per-row arithmetic (deterministic IEEE
  * ops + integer rounding), which keeps it zero-shuffle at ingest AND
  * lets a SQL oracle replay the whole encode→reconstruct→score path
  * bit-for-bit (q79).
  *
  * Encode rule (engine-portable): mn = min(v), scale = (max(v) − mn)
  * / 255; code_i = clamp(floor((v_i − mn)/scale + 0.5), 0, 255)
  * (floor(x + 0.5) rather than any round() builtin — HALF_UP vs
  * HALF_EVEN differs between engines); constant vectors (scale = 0)
  * code to 0. Reconstruction r_i = mn + code_i·scale. [[Sq8Dot]]
  * scores the dot product of two RECONSTRUCTIONS in one sequential
  * fold over the byte codes — the asymmetric-distance trick stays
  * available to callers (encode corpus only, keep queries exact), but
  * the symmetric form is what the cached index uses: it never touches
  * the original floats again. */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode requires ARRAY<DOUBLE> input, got ${t.catalogString}")
  }

  override def dataType: DataType = Sq8Encode.schema
  // null for empty arrays even when the input is non-null
  override def nullable: Boolean = true
  override def prettyName: String = "sq8_encode"

  override protected def nullSafeEval(input: Any): Any =
    Sq8Encode.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = graft.plans.Sq8Encode.encode($in);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

object Sq8Encode {
  val schema: StructType = StructType(Seq(
    StructField("mn", DoubleType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("codes", BinaryType, nullable = false)))

  /** Field-name/type match IGNORING nullability: a persisted SQ8 index
    * round-tripped through parquet comes back with nullable struct
    * fields (parquet groups drop the non-null guarantee), and an exact
    * StructType equality would reject that valid data at analysis. */
  def schemaMatches(t: DataType): Boolean = t match {
    case s: StructType =>
      s.length == schema.length &&
        s.fields.zip(schema.fields).forall { case (a, b) =>
          a.name == b.name && a.dataType == b.dataType }
    case _ => false
  }

  /** Static helper invoked from generated code. */
  def encode(v: ArrayData): InternalRow = {
    val n = v.numElements()
    if (n == 0) return null
    var mn = Double.PositiveInfinity
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val scale = (mx - mn) / 255.0
    val codes = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val c = math.floor((v.getDouble(i) - mn) / scale + 0.5)
        codes(i) = (if (c < 0) 0 else if (c > 255) 255 else c.toInt).toByte
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](mn, scale, codes))
  }
}

/** Dot product of two SQ8 RECONSTRUCTIONS: Σ (mnA + cA_i·scaleA) ·
  * (mnB + cB_i·scaleB), one sequential codegen'd fold over the byte
  * codes — the identical summation order to the oracle's list fold,
  * so `round(cos, 4)` values hash-match. Shorter input wins (same
  * defensive rule as [[VecDot]]). */
case class Sq8Dot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (a, b) if Sq8Encode.schemaMatches(a) && Sq8Encode.schemaMatches(b) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_dot requires two sq8_encode structs, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sq8Dot.dot(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Sq8Dot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8Dot =
    copy(left = newLeft, right = newRight)
}

object Sq8Dot {
  /** Static helper invoked from generated code. */
  def dot(a: InternalRow, b: InternalRow): Double = {
    val mnA = a.getDouble(0); val sA = a.getDouble(1)
    val mnB = b.getDouble(0); val sB = b.getDouble(1)
    val cA = a.getBinary(2); val cB = b.getBinary(2)
    val n = math.min(cA.length, cB.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += (mnA + (cA(i) & 0xff) * sA) * (mnB + (cB(i) & 0xff) * sB)
      i += 1
    }
    s
  }
}

/** ASYMMETRIC SQ8 dot — the ADC (asymmetric distance computation)
  * standard: the QUERY side stays an exact float vector, only the
  * CORPUS side is reconstructed from its codes. Halves the
  * quantization noise in the score at zero extra corpus memory (the
  * query vector exists in full precision anyway — a streaming probe
  * arrives as floats, a batch query is one row), which is why FAISS
  * scores IVF-SQ/PQ probes asymmetrically by default. Exactly equals
  * [[VecDot]] of the query against the reconstruction (test-pinned). */
case class Sq8DotAsym(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), b) if Sq8Encode.schemaMatches(b) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq8_dot_asym requires (ARRAY<DOUBLE>, sq8 struct), got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_dot_asym"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Sq8DotAsym.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.Sq8DotAsym.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Sq8DotAsym =
    copy(left = newLeft, right = newRight)
}

object Sq8DotAsym {
  /** Static helper invoked from generated code. */
  def dot(v: ArrayData, b: InternalRow): Double = {
    val mnB = b.getDouble(0); val sB = b.getDouble(1)
    val cB = b.getBinary(2)
    val n = math.min(v.numElements(), cB.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += v.getDouble(i) * (mnB + (cB(i) & 0xff) * sB)
      i += 1
    }
    s
  }
}
