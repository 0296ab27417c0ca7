package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: unsigned byte sum of a binary column.
  *
  * The multimodal pipeline treats media as opaque `binary`; cheap
  * byte-level features (checksums, frame signatures) must not leave
  * whole-stage codegen, so this is a real `Expression` with `doGenCode`
  * (preference order (b) of the build brief: native expression > UDF).
  */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_sum requires BINARY input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"

  override protected def nullSafeEval(input: Any): Any =
    ByteSum.sum(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ByteSum.sum($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)
}

object ByteSum {
  /** Static helper invoked from generated code. */
  def sum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }
}

/** Session registration for graft's native SQL functions. Idempotent:
  * re-registering an already-present function would log a "replaced a
  * previously registered function" warning per call site. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("byte_sum")
    if (!reg.functionExists(id))
      reg.createOrReplaceTempFunction(
        "byte_sum", exprs => ByteSum(exprs.head), "scala_udf")
  }
}

/** `SparkSessionExtensions` entry point: makes graft's native functions
  * available to any session via
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions` (the
  * injection route for cluster deployments, where sessions are built by
  * the platform rather than application code). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    ext.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("byte_sum"),
       new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
         classOf[ByteSum].getName, "byte_sum"),
       (exprs: Seq[Expression]) => ByteSum(exprs.head)))
}
