package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 32-bit as a native Catalyst expression with whole-stage codegen —
  * the write-path hot loop hashes every point (reference
  * `hash/hash.go:8-12`, public FNV parameters), so it must stay inside
  * Tungsten codegen rather than crossing a Scala-UDF boundary per row
  * (SURVEY §2.12 "upgrade to a codegen Expression if bench demands";
  * builder guidance: native Expression > UDF).
  *
  * Identical output to `cluster.Partitioner.fnv1a32` (spec-pinned against
  * the public FNV test vectors).
  */
final case class Fnv1a32Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fnv1a32 requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a32"

  override protected def nullSafeEval(input: Any): Any =
    Fnv1a32Expr.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv1a32Expr.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv1a32Expr =
    copy(child = newChild)
}

object Fnv1a32Expr {
  /** Called from generated code — keep signature stable. */
  def hash(bytes: Array[Byte]): Long = {
    var h = 0x811c9dc5L // FNV offset basis 2166136261
    var i = 0
    while (i < bytes.length) {
      h = h ^ (bytes(i) & 0xffL)
      h = (h * 0x01000193L) & 0xffffffffL // FNV prime 16777619, 32-bit wrap
      i += 1
    }
    h
  }

  /** Register `fnv1a32(str)` in the session's function registry so plans can
    * use it via `expr("fnv1a32(...)")` — the SparkSessionExtensions-style
    * injection point, applied per session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv1a32", args => Fnv1a32Expr(args.head), "built-in")
}
