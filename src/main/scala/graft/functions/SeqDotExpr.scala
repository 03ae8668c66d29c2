package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential dot product Σᵢ a[i]·b[i] as a native codegen expression.
  *
  * The embedding operators (EmbedOps: cosine KNN, LSH signatures, norms)
  * previously expressed this fold as `aggregate(zip_with(a, b, _*_), 0.0,
  * _+_)` — Catalyst's higher-order functions are CodegenFallback, so every
  * row paid interpreted lambda dispatch per element (64 dims × up to 96
  * hyperplanes per row in the LSH signature). This expression emits a tight
  * Java loop inside WholeStageCodegen instead (builder guidance: native
  * Expression > UDF > anything else).
  *
  * EXACT parity contract with the HOF formulation and the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, list_transform(...)))`: the fold is the
  * same left-to-right sequence of IEEE doubles — acc = acc + (x·y), one
  * element at a time, floats widened exactly — so results are bit-identical
  * and the oracle comparisons are unaffected. Null element or length
  * mismatch → null, matching zip_with's null padding propagated through
  * `+`/`*`.
  */
final case class SeqDotExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"seqdot requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "seqdot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lFloat = elemType(left) == FloatType
    val rFloat = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc = acc + x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = $acc + ${getter(elemType(left), a, i)} * ${getter(elemType(right), b, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqDotExpr =
    copy(left = newLeft, right = newRight)
}

object SeqDotExpr {
  /** Register `seqdot(a, b)` in the session's function registry (the
    * SparkSessionExtensions-style injection point, applied per session). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seqdot", args => SeqDotExpr(args(0), args(1)), "built-in")
}
