package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sequential squared-L2 distance Σᵢ (a[i]−b[i])² as a native codegen
  * expression — SeqDotExpr's sibling for the IVF quantizer's hot loop.
  *
  * The IVF index build (EmbedOps.ivfKnn) evaluates this fold N·k times per
  * Lloyd pass; the `aggregate(zip_with(...))` HOF formulation is
  * CodegenFallback, and at sf0.1 (N=10⁴, k=100) the ~2M interpreted
  * 64-element folds dominated the query (2.1 s → the build is the whole
  * cost). Same tight-loop codegen treatment as seqdot.
  *
  * EXACT parity contract with the HOF form and the DuckDB oracle's
  * `list_reduce(list_prepend(0.0, list_transform(..., (e[i]-c[i])*(e[i]-c[i]))))`:
  * acc = acc + (x−y)·(x−y), left to right, one element at a time, floats
  * widened exactly — bit-identical results. Null element or length
  * mismatch → null, matching zip_with's null propagation.
  */
final case class SeqL2Expr(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (FloatType | DoubleType, FloatType | DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"seql2 requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "seql2"

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
      val d = x - y
      acc = acc + d * d
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
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${getter(elemType(left), a, i)} - ${getter(elemType(right), b, i)};
         |    $acc = $acc + $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqL2Expr =
    copy(left = newLeft, right = newRight)
}

object SeqL2Expr {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seql2", args => SeqL2Expr(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "seql2i", args => SeqL2LongExpr(args(0), args(1)), "built-in")
  }
}

/** Integer squared-L2 Σᵢ (a[i]−b[i])² over ARRAY<BIGINT> — the em_kmeans
  * hot loop (quantized ×2^20 coordinates, exact long distances). Long adds
  * are associative so parity with the `aggregate(zip_with(...))` HOF form
  * is exact by construction; this is the codegen escape from the HOF's
  * interpreted per-element dispatch (K × N folds per Lloyd pass). Null
  * element or length mismatch → null, matching zip_with. */
final case class SeqL2LongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _                      => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left) && isLongArray(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"seql2i requires two ARRAY<BIGINT> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "seql2i"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $a.getLong($i) - $b.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqL2LongExpr =
    copy(left = newLeft, right = newRight)
}
