package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact Cauchy–Schwarz pruning for thresholded cosine verification.
  *
  * The ≥0.95-cosine verify phases (em_cosine_neardup, em_semdedup) fold
  * the FULL dim-length dot product for every candidate pair, then filter —
  * but most candidates are far below the threshold, and a partial dot plus
  * the Cauchy–Schwarz bound on the remaining suffix
  * (Σ_{j<k} x_j y_j + ‖x_{≥k}‖·‖y_{≥k}‖ ≥ dot) proves that after a few
  * checkpoints. For a near-orthogonal pair the bound drops like
  * (1 − k/dim)·‖x‖‖y‖, crossing 0.95·‖x‖‖y‖ within the first checkpoint
  * or two, so the verify cost per rejected pair falls from dim to ~8–16
  * multiplies.
  *
  * Exactness: a pair is pruned ONLY when the computed upper bound is
  * below threshold·‖x‖·‖y‖·(1 − 1e-9) — the 1e-9 relative slack strictly
  * dominates the ~1e-13 relative rounding of the fold, the precomputed
  * suffix norms, and the norm-computation difference (suffix[0] is a
  * right-to-left sum, the plan's `norm()` a left-to-right one). A pruned
  * pair therefore has computed cosine < threshold EXACTLY (it could never
  * pass the plan's own filter), and a surviving pair returns the very same
  * left-to-right IEEE fold `seqdot` computes — downstream sim_micro values
  * are bit-identical. The DuckDB oracles stay on the unpruned formulation,
  * cross-checking the claim on every gate run.
  */
object CosPruneExprs {

  val STEP = 8 // checkpoint spacing (dims between bound tests)

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sfx_norms", args => SuffixNormsExpr(args(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_ge", args => {
        require(args.length == 5 && args(4).foldable,
          "dot_ge(a, b, sfx_a, sfx_b, thresholdLiteral)")
        val th = args(4).eval(null) match {
          case d: java.lang.Double => d.doubleValue()
          case x => x.toString.toDouble
        }
        DotGeExpr(args(0), args(1), args(2), args(3), th)
      }, "built-in")
  }
}

/** `sfx_norms(vec)` → ARRAY<DOUBLE> of ⌈n/8⌉ checkpoint suffix norms:
  * out[t] = sqrt(Σ_{j ≥ 8t} vec[j]²) — the per-vector precomputation the
  * bounded dot fold consumes. One backward pass, one sqrt per checkpoint.
  * Null element → null. */
final case class SuffixNormsExpr(child: Expression) extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"sfx_norms requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sfx_norms"

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val lFloat = elemType == FloatType
    val nChk = (n + CosPruneExprs.STEP - 1) / CosPruneExprs.STEP
    val out = new Array[Double](math.max(nChk, 1))
    var acc = 0.0
    var i = n - 1
    while (i >= 0) {
      if (a.isNullAt(i)) return null
      val x = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      acc += x * x
      if (i % CosPruneExprs.STEP == 0) out(i / CosPruneExprs.STEP) = math.sqrt(acc)
      i -= 1
    }
    if (n == 0) out(0) = 0.0
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val step = CosPruneExprs.STEP
    val getter = elemType match {
      case FloatType => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case _         => (a: String, i: String) => s"$a.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val nChk = ctx.freshName("nChk")
      val out = ctx.freshName("out"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |int $nChk = ($n + ${step - 1}) / $step; if ($nChk == 0) $nChk = 1;
         |double[] $out = new double[$nChk];
         |double $acc = 0.0;
         |for (int $i = $n - 1; $i >= 0 && !${ev.isNull}; $i--) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $x = ${getter(a, i)};
         |  $acc += $x * $x;
         |  if ($i % $step == 0) $out[$i / $step] = Math.sqrt($acc);
         |}
         |if (!${ev.isNull})
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): SuffixNormsExpr =
    copy(child = newChild)
}

/** `dot_ge(a, b, sfx_a, sfx_b, th)` → DOUBLE: the exact `seqdot(a, b)`
  * left fold when the pair's cosine can reach `th`, NULL when the
  * checkpointed Cauchy–Schwarz bound proves it cannot (see object doc for
  * the exactness argument). NULL also on length mismatch / null elements,
  * matching seqdot. The caller's `WHERE sim_micro >= threshold` drops the
  * NULLs a fraction of a fold earlier than it would have dropped the
  * computed values. */
final case class DotGeExpr(a: Expression, b: Expression,
    sa: Expression, sb: Expression, th: Double) extends QuaternaryExpression {

  override def first: Expression = a
  override def second: Expression = b
  override def third: Expression = sa
  override def fourth: Expression = sb

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(a), elemType(b), elemType(sa), elemType(sb)) match {
      case (FloatType | DoubleType, FloatType | DoubleType, DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "dot_ge requires (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>, " +
          "ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " + children.map(_.dataType.catalogString))
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_ge"

  override protected def nullSafeEval(av: Any, bv: Any, sav: Any, sbv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]; val y = bv.asInstanceOf[ArrayData]
    val sx = sav.asInstanceOf[ArrayData]; val sy = sbv.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val step = CosPruneExprs.STEP
    val lFloat = elemType(a) == FloatType
    val rFloat = elemType(b) == FloatType
    // prune only when both suffix tables cover this length; otherwise run
    // the plain fold (robustness — never wrong, just unpruned)
    val nChk = (n + step - 1) / step
    val prune = sx.numElements() >= nChk && sy.numElements() >= nChk && nChk > 0
    val lim =
      if (prune) th * sx.getDouble(0) * sy.getDouble(0) * (1.0 - 1e-9) else 0.0
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (prune && i > 0 && i % step == 0 &&
          acc + sx.getDouble(i / step) * sy.getDouble(i / step) < lim) return null
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc = acc + xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val step = CosPruneExprs.STEP
    def getter(t: DataType, arr: String, i: String): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (x, y, sx, sy) => {
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val lim = ctx.freshName("lim")
      val nChk = ctx.freshName("nChk"); val prune = ctx.freshName("prune")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) { ${ev.isNull} = true; } else {
         |  int $nChk = ($n + ${step - 1}) / $step;
         |  boolean $prune = $nChk > 0 &&
         |    $sx.numElements() >= $nChk && $sy.numElements() >= $nChk;
         |  double $lim = $prune
         |    ? $th * $sx.getDouble(0) * $sy.getDouble(0) * (1.0 - 1e-9) : 0.0;
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($prune && $i > 0 && $i % $step == 0 &&
         |        $acc + $sx.getDouble($i / $step) * $sy.getDouble($i / $step) < $lim) {
         |      ${ev.isNull} = true; break;
         |    }
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = $acc + ${getter(elemType(a), x, i)} * ${getter(elemType(b), y, i)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, o: Expression): DotGeExpr =
    copy(a = f, b = s, sa = t, sb = o)
}
