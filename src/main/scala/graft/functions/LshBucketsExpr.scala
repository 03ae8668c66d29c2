package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All multi-table LSH bucket keys of one vector in a single pass:
  * `lsh_buckets(embedding, weightMatrix, k)` → ARRAY<BIGINT> of
  * `weightMatrix.length / k` buckets, where bucket t sets bit p iff
  * dot(embedding, weightMatrix[t*k+p]) > 0.
  *
  * Why not one `seqdot` column per plane: a 8-table × 12-plane signature
  * emits 96 independent 64-iteration loops into one generated method —
  * past the JIT/huge-method thresholds the whole stage drops out of
  * compiled execution (measured: em_cosine_neardup 3.0 s → 6.7 s). This
  * expression is ONE nested loop over a driver-materialized double[][]
  * (codegen references the object; the weight literal is never re-parsed
  * per row), so generated code size is constant in tables × planes.
  *
  * Parity contract: each plane's dot is the same left-to-right IEEE
  * double fold as SeqDotExpr / the oracle's `list_reduce` — identical
  * results, bucket t = Σ (1L << p) over positive planes, matching the
  * former per-plane `when(seqdot > 0, 1L << p)` sum. Null element or
  * dims ≠ weight length → null.
  */
final case class LshBucketsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  private def elemType: DataType = first.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val childOk = elemType == FloatType || elemType == DoubleType
    val wOk = second.foldable && (second.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _                                      => false
    })
    val kOk = third.foldable && third.dataType == IntegerType
    if (childOk && wOk && kOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "lsh_buckets requires (ARRAY<FLOAT|DOUBLE>, foldable ARRAY<ARRAY<DOUBLE>>, foldable INT)")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lsh_buckets"

  /** Driver-materialized weight matrix (planes × dims); the codegen path
    * references this object instead of re-evaluating the literal. */
  @transient private lazy val matrix: Array[Array[Double]] = {
    val ad = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(i => ad.getArray(i).toDoubleArray())
  }
  @transient private lazy val k: Int = third.eval().asInstanceOf[Int]

  /** Called from both eval and generated code — keep signature stable. */
  def compute(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val planes = matrix.length
    val dims = if (planes == 0) 0 else matrix(0).length
    val n = arr.numElements()
    if (n != dims) return null
    var i = 0
    while (i < n) { if (arr.isNullAt(i)) return null; i += 1 }
    val tables = planes / k
    val buckets = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < k) {
        val w = matrix(t * k + p)
        var acc = 0.0
        var j = 0
        while (j < dims) {
          val x = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
          acc = acc + x * w(j)
          j += 1
        }
        if (acc > 0) b += (1L << p)
        p += 1
      }
      buckets(t) = b
      t += 1
    }
    new GenericArrayData(buckets)
  }

  override protected def nullSafeEval(arr: Any, w: Any, kv: Any): Any =
    compute(arr.asInstanceOf[ArrayData], elemType == FloatType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshExpr", this, classOf[LshBucketsExpr].getName)
    val isFloat = (elemType == FloatType).toString
    nullSafeCodeGen(ctx, ev, (a, _, _) => {
      val res = ctx.freshName("res")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res = $self.compute($a, $isFloat);
         |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res; }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshBucketsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object LshBucketsExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lsh_buckets", args => LshBucketsExpr(args(0), args(1), args(2)), "built-in")
}
