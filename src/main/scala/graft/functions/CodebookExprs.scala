package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen nearest-codeword search — the ANN index-build hot loop.
  *
  * Why an expression and not `array_min(transform(lit_books, ...))`:
  * higher-order functions are CodegenFallback, so the HOF argmin pays an
  * interpreted lambda dispatch per (row × codeword) — at sf1 the PQ
  * encode is 20k vectors × 8 subspaces × 64 codewords = 10M interpreted
  * folds, the entire query cost. Here the codebook folds to a flat
  * `double[]` reference object and the generated code is two nested
  * primitive loops inside WholeStageCodegen, the shape a real ANN
  * encoder's inner loop has.
  *
  * EXACT parity contract with the plan-side formulation it replaces
  * (`l2micro` per codeword + min over (d2, cid)): the per-codeword fold
  * is acc = acc + (x−y)·(x−y) left to right (floats widened exactly, the
  * SeqL2Expr sequence), quantized floor(acc·1e6 + 0.5) BEFORE comparing,
  * ties broken by LOWER index. Callers order the codebook by cid
  * ascending, so index order IS cid order and the tie-break matches the
  * old (d2 asc, cid asc) window/array_min exactly.
  *
  * The codebook argument must be a foldable (literal) nested array —
  * it is evaluated once at plan time, not per row.
  */
trait CodebookFold { self: BinaryExpression =>

  protected def vecElemType: DataType = left.dataType match {
    case ArrayType(t, _) => t
    case _               => NullType
  }

  /** Evaluate the foldable books literal once: (flat row-major values,
    * codeword count, codeword dim). Overridden by PqEncodeExpr for the
    * 3-level literal. */
  protected lazy val booksData: (Array[Double], Int, Int) = {
    require(right.foldable, s"$prettyName: codebook must be a literal")
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val k = arr.numElements()
    require(k > 0, s"$prettyName: empty codebook")
    val first = arr.getArray(0)
    val dim = first.numElements()
    val flat = new Array[Double](k * dim)
    var j = 0
    while (j < k) {
      val cw = arr.getArray(j)
      require(cw.numElements() == dim, s"$prettyName: ragged codebook")
      var i = 0
      while (i < dim) { flat(j * dim + i) = cw.getDouble(i); i += 1 }
      j += 1
    }
    (flat, k, dim)
  }
  protected def flatBooks: Array[Double] = booksData._1
  protected def nBooks: Int = booksData._2
  protected def bookDim: Int = booksData._3

  override def checkInputDataTypes(): TypeCheckResult =
    (vecElemType, right.dataType) match {
      case (FloatType | DoubleType, ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, literal ARRAY<ARRAY<DOUBLE>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def nullable: Boolean = true

  /** Interpreted argmin over codewords [from, until) of the flat books;
    * returns -1 when a null element is hit (→ null result). */
  protected def argminRange(a: ArrayData, aOff: Int, from: Int, until: Int): Int = {
    val lFloat = vecElemType == FloatType
    var best = Long.MaxValue
    var bestIdx = -1
    var j = from
    while (j < until) {
      var acc = 0.0
      var i = 0
      while (i < bookDim) {
        if (a.isNullAt(aOff + i)) return -1
        val x = if (lFloat) a.getFloat(aOff + i).toDouble else a.getDouble(aOff + i)
        val d = x - flatBooks(j * bookDim + i)
        acc = acc + d * d
        i += 1
      }
      val d2 = math.floor(acc * 1000000.0 + 0.5).toLong
      if (d2 < best) { best = d2; bestIdx = j - from }
      j += 1
    }
    bestIdx
  }

  protected def vecGetter(arr: String, i: String): String = vecElemType match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }
}

/** `cb_argmin(vec, books)` → INT index (0-based, = position in `books`)
  * of the codeword minimizing (floor(l2·1e6+0.5), index). Null input or
  * null element or length mismatch → null. */
final case class CodebookArgminExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodebookFold {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "cb_argmin"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    if (a.numElements() != bookDim) return null
    val idx = argminRange(a, 0, 0, nBooks)
    if (idx < 0) null else idx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val flat = ctx.addReferenceObj("flatBooks", flatBooks, "double[]")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2"); val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      s"""
         |if ($a.numElements() != $bookDim) { ${ev.isNull} = true; } else {
         |  long $best = Long.MAX_VALUE; int $bestIdx = -1;
         |  for (int $j = 0; $j < $nBooks && !${ev.isNull}; $j++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $bookDim; $i++) {
         |      if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      double $d = ${vecGetter(a, i)} - $flat[$j * $bookDim + $i];
         |      $acc = $acc + $d * $d;
         |    }
         |    long $d2 = (long) Math.floor($acc * 1000000.0 + 0.5);
         |    if ($d2 < $best) { $best = $d2; $bestIdx = $j; }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $bestIdx;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookArgminExpr =
    copy(left = newLeft, right = newRight)
}

/** `pq_encode(vec, books3)` → ARRAY<INT> of M codes: for each subspace m,
  * the 0-based index of the nearest codeword in books3[m] against
  * vec[m·sub … (m+1)·sub). books3 is a foldable array<array<array<double>>>
  * with M equal-shaped (K × sub) books — the whole PQ encode runs as one
  * generated triple loop per row: no explode, no join, no shuffle. */
final case class PqEncodeExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodebookFold {

  // books3 flattens as M books of nBooksPerM codewords each; CodebookFold
  // sees it as (M·K) rows of dim sub after this adapter.
  private lazy val m: Int = {
    require(right.foldable, s"$prettyName: codebook must be a literal")
    right.eval(null).asInstanceOf[ArrayData].numElements()
  }
  private lazy val kPerM: Int = nBooks / m

  /** Flatten array<array<array<double>>> by treating (m, j) as one axis:
    * override the CodebookFold literal reader. */
  override protected lazy val booksData: (Array[Double], Int, Int) = {
    require(right.foldable, s"$prettyName: codebook must be a literal")
    val outer = right.eval(null).asInstanceOf[ArrayData]
    val mm = outer.numElements()
    require(mm > 0, s"$prettyName: empty codebook")
    val b0 = outer.getArray(0)
    val k = b0.numElements()
    require(k > 0, s"$prettyName: empty subspace book")
    val dim = b0.getArray(0).numElements()
    val flat = new Array[Double](mm * k * dim)
    var mi = 0
    while (mi < mm) {
      val book = outer.getArray(mi)
      require(book.numElements() == k, s"$prettyName: ragged books")
      var j = 0
      while (j < k) {
        val cw = book.getArray(j)
        require(cw.numElements() == dim, s"$prettyName: ragged codeword")
        var i = 0
        while (i < dim) { flat((mi * k + j) * dim + i) = cw.getDouble(i); i += 1 }
        j += 1
      }
      mi += 1
    }
    (flat, mm * k, dim)
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (vecElemType, right.dataType) match {
      case (FloatType | DoubleType,
            ArrayType(ArrayType(ArrayType(DoubleType, _), _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT|DOUBLE>, literal ARRAY<ARRAY<ARRAY<DOUBLE>>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    if (a.numElements() != m * bookDim) return null
    val out = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val idx = argminRange(a, mi * bookDim, mi * kPerM, (mi + 1) * kPerM)
      if (idx < 0) return null
      out(mi) = idx
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val flat = ctx.addReferenceObj("flatBooks", flatBooks, "double[]")
      val mi = ctx.freshName("mi"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best"); val bestIdx = ctx.freshName("bestIdx")
      val out = ctx.freshName("out")
      s"""
         |if ($a.numElements() != ${m * bookDim}) { ${ev.isNull} = true; } else {
         |  int[] $out = new int[$m];
         |  for (int $mi = 0; $mi < $m && !${ev.isNull}; $mi++) {
         |    long $best = Long.MAX_VALUE; int $bestIdx = -1;
         |    for (int $j = 0; $j < $kPerM && !${ev.isNull}; $j++) {
         |      double $acc = 0.0;
         |      for (int $i = 0; $i < $bookDim; $i++) {
         |        if ($a.isNullAt($mi * $bookDim + $i)) { ${ev.isNull} = true; break; }
         |        double $d = ${vecGetter(a, s"$mi * $bookDim + $i")}
         |          - $flat[(($mi * $kPerM + $j) * $bookDim) + $i];
         |        $acc = $acc + $d * $d;
         |      }
         |      long $d2 = (long) Math.floor($acc * 1000000.0 + 0.5);
         |      if ($d2 < $best) { $best = $d2; $bestIdx = $j; }
         |    }
         |    $out[$mi] = $bestIdx;
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeExpr =
    copy(left = newLeft, right = newRight)
}

/** `cb_argmin_i(vec, books)` → ARRAY<LONG> [dist, idx]: exact-INTEGER
  * nearest-codeword search for quantized coordinates (the Lloyd
  * assignment hot loop). Unlike `cb_argmin` (double accumulate +
  * micro-quantize — whose ×10⁶ rescale would exceed 2⁵³ on 2²⁰-quantized
  * inputs and blur ties), the fold here is pure long arithmetic:
  * dist = Σ(x−y)², ties broken by LOWER index — bit-identical to the
  * `array_min(array(struct(seql2i(q, cᵢ), i)))` formulation it replaces,
  * at any K, with ONE flat `long[]` reference object instead of K
  * struct literals (the literal-array plan stops fitting whole-stage
  * codegen as K grows past ~tens of centroids).
  * Null input / null element / length mismatch → null. */
final case class CodebookArgminLongExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cb_argmin_i"
  override def nullable: Boolean = true

  private lazy val booksData: (Array[Long], Int, Int) = {
    require(right.foldable, s"$prettyName: codebook must be a literal")
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val k = arr.numElements()
    require(k > 0, s"$prettyName: empty codebook")
    val dim = arr.getArray(0).numElements()
    val flat = new Array[Long](k * dim)
    var j = 0
    while (j < k) {
      val cw = arr.getArray(j)
      require(cw.numElements() == dim, s"$prettyName: ragged codebook")
      var i = 0
      while (i < dim) { flat(j * dim + i) = cw.getLong(i); i += 1 }
      j += 1
    }
    (flat, k, dim)
  }
  private def flatBooks: Array[Long] = booksData._1
  private def nBooks: Int = booksData._2
  private def bookDim: Int = booksData._3

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<BIGINT>, literal ARRAY<ARRAY<BIGINT>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    if (a.numElements() != bookDim) return null
    var best = Long.MaxValue
    var bestIdx = -1
    var j = 0
    while (j < nBooks) {
      var acc = 0L
      var i = 0
      while (i < bookDim) {
        if (a.isNullAt(i)) return null
        val d = a.getLong(i) - flatBooks(j * bookDim + i)
        acc += d * d
        i += 1
      }
      if (acc < best) { best = acc; bestIdx = j }
      j += 1
    }
    new GenericArrayData(Array(best, bestIdx.toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val flat = ctx.addReferenceObj("flatBooksI", flatBooks, "long[]")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val best = ctx.freshName("best"); val bestIdx = ctx.freshName("bestIdx")
      s"""
         |if ($a.numElements() != $bookDim) { ${ev.isNull} = true; } else {
         |  long $best = Long.MAX_VALUE; int $bestIdx = -1;
         |  for (int $j = 0; $j < $nBooks && !${ev.isNull}; $j++) {
         |    long $acc = 0L;
         |    for (int $i = 0; $i < $bookDim; $i++) {
         |      if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      long $d = $a.getLong($i) - $flat[$j * $bookDim + $i];
         |      $acc += $d * $d;
         |    }
         |    if (!${ev.isNull} && $acc < $best) { $best = $acc; $bestIdx = $j; }
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      new long[]{$best, (long) $bestIdx});
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodebookArgminLongExpr =
    copy(left = newLeft, right = newRight)
}

object CodebookExprs {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cb_argmin", args => CodebookArgminExpr(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode", args => PqEncodeExpr(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cb_argmin_i", args => CodebookArgminLongExpr(args(0), args(1)), "built-in")
  }
}
