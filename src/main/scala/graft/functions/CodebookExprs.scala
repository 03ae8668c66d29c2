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
    * returns -1 when a null element is hit (→ null result). r12: partial-
    * distance elimination — the fold aborts once the raw accumulator
    * reaches `rawCut = nextUp((best + 0.5)/1e6)`, past which the
    * quantized distance provably exceeds `best` (index order keeps the
    * first winner, so an aborted ≥-tie loses either way). The FIRST
    * codeword of a range always folds fully, preserving the null scan of
    * every input element. */
  protected def argminRange(a: ArrayData, aOff: Int, from: Int, until: Int): Int = {
    val lFloat = vecElemType == FloatType
    var best = Long.MaxValue
    var bestIdx = -1
    var rawCut = Double.MaxValue
    var j = from
    while (j < until) {
      var acc = 0.0
      var i = 0
      while (i < bookDim && acc < rawCut) {
        if (a.isNullAt(aOff + i)) return -1
        val x = if (lFloat) a.getFloat(aOff + i).toDouble else a.getDouble(aOff + i)
        val d = x - flatBooks(j * bookDim + i)
        acc = acc + d * d
        i += 1
      }
      if (i == bookDim && acc < rawCut) {
        val d2 = math.floor(acc * 1000000.0 + 0.5).toLong
        if (d2 < best) {
          best = d2; bestIdx = j - from
          rawCut = Math.nextUp((best + 0.5) / 1000000.0)
        }
      }
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
  * null element or length mismatch → null.
  *
  * r12: the same exact pruning as `cb_argmin_i` (norm-ordered two-pointer
  * visitation + monotone triangle-bound side cutoff + partial-distance
  * elimination), adapted to the quantized comparison: a center is skipped
  * or a fold aborted only when the RAW accumulator provably lands at or
  * past `rawCut = nextUp((best + 0.5) / 1e6)` — the exact raw threshold
  * beyond which floor(acc·1e6 + 0.5) > best, so the discarded center
  * loses even the tie (the 1e-6 bound slack and the nextUp absorb every
  * floating rounding conservatively). Out-of-order exact ties adjudicate
  * to the lower index explicitly. Bit-identical (idx) to the brute scan
  * on every input — ArgminPruningSpec cross-checks. This is the IVF
  * corpus-assignment loop, where K reaches MAXLISTS = 4096. */
final case class CodebookArgminExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodebookFold {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "cb_argmin"

  /** Center visitation order by (‖c‖ asc, idx asc) + norms — driver-side
    * once, shipped as flat reference arrays. */
  private lazy val normData: (Array[Int], Array[Double]) = {
    val n2 = Array.tabulate(nBooks) { j =>
      var s = 0.0; var i = 0
      while (i < bookDim) { val v = flatBooks(j * bookDim + i); s += v * v; i += 1 }
      s
    }
    val order = (0 until nBooks).sortBy(j => (n2(j), j)).toArray
    (order, order.map(j => math.sqrt(n2(j))))
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    if (a.numElements() != bookDim) return null
    val lFloat = vecElemType == FloatType
    val x = new Array[Double](bookDim)
    var nx2 = 0.0
    var i = 0
    while (i < bookDim) {
      if (a.isNullAt(i)) return null
      val v = if (lFloat) a.getFloat(i).toDouble else a.getDouble(i)
      x(i) = v; nx2 += v * v; i += 1
    }
    val (order, sN) = normData
    val nx = math.sqrt(nx2)
    var lo = 0; var hi = nBooks
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sN(mid) < nx) lo = mid + 1 else hi = mid
    }
    var p = lo - 1; var q = lo
    var best = Long.MaxValue; var bestIdx = -1
    var rawCut = Double.MaxValue
    while (p >= 0 || q < nBooks) {
      val takeLeft = q >= nBooks || (p >= 0 && nx - sN(p) <= sN(q) - nx)
      val pos = if (takeLeft) p else q
      val gap = if (takeLeft) nx - sN(pos) else sN(pos) - nx
      if (gap * gap - 1e-6 - 4.0 * Math.ulp(gap * gap) >= rawCut) {
        if (takeLeft) p = -1 else q = nBooks
      } else {
        val cIdx = order(pos)
        val base = cIdx * bookDim
        var acc = 0.0
        var k = 0
        while (k < bookDim && acc < rawCut) {
          val d = x(k) - flatBooks(base + k); acc += d * d; k += 1
        }
        if (k == bookDim && acc < rawCut) {
          val d2 = math.floor(acc * 1000000.0 + 0.5).toLong
          if (d2 < best || (d2 == best && cIdx < bestIdx)) {
            best = d2; bestIdx = cIdx
            rawCut = Math.nextUp((best + 0.5) / 1000000.0)
          }
        }
        if (takeLeft) p -= 1 else q += 1
      }
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val flat = ctx.addReferenceObj("flatBooks", flatBooks, "double[]")
      val ord = ctx.addReferenceObj("normOrder", normData._1, "int[]")
      val sN = ctx.addReferenceObj("sortedNorm", normData._2, "double[]")
      val x = ctx.addMutableState("double[]", "cbArgminVecD",
        v => s"$v = new double[$bookDim];")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val v = ctx.freshName("v"); val nx2 = ctx.freshName("nx2")
      val nx = ctx.freshName("nx"); val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi"); val mid = ctx.freshName("mid")
      val p = ctx.freshName("p"); val q = ctx.freshName("q")
      val takeLeft = ctx.freshName("takeLeft"); val pos = ctx.freshName("pos")
      val gap = ctx.freshName("gap"); val cIdx = ctx.freshName("cIdx")
      val base = ctx.freshName("base"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val d2 = ctx.freshName("d2")
      val best = ctx.freshName("best"); val bestIdx = ctx.freshName("bestIdx")
      val rawCut = ctx.freshName("rawCut")
      s"""
         |if ($a.numElements() != $bookDim) { ${ev.isNull} = true; } else {
         |  double $nx2 = 0.0;
         |  for (int $i = 0; $i < $bookDim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $v = ${vecGetter(a, i)}; $x[$i] = $v; $nx2 += $v * $v;
         |  }
         |  if (!${ev.isNull}) {
         |    double $nx = Math.sqrt($nx2);
         |    int $lo = 0, $hi = $nBooks;
         |    while ($lo < $hi) {
         |      int $mid = ($lo + $hi) >>> 1;
         |      if ($sN[$mid] < $nx) $lo = $mid + 1; else $hi = $mid;
         |    }
         |    int $p = $lo - 1, $q = $lo;
         |    long $best = Long.MAX_VALUE; int $bestIdx = -1;
         |    double $rawCut = Double.MAX_VALUE;
         |    while ($p >= 0 || $q < $nBooks) {
         |      boolean $takeLeft = $q >= $nBooks ||
         |        ($p >= 0 && $nx - $sN[$p] <= $sN[$q] - $nx);
         |      int $pos = $takeLeft ? $p : $q;
         |      double $gap = $takeLeft ? $nx - $sN[$pos] : $sN[$pos] - $nx;
         |      if ($gap * $gap - 1e-6 - 4.0 * Math.ulp($gap * $gap) >= $rawCut) {
         |        if ($takeLeft) $p = -1; else $q = $nBooks;
         |      } else {
         |        int $cIdx = $ord[$pos];
         |        int $base = $cIdx * $bookDim;
         |        double $acc = 0.0;
         |        int $k = 0;
         |        for (; $k < $bookDim && $acc < $rawCut; $k++) {
         |          double $d = $x[$k] - $flat[$base + $k]; $acc += $d * $d;
         |        }
         |        if ($k == $bookDim && $acc < $rawCut) {
         |          long $d2 = (long) Math.floor($acc * 1000000.0 + 0.5);
         |          if ($d2 < $best || ($d2 == $best && $cIdx < $bestIdx)) {
         |            $best = $d2; $bestIdx = $cIdx;
         |            $rawCut = Math.nextUp(($best + 0.5) / 1000000.0);
         |          }
         |        }
         |        if ($takeLeft) $p--; else $q++;
         |      }
         |    }
         |    ${ev.value} = $bestIdx;
         |  }
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
      val out = ctx.freshName("out"); val rawCut = ctx.freshName("rawCut")
      // PDE mirror of argminRange: abort a fold at acc >= rawCut (the
      // quantized distance then provably exceeds best; index order keeps
      // the first winner). Codeword 0 of each subspace folds fully, so
      // the per-element null scan is preserved.
      s"""
         |if ($a.numElements() != ${m * bookDim}) { ${ev.isNull} = true; } else {
         |  int[] $out = new int[$m];
         |  for (int $mi = 0; $mi < $m && !${ev.isNull}; $mi++) {
         |    long $best = Long.MAX_VALUE; int $bestIdx = -1;
         |    double $rawCut = Double.MAX_VALUE;
         |    for (int $j = 0; $j < $kPerM && !${ev.isNull}; $j++) {
         |      double $acc = 0.0;
         |      int $i = 0;
         |      for (; $i < $bookDim && $acc < $rawCut; $i++) {
         |        if ($a.isNullAt($mi * $bookDim + $i)) { ${ev.isNull} = true; break; }
         |        double $d = ${vecGetter(a, s"$mi * $bookDim + $i")}
         |          - $flat[(($mi * $kPerM + $j) * $bookDim) + $i];
         |        $acc = $acc + $d * $d;
         |      }
         |      if (!${ev.isNull} && $i == $bookDim && $acc < $rawCut) {
         |        long $d2 = (long) Math.floor($acc * 1000000.0 + 0.5);
         |        if ($d2 < $best) {
         |          $best = $d2; $bestIdx = $j;
         |          $rawCut = Math.nextUp(($best + 0.5) / 1000000.0);
         |        }
         |      }
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
  * dist = Σ(x−y)², ties broken by LOWER index, with ONE flat `long[]`
  * reference object (the literal-array plan stops fitting whole-stage
  * codegen as K grows past ~tens of centroids).
  *
  * r12: EXACT search pruning. Lloyd's assignment is N×K×dim by brute
  * force, and K grows with the corpus under the adaptive rule
  * (K = N/256), making the pass quadratic in work — the em_semdedup
  * decade's honest ceiling. Classic exact accelerations (Elkan/Hamerly
  * family, driver-state-free variants) cut the evaluated centers without
  * changing ANY output bit:
  *   - the vector is copied out and null-checked ONCE (this also fixes
  *     the per-(center×dim) virtual `getLong` dispatch);
  *   - centers are visited in |‖x‖−‖c‖| order (two-pointer walk over a
  *     norm-sorted permutation, found by binary search): when the
  *     triangle lower bound (‖x‖−‖c‖)² of the NEXT center on a side
  *     exceeds the best distance, the WHOLE side is exhausted — the
  *     bound is monotone along each direction. The bound is evaluated in
  *     double with a −2.0 slack, strictly wider than the ≤1 absolute
  *     error of the sqrt/square rounding at these magnitudes (coords ≤
  *     2²⁴, d² ≤ 2⁵³), so a skip implies dist > best EXACTLY;
  *   - within a center, partial-distance elimination: the running sum is
  *     monotone, so `acc > best` aborts the fold (`>`, not `≥` — a
  *     final acc EQUAL to best can still win the tie on lower index,
  *     which out-of-index-order visitation must adjudicate explicitly).
  * Identical (dist, idx) to the brute-force scan on every input — the
  * tie rule is (dist asc, idx asc) min either way; ArgminPruningSpec
  * cross-checks against the naive fold on adversarial ties.
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

  /** Norm-sorted visitation order: center indices by (‖c‖² asc, idx asc),
    * their squared norms, and their norms — driver-side once, shipped as
    * three flat reference arrays. */
  private lazy val normData: (Array[Int], Array[Long], Array[Double]) = {
    val n2 = Array.tabulate(nBooks) { j =>
      var s = 0L; var i = 0
      while (i < bookDim) { val v = flatBooks(j * bookDim + i); s += v * v; i += 1 }
      s
    }
    val order = (0 until nBooks).sortBy(j => (n2(j), j)).toArray
    (order, order.map(n2), order.map(j => math.sqrt(n2(j).toDouble)))
  }

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
    val x = new Array[Long](bookDim)
    var nx2 = 0L
    var i = 0
    while (i < bookDim) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i); x(i) = v; nx2 += v * v; i += 1
    }
    val (order, sN2, sN) = normData
    val nx = math.sqrt(nx2.toDouble)
    // lower bound: first norm-order position with ‖c‖² ≥ ‖x‖²
    var lo = 0; var hi = nBooks
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sN2(mid) < nx2) lo = mid + 1 else hi = mid
    }
    var p = lo - 1; var q = lo
    var best = Long.MaxValue; var bestIdx = -1
    while (p >= 0 || q < nBooks) {
      val takeLeft = q >= nBooks || (p >= 0 && nx - sN(p) <= sN(q) - nx)
      val pos = if (takeLeft) p else q
      val gap = if (takeLeft) nx - sN(pos) else sN(pos) - nx
      if (gap * gap - 16.0 - 4.0 * Math.ulp(gap * gap) > best.toDouble) {
        // bound only grows along this direction: side exhausted
        if (takeLeft) p = -1 else q = nBooks
      } else {
        val cIdx = order(pos)
        val base = cIdx * bookDim
        var acc = 0L
        var k = 0
        while (k < bookDim && acc <= best) {
          val d = x(k) - flatBooks(base + k); acc += d * d; k += 1
        }
        if (k == bookDim && (acc < best || (acc == best && cIdx < bestIdx)))
          { best = acc; bestIdx = cIdx }
        if (takeLeft) p -= 1 else q += 1
      }
    }
    new GenericArrayData(Array(best, bestIdx.toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val flat = ctx.addReferenceObj("flatBooksI", flatBooks, "long[]")
      val ord = ctx.addReferenceObj("normOrder", normData._1, "int[]")
      val sN2 = ctx.addReferenceObj("sortedNorm2", normData._2, "long[]")
      val sN = ctx.addReferenceObj("sortedNorm", normData._3, "double[]")
      val x = ctx.addMutableState("long[]", "cbArgminVec",
        v => s"$v = new long[$bookDim];")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val v = ctx.freshName("v"); val nx2 = ctx.freshName("nx2")
      val nx = ctx.freshName("nx"); val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi"); val mid = ctx.freshName("mid")
      val p = ctx.freshName("p"); val q = ctx.freshName("q")
      val takeLeft = ctx.freshName("takeLeft"); val pos = ctx.freshName("pos")
      val gap = ctx.freshName("gap"); val cIdx = ctx.freshName("cIdx")
      val base = ctx.freshName("base"); val acc = ctx.freshName("acc")
      val d = ctx.freshName("d"); val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      s"""
         |if ($a.numElements() != $bookDim) { ${ev.isNull} = true; } else {
         |  long $nx2 = 0L;
         |  for (int $i = 0; $i < $bookDim; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $v = $a.getLong($i); $x[$i] = $v; $nx2 += $v * $v;
         |  }
         |  if (!${ev.isNull}) {
         |    double $nx = Math.sqrt((double) $nx2);
         |    int $lo = 0, $hi = $nBooks;
         |    while ($lo < $hi) {
         |      int $mid = ($lo + $hi) >>> 1;
         |      if ($sN2[$mid] < $nx2) $lo = $mid + 1; else $hi = $mid;
         |    }
         |    int $p = $lo - 1, $q = $lo;
         |    long $best = Long.MAX_VALUE; int $bestIdx = -1;
         |    while ($p >= 0 || $q < $nBooks) {
         |      boolean $takeLeft = $q >= $nBooks ||
         |        ($p >= 0 && $nx - $sN[$p] <= $sN[$q] - $nx);
         |      int $pos = $takeLeft ? $p : $q;
         |      double $gap = $takeLeft ? $nx - $sN[$pos] : $sN[$pos] - $nx;
         |      if ($gap * $gap - 16.0 - 4.0 * Math.ulp($gap * $gap) > (double) $best) {
         |        if ($takeLeft) $p = -1; else $q = $nBooks;
         |      } else {
         |        int $cIdx = $ord[$pos];
         |        int $base = $cIdx * $bookDim;
         |        long $acc = 0L;
         |        int $k = 0;
         |        for (; $k < $bookDim && $acc <= $best; $k++) {
         |          long $d = $x[$k] - $flat[$base + $k]; $acc += $d * $d;
         |        }
         |        if ($k == $bookDim &&
         |            ($acc < $best || ($acc == $best && $cIdx < $bestIdx))) {
         |          $best = $acc; $bestIdx = $cIdx;
         |        }
         |        if ($takeLeft) $p--; else $q++;
         |      }
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      new long[]{$best, (long) $bestIdx});
         |  }
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
