package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram kernels — the gram-building step of the doc-text suite
  * (repetition stats, curation ledger, heavy hitters, shingling) as
  * generated loops instead of interpreted `transform(sequence(...))`
  * HOFs (CodegenFallback: one lambda dispatch + concat per position).
  *
  * Parity contract with the plan-side `transform` formulation: grams are
  * the space-joined k consecutive tokens at positions 0..n−k; fewer than
  * k tokens → EMPTY array (the DuckDB `generate_series(1, 0)` shape);
  * null token elements cannot occur from split() but are rendered as
  * concat would (null token → null gram element for word_grams; for
  * gram_stats a null gram forms its own size-1 run, never dup). */
object WordGramExprs {

  def grams(toks: ArrayData, k: Int): GenericArrayData = {
    val n = toks.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var nullGram = false
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k && !nullGram) {
        if (toks.isNullAt(i + j)) nullGram = true
        else {
          if (j > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j).toString)
        }
        j += 1
      }
      out(i) = if (nullGram) null else UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (best run, Σ runs > 1, gram count) via exact occurrence counting —
    * identical to run-length stats over any sorted gram array, since a
    * sort only serves to group equal grams adjacently. */
  def gramStats(toks: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    if (n < k) return InternalRow(0L, 0L, 0L)
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var nNullGrams = 0L
    var i = 0
    while (i <= n - k) {
      var nullGram = false
      var j = 0
      while (j < k && !nullGram) {
        if (toks.isNullAt(i + j)) nullGram = true
        j += 1
      }
      if (nullGram) nNullGrams += 1L
      else {
        val sb = new java.lang.StringBuilder()
        var j2 = 0
        while (j2 < k) {
          if (j2 > 0) sb.append(' ')
          sb.append(toks.getUTF8String(i + j2).toString)
          j2 += 1
        }
        val g = UTF8String.fromString(sb.toString)
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1L)) else c(0) += 1L
      }
      i += 1
    }
    var best = if (nNullGrams > 0) 1L else 0L
    var dup = 0L
    var total = nNullGrams
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0)
      if (c > best) best = c
      if (c > 1L) dup += c
      total += c
    }
    InternalRow(best, dup, total)
  }

  /** Count of tokens in each marker set (duplicates counted — the
    * `size(filter(toks, t -> t IN set))` semantics; null tokens skipped,
    * matching filter's null-drop). */
  def setCounts(toks: ArrayData, sets: Array[java.util.HashSet[UTF8String]]): GenericArrayData = {
    val out = new Array[Long](sets.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val t = toks.getUTF8String(i)
        var k = 0
        while (k < sets.length) {
          if (sets(k).contains(t)) out(k) += 1L
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_grams", args => WordGramsExpr(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "gram_stats", args => GramStatsExpr(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_set_counts", args => TokenSetCountsExpr(args(0), args(1)), "built-in")
  }
}

private[functions] trait GramArity { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        val k = right.eval(null).asInstanceOf[Int]
        if (k >= 1) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"$prettyName: k must be >= 1, got $k")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<STRING>, literal INT), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }
  protected lazy val kVal: Int = right.eval(null).asInstanceOf[Int]
  override def nullable: Boolean = left.nullable
}

/** `word_grams(toks, k)` → ARRAY<STRING> of space-joined k-grams. */
final case class WordGramsExpr(left: Expression, right: Expression)
    extends BinaryExpression with GramArity {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "word_grams"

  override protected def nullSafeEval(t: Any, k: Any): Any =
    WordGramExprs.grams(t.asInstanceOf[ArrayData], kVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordGramExprs.grams($t, $kVal);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): WordGramsExpr = copy(left = l, right = r)
}

/** `gram_stats(toks, k)` → STRUCT<best:BIGINT, dup:BIGINT, n:BIGINT>
  * over the k-grams of `toks` without materializing them. */
final case class GramStatsExpr(left: Expression, right: Expression)
    extends BinaryExpression with GramArity {
  override def dataType: DataType = StructType(Seq(
    StructField("best", LongType, nullable = false),
    StructField("dup", LongType, nullable = false),
    StructField("n", LongType, nullable = false)))
  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(t: Any, k: Any): Any =
    WordGramExprs.gramStats(t.asInstanceOf[ArrayData], kVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordGramExprs.gramStats($t, $kVal);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): GramStatsExpr = copy(left = l, right = r)
}

/** `token_set_counts(toks, sets)` → ARRAY<BIGINT>: per literal marker
  * set, the number of tokens contained in it (duplicates counted) — one
  * generated loop replacing K interpreted `size(filter(toks, IN set))`
  * HOFs (language-ID marker scoring, stopword counts). `sets` must be a
  * foldable ARRAY<ARRAY<STRING>>. */
final case class TokenSetCountsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _))
          if right.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"token_set_counts requires (ARRAY<STRING>, literal ARRAY<ARRAY<STRING>>), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private lazy val sets: Array[java.util.HashSet[UTF8String]] = {
    val outer = right.eval(null).asInstanceOf[ArrayData]
    (0 until outer.numElements()).map { k =>
      val s = new java.util.HashSet[UTF8String]()
      val inner = outer.getArray(k)
      var i = 0
      while (i < inner.numElements()) {
        if (!inner.isNullAt(i)) s.add(inner.getUTF8String(i).clone())
        i += 1
      }
      s
    }.toArray
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "token_set_counts"

  override protected def nullSafeEval(t: Any, s: Any): Any =
    WordGramExprs.setCounts(t.asInstanceOf[ArrayData], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerSets", sets, "java.util.HashSet[]")
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.WordGramExprs.setCounts($t, $ref);")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): TokenSetCountsExpr = copy(left = l, right = r)
}
