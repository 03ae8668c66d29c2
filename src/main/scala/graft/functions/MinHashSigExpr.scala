package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(shingles, a, b, p)` → ARRAY<BIGINT> of S seeded MinHash
  * minima: element s = min over shingles t of (a[s]·h60(t)%p·… ) — i.e.
  * x = h60(t) % p, then (a[s]·x + b[s]) % p, minimized over t.
  *
  * Why an expression: the plan-side formulation was ONE interpreted
  * `transform` for the content hashes plus S=8 interpreted
  * `array_min(transform(...))` passes per document — higher-order
  * functions are CodegenFallback, so every shingle×seed step paid a
  * lambda dispatch. Here the whole signature is one generated loop per
  * row (md5 once per shingle, then S multiply-mods), feeding
  * d_minhash_sig / d_lsh_pairs / d_dup_clusters.
  *
  * EXACT parity contract with the HOF form (the DuckDB oracle hash-match
  * depends on it):
  *   - h60(t) = conv(substring(md5(t),1,15),16,10) — the first 15 hex
  *     chars of the md5 = the unsigned big-endian value of the first 8
  *     bytes shifted right 4 (60 bits, always positive);
  *   - a[s]·x + b[s] stays below 2^63 for a,x < p ≈ 1e9 — no wrap,
  *     identical to the lambda's long arithmetic;
  *   - null shingle elements are SKIPPED (array_min semantics); an empty
  *     or all-null shingle set yields a NULL element per seed; a null
  *     shingles array yields a null result (getItem then returns null
  *     either way, matching the old per-column nulls).
  * `a`/`b`/`p` must be foldable (literals), evaluated once at plan time.
  */
final case class MinHashSigExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _),
            ArrayType(LongType, _), LongType) =>
        if (second.foldable && third.foldable && fourth.foldable)
          TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "minhash_sig seed arrays and modulus must be literals")
      case _ => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires (ARRAY<STRING>, ARRAY<BIGINT>, ARRAY<BIGINT>, BIGINT), got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString}, ${fourth.dataType.catalogString}")
    }

  private lazy val seedsA: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  private lazy val seedsB: Array[Long] =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()
  private lazy val pVal: Long = fourth.eval(null).asInstanceOf[Long]

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(sh: Any, a: Any, b: Any, p: Any): Any = {
    val arr = sh.asInstanceOf[ArrayData]
    MinHashSigExpr.sig(arr, seedsA, seedsB, pVal)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("seedsA", seedsA, "long[]")
    val bRef = ctx.addReferenceObj("seedsB", seedsB, "long[]")
    nullSafeCodeGen(ctx, ev, (sh, _, _, _) => {
      s"""
         |${ev.value} = graft.functions.MinHashSigExpr.sig($sh, $aRef, $bRef, ${pVal}L);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): MinHashSigExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object MinHashSigExpr {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** conv(substring(md5(t),1,15),16,10) — first 15 hex chars = unsigned
    * big-endian first-8-bytes >>> 4. */
  def h60(t: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val bytes = d.digest(t.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Shared interpreted/codegen kernel: one md5 per non-null shingle,
    * S multiply-mod minima. */
  def sig(shingles: ArrayData, a: Array[Long], b: Array[Long], p: Long): GenericArrayData = {
    val s = a.length
    val mins = new Array[Long](s)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        any = true
        val x = h60(shingles.getUTF8String(i)) % p
        var j = 0
        while (j < s) {
          val v = (a(j) * x + b(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](s)
    if (any) { var j = 0; while (j < s) { out(j) = mins(j); j += 1 } }
    new GenericArrayData(out)
  }

  /** Shared SimHash kernel: null tokens contribute −1 to every balance
    * (HOF-parity; see SimHashExpr). */
  def simhash(toks: ArrayData, nBits: Int): Long = {
    val bal = new Array[Int](nBits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        var j = 0
        while (j < nBits) { bal(j) -= 1; j += 1 }
      } else {
        val h = h60(toks.getUTF8String(i))
        var j = 0
        while (j < nBits) {
          bal(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < nBits) { if (bal(j) > 0) out |= 1L << j; j += 1 }
    out
  }

  /** Karp-Rabin fold over token h60 hashes: acc = (acc·mult + h60(t)) %
    * mod, left to right. Reducing h60 % mod BEFORE the add is congruent
    * to the lambda's unreduced (a·mult + h60) % mod (both sums stay far
    * under 2^63, so the modular identity holds exactly). Null token: the
    * lambda's fold goes null and stays null — reproduce by returning
    * boxed null on the first null element. */
  def rollingH60(toks: ArrayData, mult: Long, mod: Long): Any = {
    var acc = 0L
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      acc = (acc * mult + h60(toks.getUTF8String(i)) % mod) % mod
      i += 1
    }
    acc
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      args => MinHashSigExpr(args(0), args(1), args(2), args(3)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_bits", args => SimHashExpr(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_h60", args => RollingH60Expr(args(0), args(1), args(2)), "built-in")
  }
}

/** `rolling_h60(toks, mult, mod)` → BIGINT Karp-Rabin fingerprint of the
  * token h60 hashes — one generated loop replacing the interpreted
  * `aggregate(transform(toks, h60), ...)` fold (d_rolling_hash). mult
  * and mod must be literals. */
final case class RollingH60Expr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), LongType, LongType)
          if second.foldable && third.foldable => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"rolling_h60 requires (ARRAY<STRING>, literal BIGINT, literal BIGINT), got " +
          s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString}")
    }

  private lazy val multVal: Long = second.eval(null).asInstanceOf[Long]
  private lazy val modVal: Long = third.eval(null).asInstanceOf[Long]

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_h60"

  override protected def nullSafeEval(t: Any, m: Any, p: Any): Any =
    MinHashSigExpr.rollingH60(t.asInstanceOf[ArrayData], multVal, modVal)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      val r = ctx.freshName("rh")
      s"""
         |Object $r = graft.functions.MinHashSigExpr.rollingH60($t, ${multVal}L, ${modVal}L);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): RollingH60Expr = copy(first = f, second = s, third = t)
}

/** `simhash_bits(toks, nbits)` → BIGINT SimHash over the token set: bit j
  * is set iff Σ over tokens of (±1 by bit j of h60(token)) is positive.
  * One generated loop per row (md5-h60 once per token, then nbits
  * add/subtracts) — replaces nbits=48 interpreted `aggregate` HOF folds
  * per document (d_simhash48's entire cost).
  *
  * EXACT parity with the HOF form: a NULL token element contributes −1 to
  * every bit balance (the lambda's `when(null).otherwise(-1)` path); an
  * empty array yields 0 (all balances 0, no bit set). nbits must be a
  * literal in [1, 63]. */
final case class SimHashExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"simhash_bits requires (ARRAY<STRING>, literal INT), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  private lazy val nBits: Int = {
    val n = right.eval(null).asInstanceOf[Int]
    require(n >= 1 && n <= 63, s"simhash_bits: nbits must be in [1,63], got $n")
    n
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(t: Any, n: Any): Any =
    MinHashSigExpr.simhash(t.asInstanceOf[ArrayData], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, _) => {
      s"${ev.value} = graft.functions.MinHashSigExpr.simhash($toks, $nBits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashExpr =
    copy(left = newLeft, right = newRight)
}
