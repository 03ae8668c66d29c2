package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property: the pruned argmin/fold kernels equal their naive reference
  * on ARBITRARY inputs — dims, codebook sizes, coordinate magnitudes up
  * to the 2²⁰-quantization contract, and dense duplicate/tie structure.
  * The fixed ArgminPruningSpec pins adversarial classes through the
  * codegen path; this walks the space between them through the
  * interpreted path (InterpretedParitySpec ties the two paths
  * together). No SparkSession needed — expressions evaluate directly. */
class ArgminPropSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val longBooks = ArrayType(ArrayType(LongType, false), false)
  private val dblBooks = ArrayType(ArrayType(DoubleType, false), false)

  private def caseGen(lim: Long) = for {
    dim <- Gen.choose(1, 12)
    k <- Gen.choose(1, 60)
    base <- Gen.listOfN(k, Gen.listOfN(dim, Gen.choose(-lim, lim)))
    // duplicate a prefix of centers into later slots → exact ties that
    // the out-of-order visitation must give back to the LOWER index
    dups <- Gen.listOfN(k, Gen.choose(0, 3))
    xs <- Gen.listOfN(12, Gen.listOfN(dim, Gen.choose(-lim, lim)))
  } yield {
    val books = base.zipWithIndex.map { case (c, j) =>
      if (dups(j) == 0 && j > 0) base(j / 2) else c }
    (books, xs)
  }

  test("cb_argmin_i (long) equals the naive (dist, idx) min on arbitrary inputs") {
    for (lim <- Seq(3L, 1L << 23)) check(s"lim=$lim", Prop.forAll(caseGen(lim)) {
      case (books, xs) =>
        val e = (x: Seq[Long]) => CodebookArgminLongExpr(
          Literal.create(x, ArrayType(LongType, false)),
          Literal.create(books, longBooks))
          .eval(null).asInstanceOf[ArrayData].toLongArray.toSeq
        xs.forall { x =>
          var best = Long.MaxValue; var bi = -1
          for ((c, j) <- books.zipWithIndex) {
            var acc = 0L
            for (i <- x.indices) { val d = x(i) - c(i); acc += d * d }
            if (acc < best) { best = acc; bi = j }
          }
          e(x) == Seq(best, bi.toLong)
        }
    })
  }

  test("cb_argmin (quantized double) equals the naive scan on arbitrary inputs") {
    check("cb_argmin", Prop.forAll(caseGen(6L)) { case (booksL, xsL) =>
      val books = booksL.map(_.map(v => v * 0.25))
      val xs = xsL.map(_.map(v => v * 0.25))
      xs.forall { x =>
        var best = Long.MaxValue; var bi = -1
        for ((c, j) <- books.zipWithIndex) {
          var acc = 0.0
          for (i <- x.indices) { val d = x(i) - c(i); acc = acc + d * d }
          val d2 = math.floor(acc * 1000000.0 + 0.5).toLong
          if (d2 < best) { best = d2; bi = j }
        }
        CodebookArgminExpr(
          Literal.create(x, ArrayType(DoubleType, false)),
          Literal.create(books, dblBooks)).eval(null) == bi
      }
    })
  }

  test("dot_ge prunes only below threshold and matches seqdot for survivors") {
    val vecGen = Gen.choose(8, 40).flatMap(d =>
      Gen.listOfN(d, Gen.choose(-1000, 1000).map(_ / 997.0)))
    check("dot_ge", Prop.forAll(vecGen, vecGen, Gen.oneOf(0.1, 0.7, 0.9499995)) {
      (a, b0, th) =>
        val b = b0.take(a.length).padTo(a.length, 0.5)
        def lit(v: Seq[Double]) = Literal.create(v, ArrayType(DoubleType, false))
        val sfx = (v: Seq[Double]) => SuffixNormsExpr(lit(v)).eval(null)
          .asInstanceOf[ArrayData].toDoubleArray.toSeq
        val dot = SeqDotExpr(lit(a), lit(b)).eval(null).asInstanceOf[Double]
        val na = math.sqrt(SeqDotExpr(lit(a), lit(a)).eval(null).asInstanceOf[Double])
        val nb = math.sqrt(SeqDotExpr(lit(b), lit(b)).eval(null).asInstanceOf[Double])
        val ge = DotGeExpr(lit(a), lit(b), lit(sfx(a)), lit(sfx(b)), th).eval(null)
        if (ge == null) dot / (na * nb) < th // pruned ⟹ provably below
        else ge == dot                        // survivor ⟹ bit-equal
    })
  }
}
