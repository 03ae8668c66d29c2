package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Interpreted-vs-codegen parity for the round-9 kernel expressions.
  *
  * When an expression's inputs are all literals, ConstantFolding calls
  * its interpreted `eval` at optimization time — so the interpreted path
  * is reachable in production even though the hot paths run generated
  * code. Evaluating each kernel over FOLDABLE inputs and comparing to
  * the same call over a column (codegen) pins the two paths together. */
class InterpretedParitySpec extends SparkSpec {

  private def viaLiteral(sql: String): org.apache.spark.sql.Row =
    spark.sql(s"SELECT $sql AS v").head()

  test("cb_argmin: constant-folded result equals the codegen result") {
    val s = spark
    import s.implicits._
    val books = "array(array(1.0D, 1.0D), array(5.0D, 5.0D), array(4.9D, 5.1D))"
    val lit = viaLiteral(s"cb_argmin(array(4.95D, 5.05D), $books)").getInt(0)
    val gen = Seq(Tuple1(Seq(4.95, 5.05))).toDF("v")
      .select(expr(s"cb_argmin(v, $books)")).head.getInt(0)
    assert(lit == gen)
  }

  test("cb_argmin_i: constant-folded result equals the codegen result") {
    val s = spark
    import s.implicits._
    val books = "array(array(1L, 1L), array(5L, 5L), array(5L, 5L))"
    val lit = viaLiteral(s"cb_argmin_i(array(4L, 6L), $books)").getSeq[Long](0)
    val gen = Seq(Tuple1(Seq(4L, 6L))).toDF("q")
      .select(expr(s"cb_argmin_i(q, $books)")).head.getSeq[Long](0)
    assert(lit == gen && lit == Seq(2L, 1L)) // dist 2, tie -> lower index 1
  }

  test("pq_encode: constant-folded codes equal the codegen codes") {
    val s = spark
    import s.implicits._
    val books3 = "array(array(array(0.0D, 0.0D), array(2.0D, 2.0D)), " +
      "array(array(1.0D, 1.0D), array(9.0D, 9.0D)))"
    val lit = viaLiteral(s"pq_encode(array(1.9D, 2.1D, 1.2D, 0.8D), $books3)").getSeq[Int](0)
    val gen = Seq(Tuple1(Seq(1.9, 2.1, 1.2, 0.8))).toDF("v")
      .select(expr(s"pq_encode(v, $books3)")).head.getSeq[Int](0)
    assert(lit == gen)
  }

  test("minhash_sig / simhash_bits / rolling_h60 / gram kernels fold identically") {
    val s = spark
    import s.implicits._
    val toks = "array('b c d', 'a b', 'b c d')"
    val a = "array(3L, 7L)"; val b = "array(1L, 2L)"
    val mh = viaLiteral(s"minhash_sig($toks, $a, $b, 1000000007L)").getSeq[Long](0)
    val mhGen = Seq(Tuple1(Seq("b c d", "a b", "b c d"))).toDF("t")
      .select(expr(s"minhash_sig(t, $a, $b, 1000000007L)")).head.getSeq[Long](0)
    assert(mh == mhGen)

    val sh = viaLiteral(s"simhash_bits($toks, 16)").getLong(0)
    val shGen = Seq(Tuple1(Seq("b c d", "a b", "b c d"))).toDF("t")
      .select(expr("simhash_bits(t, 16)")).head.getLong(0)
    assert(sh == shGen)

    val rh = viaLiteral(s"rolling_h60($toks, 31L, 1000000007L)").getLong(0)
    val rhGen = Seq(Tuple1(Seq("b c d", "a b", "b c d"))).toDF("t")
      .select(expr("rolling_h60(t, 31L, 1000000007L)")).head.getLong(0)
    assert(rh == rhGen)

    val gs = viaLiteral(s"gram_stats($toks, 2)")
    val gsGen = Seq(Tuple1(Seq("b c d", "a b", "b c d"))).toDF("t")
      .select(expr("gram_stats(t, 2)")).head
    assert(gs.getStruct(0) == gsGen.getStruct(0))

    val wg = viaLiteral(s"word_grams($toks, 2)").getSeq[String](0)
    val wgGen = Seq(Tuple1(Seq("b c d", "a b", "b c d"))).toDF("t")
      .select(expr("word_grams(t, 2)")).head.getSeq[String](0)
    assert(wg == wgGen && wg == Seq("b c d a b", "a b b c d"))

    val tc = viaLiteral(s"token_set_counts($toks, array(array('a b', 'x')))").getSeq[Long](0)
    val tcGen = Seq(Tuple1(Seq("b c d", "a b", "b c d"))).toDF("t")
      .select(expr("token_set_counts(t, array(array('a b', 'x')))")).head.getSeq[Long](0)
    assert(tc == tcGen && tc == Seq(1L))

    val l2i = viaLiteral("seql2i(array(3L, 5L), array(1L, 9L))").getLong(0)
    assert(l2i == 20L)
  }
}
