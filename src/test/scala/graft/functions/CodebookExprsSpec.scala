package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native codegen nearest-codeword search (the ANN index-build hot loop):
  * exact parity with the HOF argmin formulation it replaced — the oracle
  * hash-match depends on identical (floor(l2·1e6+0.5), index) winners —
  * plus the tie-break, null semantics, and codegen presence. */
class CodebookExprsSpec extends SparkSpec {

  private val rng = new scala.util.Random(11)
  private def vec(n: Int): Seq[Double] = Seq.fill(n)(rng.nextDouble() * 4 - 2)

  test("cb_argmin matches the HOF argmin (micro-quantized, index tie-break)") {
    val s = spark
    import s.implicits._
    val books: Seq[Seq[Double]] = Seq.fill(37)(vec(16))
    val df = Seq.fill(200)(vec(16)).map(Tuple1(_)).toDF("v")
    val hof = array_min(transform(typedLit(books.zipWithIndex), c =>
      struct(
        floor(call_function("seql2", col("v"), c.getField("_1")) * 1000000.0 + 0.5)
          .cast("long").as("d2"),
        c.getField("_2").as("idx")))).getField("idx")
    val out = df.select(
      call_function("cb_argmin", col("v"), typedLit(books)).as("fast"),
      hof.as("hof")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("cb_argmin tie-break: equal micro-distance picks the LOWER index") {
    val s = spark
    import s.implicits._
    // two identical codewords -> identical d2; argmin must return index 0
    val books = Seq(Seq(1.0, 1.0), Seq(1.0, 1.0), Seq(9.0, 9.0))
    val df = Seq(Tuple1(Seq(1.5, 0.5))).toDF("v")
    assert(df.select(call_function("cb_argmin", col("v"), typedLit(books)))
      .head.getInt(0) == 0)
  }

  test("cb_argmin null semantics: null vec, null element, length mismatch") {
    val s = spark
    import s.implicits._
    val books = Seq(Seq(0.0, 0.0))
    val df = Seq(
      Tuple1(Seq[java.lang.Double](1.0, 2.0)),
      Tuple1(Seq[java.lang.Double](1.0, null)),
      Tuple1(Seq[java.lang.Double](1.0)),
      Tuple1(null.asInstanceOf[Seq[java.lang.Double]])
    ).toDF("v")
    val out = df.select(
      call_function("cb_argmin", col("v").cast("array<double>"), typedLit(books)))
      .collect()
    assert(out(0).getInt(0) == 0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("cb_argmin works on float arrays (widened exactly, like seql2)") {
    val s = spark
    import s.implicits._
    val books = Seq(Seq(0.5, -0.25), Seq(2.0, 2.0))
    val df = Seq(Tuple1(Seq(0.5f, -0.25f))).toDF("v")
    assert(df.select(call_function("cb_argmin", col("v"), typedLit(books)))
      .head.getInt(0) == 0)
  }

  test("pq_encode equals per-subspace cb_argmin on the sliced vector") {
    val s = spark
    import s.implicits._
    val M = 4; val SUB = 8; val K = 16
    val books3: Seq[Seq[Seq[Double]]] = Seq.fill(M)(Seq.fill(K)(vec(SUB)))
    val df = Seq.fill(100)(vec(M * SUB)).map(Tuple1(_)).toDF("v")
    val perSub = (0 until M).map(m =>
      call_function("cb_argmin",
        expr(s"slice(v, ${m * SUB + 1}, $SUB)"), typedLit(books3(m))))
    val out = df.select(
      call_function("pq_encode", col("v"), typedLit(books3)).as("codes"),
      array(perSub: _*).as("expected")).collect()
    out.foreach(r => assert(r.getSeq[Int](0) == r.getSeq[Int](1)))
  }

  test("pq_encode null on length mismatch; stays in whole-stage codegen") {
    val s = spark
    import s.implicits._
    val books3 = Seq(Seq(Seq(0.0, 0.0)), Seq(Seq(1.0, 1.0)))
    assert(Seq(Tuple1(Seq(1.0, 2.0, 3.0))).toDF("v")
      .select(call_function("pq_encode", col("v"), typedLit(books3)))
      .head.isNullAt(0))
    val df = spark.range(50)
      .select(transform(sequence(lit(1L), lit(4L)), i => (i + col("id")).cast("double")).as("v"))
      .select(call_function("pq_encode", col("v"), typedLit(books3)).as("c"),
        call_function("cb_argmin", col("v"),
          typedLit(Seq(Seq(0.0, 0.0, 0.0, 0.0)))).as("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("pq_encode") && l.trim.startsWith("*(")),
      s"pq_encode fell out of WholeStageCodegen:\n$plan")
    assert(plan.linesIterator.exists(l => l.contains("cb_argmin") && l.trim.startsWith("*(")),
      s"cb_argmin fell out of WholeStageCodegen:\n$plan")
    assert(df.count() == 50)
  }

  test("cb_argmin_i matches the struct-array integer argmin it replaced") {
    val s = spark
    import s.implicits._
    val irng = new scala.util.Random(13)
    // duplicate codeword planted -> exercises the lower-index tie-break
    val base: Seq[Seq[Long]] = Seq.fill(41)(Seq.fill(8)(irng.nextInt(2000000).toLong - 1000000))
    val books = base.updated(17, base(3))
    val df = Seq.fill(300)(Seq.fill(8)(irng.nextInt(2000000).toLong - 1000000))
      .map(Tuple1(_)).toDF("q")
    // the exact pre-round-9 lloyd formulation: array_min over (seql2i, idx)
    val structMin = array_min(array(books.zipWithIndex.map { case (c, i) =>
      struct(call_function("seql2i", col("q"), typedLit(c)).as("d"), lit(i).as("c")) }: _*))
    val out = df.select(
      call_function("cb_argmin_i", col("q"), typedLit(books)).as("fast"),
      structMin.getField("d").as("d"), structMin.getField("c").as("c")).collect()
    out.foreach { r =>
      val fast = r.getSeq[Long](0)
      assert(fast(0) == r.getLong(1), "distance mismatch")
      assert(fast(1) == r.getInt(2).toLong, "argmin index mismatch")
    }
  }

  test("cb_argmin_i null semantics and codegen presence") {
    val s = spark
    import s.implicits._
    val books = Seq(Seq(0L, 0L))
    val bad = Seq(
      Tuple1(Seq[java.lang.Long](1L, 2L)),
      Tuple1(Seq[java.lang.Long](1L, null)),
      Tuple1(Seq[java.lang.Long](1L)),
      Tuple1(null.asInstanceOf[Seq[java.lang.Long]])
    ).toDF("q")
    val out = bad.select(
      call_function("cb_argmin_i", col("q").cast("array<bigint>"), typedLit(books))).collect()
    assert(out(0).getSeq[Long](0) == Seq(5L, 0L))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
    val df = spark.range(50)
      .select(array(col("id"), col("id") + 1L).as("q"))
      .select(call_function("cb_argmin_i", col("q"), typedLit(books)).as("a"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("cb_argmin_i") && l.trim.startsWith("*(")),
      s"cb_argmin_i fell out of WholeStageCodegen:\n$plan")
    assert(df.count() == 50)
  }
}
