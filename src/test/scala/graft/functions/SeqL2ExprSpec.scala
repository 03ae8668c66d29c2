package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native codegen squared-L2 fold (the IVF quantizer hot loop): bit parity
  * with the HOF formulation it replaced — the oracle hash-match depends on
  * the exact left-to-right IEEE sequence — plus null/length semantics and
  * codegen presence. */
class SeqL2ExprSpec extends SparkSpec {

  private val rng = new scala.util.Random(7)
  private def vec(n: Int): Seq[Double] = Seq.fill(n)(rng.nextDouble() * 2 - 1)

  test("bit-identical to aggregate(zip_with((x-c)*(x-c))) on double arrays") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(50)((vec(64), vec(64))).toDF("a", "b")
    val out = df.select(
      call_function("seql2", col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("length mismatch and null elements yield null (zip_with parity)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),
      (Seq(1.0, 2.0), Seq(3.0, 0.0))
    ).toDF("a", "b")
    val out = df.select(call_function("seql2", col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 8.0) // (1-3)² + (2-0)²
    assert(spark.sql("SELECT seql2(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS d")
      .head.isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path; plan stays compiled") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val a = Literal.create(Seq(0.5f, -1.25f), ArrayType(FloatType))
    val b = Literal.create(Seq(2.0, 4.0), ArrayType(DoubleType))
    val interpreted = SeqL2Expr(a, b).eval(null).asInstanceOf[Double]
    val viaSql = spark.sql(
      "SELECT seql2(array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT)), array(2.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(interpreted) ==
      java.lang.Double.doubleToRawLongBits(viaSql))
    val df = spark.range(50)
      .select(transform(sequence(lit(1L), lit(8L)), i => (i + col("id")).cast("double")).as("a"))
      .select(call_function("seql2", col("a"), col("a")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("seql2") && l.trim.startsWith("*(")))
    assert(df.collect().forall(_.getDouble(0) == 0.0)) // d(a, a) = 0
  }
}
