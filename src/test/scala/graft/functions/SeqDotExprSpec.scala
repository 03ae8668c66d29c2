package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native codegen dot-fold: bit parity with the HOF formulation it
  * replaced (EmbedOps' determinism contract depends on the exact
  * left-to-right IEEE sequence), null/length semantics, codegen vs
  * interpreted agreement, and no UDF boundary in the plan. */
class SeqDotExprSpec extends SparkSpec {

  private val rng = new scala.util.Random(42)
  private def vec(n: Int): Seq[Float] = Seq.fill(n)(rng.nextFloat() * 2 - 1)

  test("bit-identical to aggregate(zip_with(...)) on float arrays") {
    val s = spark
    import s.implicits._
    val df = Seq.fill(50)((vec(64), vec(64))).toDF("a", "b")
    val out = df.select(
      call_function("seqdot", col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("mixed float x double-literal weights (the LSH plane fold)") {
    val s = spark
    import s.implicits._
    val w = Seq.tabulate(64)(i => (i % 7 - 3) / 3.0)
    val df = Seq.fill(20)(Tuple1(vec(64))).toDF("a")
    val out = df.select(
      call_function("seqdot", col("a"), typedLit(w)).as("fast"),
      aggregate(zip_with(col("a"), typedLit(w), (x, y) => x.cast("double") * y),
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
      (Seq(1.0f, 2.0f), Seq(1.0f)),             // length mismatch
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))        // clean
    ).toDF("a", "b")
    val out = df.select(call_function("seqdot", col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) == 5.0)
    // null element → null
    val withNull = s.sql("SELECT seqdot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d").collect()
    assert(withNull(0).isNullAt(0))
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val a = Literal.create(Seq(0.5f, -1.25f, 3.0f), ArrayType(FloatType))
    val b = Literal.create(Seq(2.0, 4.0, 0.5), ArrayType(DoubleType))
    val interpreted = SeqDotExpr(a, b).eval(null).asInstanceOf[Double]
    val viaSql = spark.sql(
      "SELECT seqdot(array(CAST(0.5 AS FLOAT), CAST(-1.25 AS FLOAT), CAST(3.0 AS FLOAT)), " +
        "array(2.0D, 4.0D, 0.5D)) AS d").head.getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(interpreted) ==
      java.lang.Double.doubleToRawLongBits(viaSql))
  }

  test("plan stays in WholeStageCodegen — no ScalaUDF boundary") {
    // non-foldable source (range), so the projection survives into the
    // physical plan instead of collapsing to a LocalTableScan
    val df = spark.range(50)
      .select(col("id"),
        transform(sequence(lit(1L), lit(8L)), i => (i + col("id")).cast("float")).as("a"))
      .select(call_function("seqdot", col("a"), col("a")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // the seqdot projection carries the `*(n)` WholeStageCodegen marker —
    // note the feeder `transform(...)` HOF projection does NOT, which is
    // exactly the interpreted-lambda boundary this expression removes
    assert(plan.linesIterator.exists(l => l.contains("seqdot") && l.trim.startsWith("*(")))
    // id=0 → a = [1..8] → Σ i² = 204, through the generated code
    assert(df.collect().map(_.getDouble(0)).min == 204.0)
  }

  test("non-array input fails analysis with a named error") {
    val err = intercept[Exception](
      spark.sql("SELECT seqdot(1, array(1.0D))").collect())
    assert(err.getMessage.toLowerCase.contains("seqdot") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
