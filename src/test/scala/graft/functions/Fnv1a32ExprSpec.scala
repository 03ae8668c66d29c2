package graft.functions

import graft.SparkSpec
import graft.cluster.Partitioner
import org.apache.spark.sql.functions._

/** Native codegen FNV-1a expression: value parity with the reference
  * vectors and with the Scala implementation; codegen + interpreted paths
  * agree; stays inside WholeStageCodegen (no UDF boundary). */
class Fnv1a32ExprSpec extends SparkSpec {

  test("matches public FNV-1a vectors through SQL (codegen path)") {
    val s = spark
    import s.implicits._
    val out = Seq("", "a", "foobar", "gold", "silver").toDF("s")
      .selectExpr("s", "fnv1a32(s) AS h").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("") == 0x811c9dc5L)
    assert(out("a") == 0xe40c292cL)
    assert(out("foobar") == 0xbf9cf968L)
    // parity with the driver-side Scala implementation on every vector
    out.foreach { case (k, v) => assert(v == Partitioner.fnv1a32(k)) }
  }

  test("interpreted (eval) path agrees with codegen") {
    val s = spark
    import s.implicits._
    // force interpreted evaluation through the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = Fnv1a32Expr(Literal("foobar"))
    assert(e.eval(null) == 0xbf9cf968L)
  }

  test("non-string input fails analysis with a named error") {
    val s = spark
    import s.implicits._
    val err = intercept[Exception](Seq(1).toDF("n").selectExpr("fnv1a32(n)").collect())
    assert(err.getMessage.toLowerCase.contains("fnv1a32") ||
      err.getMessage.toLowerCase.contains("data type mismatch") ||
      err.getMessage.toLowerCase.contains("cannot resolve"))
  }

  test("plan stays in WholeStageCodegen — no BatchEvalPython/ScalaUDF boundary") {
    val s = spark
    import s.implicits._
    val df = Seq("x").toDF("s").selectExpr("fnv1a32(s) AS h")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    val hashed = Seq(("gold", 1.0)).toDF("type", "value")
    val withHash = hashed.withColumn("h", Partitioner.hashColumn(Seq("type")))
    assert(!withHash.queryExecution.executedPlan.toString.contains("ScalaUDF"))
    assert(withHash.select("h").head.getLong(0) == Partitioner.fnv1a32("gold"))
  }
}
