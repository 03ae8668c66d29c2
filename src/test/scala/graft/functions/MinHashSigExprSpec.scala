package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** One-pass seeded MinHash signatures: exact parity with the HOF
  * formulation they replaced (md5-h60 content hash, multiply-mod minima),
  * plus null semantics and codegen presence. The DuckDB oracle
  * (d_minhash_sig) independently cross-checks the md5 path end-to-end. */
class MinHashSigExprSpec extends SparkSpec {

  private val P = 1000000007L
  private val A = Seq(3L, 7L, 12345L)
  private val B = Seq(0L, 11L, 999L)

  private def sigCol = call_function("minhash_sig",
    col("sh"), typedLit(A), typedLit(B), lit(P))

  test("matches the per-seed HOF formulation (h60 via conv∘substring∘md5)") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(3)
    val docs = Seq.fill(40)(Seq.fill(rng.nextInt(30) + 1)(
      rng.alphanumeric.take(rng.nextInt(12) + 1).mkString))
    val df = docs.map(Tuple1(_)).toDF("sh")
    def h60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val hs = transform(col("sh"), t => h60(t) % P)
    val hof = array(A.indices.map(i =>
      array_min(transform(hs, x => (lit(A(i)) * x + B(i)) % P))): _*)
    df.select(sigCol.as("fast"), hof.as("hof")).collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("empty shingle set → null minima; null elements skipped (array_min parity)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      Tuple1(Seq.empty[String]),
      Tuple1(Seq[String](null, "abc", null))
    ).toDF("sh")
    val out = df.select(sigCol.as("sig")).collect()
    assert(out(0).getSeq[Any](0) == Seq(null, null, null))
    // null elements skipped: same minima as just ["abc"]
    val only = Seq(Tuple1(Seq("abc"))).toDF("sh").select(sigCol).head.getSeq[Long](0)
    assert(out(1).getSeq[Long](0) == only)
  }

  test("stays inside whole-stage codegen") {
    val df = spark.range(20)
      .select(array(concat(lit("t"), col("id").cast("string"))).as("sh"))
      .select(sigCol.as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("minhash_sig") && l.trim.startsWith("*(")),
      s"minhash_sig fell out of WholeStageCodegen:\n$plan")
    assert(df.count() == 20)
  }
}
