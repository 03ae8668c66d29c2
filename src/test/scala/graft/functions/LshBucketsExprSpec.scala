package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Single-pass multi-table LSH signature expression: bucket parity with
  * the per-plane fold formulation it replaced, null semantics, and a
  * bounded-size generated stage. */
class LshBucketsExprSpec extends SparkSpec {

  private val rng = new scala.util.Random(7)
  private def vec(n: Int): Seq[Float] = Seq.fill(n)(rng.nextFloat() * 2 - 1)

  test("buckets match the per-plane seqdot formulation (8 tables × 12 planes)") {
    val s = spark
    import s.implicits._
    val tables = 8; val k = 12; val dims = 64
    val weights = Seq.tabulate(tables * k)(p =>
      Seq.tabulate(dims)(i => ((p * 31 + i * 7) % 2001 - 1000) / 1000.0))
    val df = Seq.fill(40)(Tuple1(vec(dims))).toDF("embedding")
    val perPlane = (0 until tables).map { t =>
      (0 until k).map { p =>
        when(call_function("seqdot", col("embedding"), typedLit(weights(t * k + p))) > 0,
          lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val out = df.select(
      call_function("lsh_buckets", col("embedding"), typedLit(weights), lit(k)).as("fast"),
      array(perPlane: _*).as("slow")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("dims mismatch with the weight matrix yields null") {
    val s = spark
    import s.implicits._
    val w = Seq(Seq.fill(4)(0.5))
    val df = Seq(Tuple1(Seq(1.0f, 2.0f))).toDF("embedding") // 2 dims vs 4 weights
    val out = df.select(
      call_function("lsh_buckets", col("embedding"), typedLit(w), lit(1)).as("b")).collect()
    assert(out(0).isNullAt(0))
  }

  test("bucket bits: positive plane dot sets bit p") {
    val s = spark
    import s.implicits._
    // 1 table, 2 planes over 2 dims: plane0 = (1,0) → dot=x0; plane1 = (0,-1) → dot=-x1
    val w = Seq(Seq(1.0, 0.0), Seq(0.0, -1.0))
    val df = Seq(Tuple1(Seq(2.0f, 3.0f))).toDF("embedding") // dot0=2>0 (bit0), dot1=-3≤0
    val out = df.select(
      call_function("lsh_buckets", col("embedding"), typedLit(w), lit(2)).as("b")).collect()
    assert(out(0).getSeq[Long](0) == Seq(1L))
  }
}
