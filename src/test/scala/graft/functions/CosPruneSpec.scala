package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The pruned verify fold's contract: `dot_ge` is NULL only for pairs
  * whose computed cosine is strictly below the report threshold (they
  * could never pass the gate's own filter), and returns the bit-exact
  * `seqdot` fold for everything it keeps. Checked over random pairs and
  * pairs constructed to straddle the 0.9499995 boundary. */
class CosPruneSpec extends SparkSpec {

  private val TH = 0.9499995

  private def check(pairs: Seq[(Seq[Float], Seq[Float])]): Unit = {
    val s = spark
    import s.implicits._
    val rows = pairs.toDF("a", "b")
      .select(
        expr("seqdot(a, b)").as("dot"),
        sqrt(expr("seqdot(a, a)")).as("na"),
        sqrt(expr("seqdot(b, b)")).as("nb"),
        expr(s"dot_ge(a, b, sfx_norms(a), sfx_norms(b), ${TH}D)").as("ge"))
      .collect()
    rows.foreach { r =>
      val sim = math.floor(r.getDouble(0) / (r.getDouble(1) * r.getDouble(2))
        * 1000000.0 + 0.5).toLong
      if (r.isNullAt(3))
        assert(sim < 950000L, s"pruned a reportable pair (sim_micro=$sim)")
      else
        assert(r.getDouble(3) == r.getDouble(0), // bit-equal, not approx
          s"surviving fold diverged: ${r.getDouble(3)} vs ${r.getDouble(0)}")
    }
  }

  test("random pairs: pruned only below threshold, survivors bit-equal seqdot") {
    val rnd = new scala.util.Random(3)
    def vec() = Seq.fill(64)(rnd.nextFloat() * 2f - 1f)
    check(Seq.fill(300)((vec(), vec())))
  }

  test("boundary pairs straddling cos 0.9499995 classify exactly") {
    val rnd = new scala.util.Random(9)
    val pairs = (0 until 120).map { t =>
      val x = Seq.fill(64)(rnd.nextFloat() * 2f - 1f)
      val z = Seq.fill(64)(rnd.nextFloat() * 2f - 1f)
      // y = cos·x̂ + sin·ẑ⊥ scaled: cosine lands near the target
      val c = 0.9499f + rnd.nextFloat() * 0.0002f
      val nx = math.sqrt(x.map(v => v.toDouble * v).sum)
      val dotxz = x.zip(z).map { case (a, b) => a.toDouble * b }.sum
      val zperp = z.zip(x).map { case (b, a) => b - (dotxz / (nx * nx) * a).toFloat }
      val nz = math.sqrt(zperp.map(v => v.toDouble * v).sum)
      val sinc = math.sqrt(1.0 - c * c)
      val y = x.zip(zperp).map { case (a, b) =>
        (c * a / nx + sinc * b / nz).toFloat }
      (x, y)
    }
    check(pairs)
  }

  test("sfx_norms checkpoints equal the naive backward suffix sums") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val v = Seq.fill(64)(rnd.nextFloat())
    val got = Seq(Tuple1(v)).toDF("a")
      .select(expr("sfx_norms(a)")).head.getSeq[Double](0)
    assert(got.length == 8)
    (0 until 8).foreach { t =>
      var acc = 0.0
      for (i <- (8 * t until 64).reverse) acc += v(i).toDouble * v(i)
      assert(got(t) == math.sqrt(acc), s"checkpoint $t")
    }
    // null element propagates
    assert(s.sql("SELECT sfx_norms(array(1.0F, CAST(NULL AS FLOAT))) AS v")
      .head.isNullAt(0))
  }
}
