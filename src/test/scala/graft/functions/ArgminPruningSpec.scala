package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r12 pruned `cb_argmin_i` (norm-ordered visitation + triangle-bound
  * side cutoff + partial-distance elimination) claims BIT-IDENTICAL
  * output to the brute-force (dist asc, idx asc) scan on every input.
  * This spec adversarially cross-checks that claim against an
  * independent naive fold: duplicated centroids (exact distance ties
  * that the out-of-order visitation must adjudicate to the LOWER index),
  * equal-norm shells (the bound can't separate them), small grids (dense
  * collisions), and coordinates at the 2²⁰-quantization magnitude (the
  * bound's floating-point slack must stay conservative). */
class ArgminPruningSpec extends SparkSpec {

  private def naive(x: Seq[Long], books: Seq[Seq[Long]]): (Long, Long) = {
    var best = Long.MaxValue; var bi = -1
    for ((c, j) <- books.zipWithIndex) {
      var acc = 0L
      for (i <- x.indices) { val d = x(i) - c(i); acc += d * d }
      if (acc < best) { best = acc; bi = j }
    }
    (best, bi.toLong)
  }

  private def viaSpark(xs: Seq[Seq[Long]], books: Seq[Seq[Long]]): Seq[(Long, Long)] = {
    val s = spark
    import s.implicits._
    val booksSql = books.map(_.mkString("array(", "L,", "L)"))
      .mkString("array(", ",", ")")
    xs.toDF("q").select(expr(s"cb_argmin_i(q, $booksSql)").as("r"))
      .collect().map(_.getSeq[Long](0)).map(r => (r(0), r(1)))
  }

  test("pruned argmin equals the naive (dist, idx) min on adversarial fixtures") {
    val rnd = new scala.util.Random(42)
    // small grid -> dense distance collisions; duplicated rows -> exact ties
    for ((dim, k, lim) <- Seq((4, 7, 3L), (8, 33, 2L), (6, 64, 4L))) {
      val base = Seq.fill(k)(Seq.fill(dim)(rnd.nextLong(2 * lim + 1) - lim))
      val books = base.zipWithIndex.map { case (c, j) =>
        if (j % 3 == 0) base(j / 3) else c } // planted duplicates
      val xs = Seq.fill(100)(Seq.fill(dim)(rnd.nextLong(2 * lim + 1) - lim))
      val got = viaSpark(xs, books)
      val want = xs.map(naive(_, books))
      assert(got == want, s"dim=$dim k=$k")
    }
  }

  test("equal-norm shells: the bound cannot separate, the scan still must") {
    // all centers on one L2 shell (permutations/sign flips of one vector)
    val c0 = Seq(3L, -4L, 12L, 0L)
    val books = Seq(c0, Seq(12L, 3L, 0L, -4L), Seq(-3L, 4L, -12L, 0L),
      Seq(0L, 12L, -4L, 3L), c0) // incl. an exact duplicate of idx 0
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(60)(Seq.fill(4)(rnd.nextLong(31) - 15))
    assert(viaSpark(xs, books) == xs.map(naive(_, books)))
  }

  test("quantization-scale magnitudes keep the bound conservative") {
    val rnd = new scala.util.Random(11)
    val big = 1L << 23 // coordinates at the 2^20-quantized extreme
    val books = Seq.fill(40)(Seq.fill(16)(rnd.nextLong(2 * big + 1) - big))
      // near-identical pair differing by 1 in one coordinate: forces
      // best-vs-candidate gaps of a few units, where slack errors bite
      .patch(5, Seq(Seq.fill(16)(big - 1), Seq.fill(16)(big - 1).updated(3, big - 2L)), 0)
    val xs = Seq.fill(50)(Seq.fill(16)(rnd.nextLong(2 * big + 1) - big)) ++
      Seq(Seq.fill(16)(big - 1)) // lands exactly on the planted center
    assert(viaSpark(xs, books) == xs.map(naive(_, books)))
  }

  private def naiveQ(x: Seq[Double], books: Seq[Seq[Double]]): Int = {
    var best = Long.MaxValue; var bi = -1
    for ((c, j) <- books.zipWithIndex) {
      var acc = 0.0
      for (i <- x.indices) { val d = x(i) - c(i); acc = acc + d * d }
      val d2 = math.floor(acc * 1000000.0 + 0.5).toLong
      if (d2 < best) { best = d2; bi = j }
    }
    bi
  }

  test("cb_argmin (quantized double variant) pruning equals the naive scan") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    for (k <- Seq(5, 37, 128)) {
      val base = Seq.fill(k)(Seq.fill(8)(rnd.nextInt(7) - 3.0))
      // duplicates force exact quantized ties; micro-offsets force
      // DISTINCT raw distances that quantize EQUAL (the subtle tie class)
      val books = base.zipWithIndex.map { case (c, j) =>
        if (j % 4 == 1) base(j / 4)
        else if (j % 4 == 2) c.updated(0, c.head + 1e-9) else c }
      val booksSql = books.map(_.map(v => s"${v}D").mkString("array(", ",", ")"))
        .mkString("array(", ",", ")")
      val xs = Seq.fill(80)(Seq.fill(8)(rnd.nextInt(7) - 3.0))
      val got = xs.toDF("v").select(expr(s"cb_argmin(v, $booksSql)"))
        .collect().map(_.getInt(0)).toSeq
      assert(got == xs.map(naiveQ(_, books)), s"k=$k")
    }
  }

  test("pq_encode PDE equals the naive per-subspace argmin") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(31)
    val m = 4; val sub = 4; val kPer = 16
    val books3 = Seq.fill(m)(Seq.fill(kPer)(Seq.fill(sub)(rnd.nextInt(9) - 4.0)))
    val sql = books3.map(_.map(_.map(v => s"${v}D").mkString("array(", ",", ")"))
      .mkString("array(", ",", ")")).mkString("array(", ",", ")")
    val xs = Seq.fill(60)(Seq.fill(m * sub)(rnd.nextInt(9) - 4.0))
    val got = xs.toDF("v").select(expr(s"pq_encode(v, $sql)"))
      .collect().map(_.getSeq[Int](0).toSeq).toSeq
    val want = xs.map(x => (0 until m).map(mi =>
      naiveQ(x.slice(mi * sub, (mi + 1) * sub), books3(mi))).toSeq)
    assert(got == want)
  }

  test("null element and length mismatch stay null") {
    val s = spark
    import s.implicits._
    val books = "array(array(1L,2L), array(3L,4L))"
    assert(Seq(Tuple1(Seq(1L))).toDF("q")
      .select(expr(s"cb_argmin_i(q, $books)")).head.isNullAt(0))
    assert(s.sql(s"SELECT cb_argmin_i(array(1L, CAST(NULL AS BIGINT)), $books) AS v")
      .head.isNullAt(0))
  }
}
