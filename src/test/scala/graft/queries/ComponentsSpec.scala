package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Components.starContract must produce the unique min-id labeling — the
  * same fixpoint the d_dup_clusters propagation loop converges to — on
  * any topology. Checked against a driver-side union-find oracle on
  * adversarial shapes: long chains (worst case for propagation), stars,
  * cycles, and seeded random graphs. */
class ComponentsSpec extends SparkSpec {

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0L until n).map(i => i -> find(i)).toMap
  }

  private def check(n: Long, edges: Seq[(Long, Long)]): Unit = {
    val s = spark
    import s.implicits._
    val expect = unionFind(n, edges)
    val got = Components.starContract(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // starContract covers ids appearing in edges; isolated ids are the
    // caller's to union in
    val inEdges = edges.flatMap(e => Seq(e._1, e._2)).toSet
    assert(got.keySet == inEdges, s"vertex cover: ${got.keySet} vs $inEdges")
    inEdges.foreach { v =>
      assert(got(v) == expect(v), s"vertex $v: got ${got(v)} expected ${expect(v)}")
    }
  }

  test("long chain (propagation's worst case: diameter = n)") {
    check(64, (0L until 63L).map(i => (i, i + 1)))
  }

  test("reversed chain and shuffled edge order converge identically") {
    check(64, (0L until 63L).reverse.map(i => (i + 1, i)))
  }

  test("star, cycle, and two disjoint components") {
    check(10, (1L until 10L).map(i => (0L, i)))              // star at 0
    check(12, (0L until 12L).map(i => (i, (i + 1) % 12)))    // cycle
    check(8, Seq((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L)))    // disjoint + isolated 3,4
  }

  test("self-loops and duplicate edges are harmless") {
    check(6, Seq((0L, 0L), (0L, 1L), (1L, 0L), (0L, 1L), (3L, 4L), (4L, 3L)))
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 200L
      val edges = Seq.fill(150 + trial * 50)(
        (rnd.nextInt(n.toInt).toLong, rnd.nextInt(n.toInt).toLong))
        .filter(e => e._1 != e._2)
      check(n, edges)
    }
  }

  test("d_dup_clusters propagation and star contraction agree end-to-end") {
    // force the star path on the real gate query at sf0.001 and compare
    // with the default propagation path row-for-row
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val base = graft.SparkEntry.queries("d_dup_clusters")(s, dir)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    s.conf.set("graft.cc.starMinDocs", "0")
    try {
      val star = graft.SparkEntry.queries("d_dup_clusters")(s, dir)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(star.sameElements(base))
    } finally s.conf.unset("graft.cc.starMinDocs")
  }
}
