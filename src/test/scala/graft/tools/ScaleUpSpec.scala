package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sf1 scale-check methodology (BENCH_NOTES round 7) rests on ScaleUp
  * preserving each replica's INTERNAL structure exactly while keeping
  * replicas disjoint — these invariants are what make measured per-query
  * ratios attributable to the engine rather than data-shape drift, so
  * they are pinned here on a miniature corpus. */
class ScaleUpSpec extends SparkSpec {

  private lazy val dirs: (String, String) = {
    val s = spark
    import s.implicits._
    val src = graft.TempDirs.scratch("scaleup_src").toString
    val dst = graft.TempDirs.scratch("scaleup_dst").toString
    Seq((0L, "r0")).toDF("r_regionkey", "r_name").write.parquet(s"$src/region.parquet")
    Seq((0L, 0L, "n")).toDF("n_nationkey", "n_regionkey", "n_name")
      .write.parquet(s"$src/nation.parquet")
    Seq((1L, "c", 0, 1.0, "m")).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$src/customer.parquet")
    Seq((1L, "s", 0, 1.0)).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$src/supplier.parquet")
    Seq((1L, "p", "b", "t", 1, 1.0)).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$src/part.parquet")
    Seq((1L, 1L, "O", 10.0)).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.parquet(s"$src/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0)).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity")
      .write.parquet(s"$src/lineitem.parquet")
    Seq((1L, 2L, "click", 1.0)).toDF("event_id", "user_id", "event_type", "value")
      .write.parquet(s"$src/events.parquet")
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "en", "s0", 43L),
      (2L, "the quick brown fox jumps over the lazy cat", "en", "s0", 43L), // near-dup of 1
      (3L, "completely different words appear in this one", "en", "s1", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$src/documents.parquet")
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f, 2.0f, 0.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f, 2.0f, 0.0f, 0.0f, 0.0f), 0), // near 1
      (3L, Array(0.0f, 0.0f, 3.0f, 0.0f, 0.0f, 0.0f, 1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$src/embeddings.parquet")
    ScaleUp.run(spark, src, dst, 4)
    (src, dst)
  }

  private def jaccard(a: Set[String], b: Set[String]): Double =
    (a & b).size.toDouble / (a | b).size

  test("documents: intra-replica Jaccard preserved exactly, cross-replica ~0") {
    val docs = spark.read.parquet(s"${dirs._2}/documents.parquet")
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ").toSet).toMap
    assert(docs.size == 12) // 3 docs × 4 replicas
    val kd = 10L // next power of ten above max doc_id 3
    for (r <- 0 until 4) {
      // the vocabulary bijection preserves every pairwise Jaccard
      val j = jaccard(docs(1L + r * kd), docs(2L + r * kd))
      assert(j == jaccard(docs(1L), docs(2L)), s"replica $r drifted: $j")
    }
    // replicas share no tokens at all (suffix bijection per replica)
    assert(jaccard(docs(1L), docs(1L + kd)) == 0.0)
    assert(jaccard(docs(2L + kd), docs(2L + 2 * kd)) == 0.0)
  }

  test("embeddings: intra-replica inner products preserved, replicas decorrelated") {
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val em = spark.read.parquet(s"${dirs._2}/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(em.size == 12)
    val kv = 10L
    for (r <- 1 until 4) {
      // a circular shift is a permutation: every inner product survives
      assert(dot(em(1L + r * kv), em(2L + r * kv)) == dot(em(1L), em(2L)), s"replica $r")
      assert(dot(em(1L + r * kv), em(1L + r * kv)) == dot(em(1L), em(1L)))
    }
    // shifted copies are not near-duplicates of the original
    def cos(a: Seq[Float], b: Seq[Float]) =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    assert(cos(em(1L), em(1L + kv)) < 0.5)
  }

  test("second shift cycle negates: factor to 2x dim decorrelates, beyond refused") {
    // dim = 8 here: replicas 8..15 reuse shifts 0..7 NEGATED —
    // cos(-a,-b) = cos(a,b) keeps every intra-replica relation exact,
    // and the same-shift un-negated pair lands at cosine -1 (never a
    // positive near-dup); factor 17 exceeds the 2*dim distinct
    // transforms and must refuse loudly
    val dst = graft.TempDirs.scratch("scaleup_neg").toString
    ScaleUp.run(spark, dirs._1, dst, 16)
    def dot(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val em = spark.read.parquet(s"$dst/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(em.size == 48) // 3 vectors x 16 replicas
    val kv = 10L
    // replica 8 = shift 0 negated: intra-replica inner products exact
    assert(dot(em(1L + 8 * kv), em(2L + 8 * kv)) == dot(em(1L), em(2L)))
    def cos(a: Seq[Float], b: Seq[Float]) =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    assert(math.abs(cos(em(1L), em(1L + 8 * kv)) + 1.0) < 1e-9)
    val e = intercept[IllegalArgumentException] {
      ScaleUp.run(spark, dirs._1,
        graft.TempDirs.scratch("scaleup_refuse").toString, 17)
    }
    assert(e.getMessage.contains("exceeds 2x embedding dim"))
  }

  test("empty source table fails loudly instead of NPE") {
    val s = spark
    import s.implicits._
    val src = graft.TempDirs.scratch("scaleup_empty").toString
    val dst = graft.TempDirs.scratch("scaleup_empty_dst").toString
    Seq((0L, "r0")).toDF("r_regionkey", "r_name").write.parquet(s"$src/region.parquet")
    Seq((0L, 0L, "n")).toDF("n_nationkey", "n_regionkey", "n_name")
      .write.parquet(s"$src/nation.parquet")
    Seq((1L, "c")).toDF("c_custkey", "c_name").write.parquet(s"$src/customer.parquet")
    Seq((1L, "s")).toDF("s_suppkey", "s_name").write.parquet(s"$src/supplier.parquet")
    Seq((1L, "p")).toDF("p_partkey", "p_name").write.parquet(s"$src/part.parquet")
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .filter(lit(false)).write.parquet(s"$src/orders.parquet") // empty
    val e = intercept[IllegalArgumentException] {
      ScaleUp.run(spark, src, dst, 2)
    }
    assert(e.getMessage.contains("source table is empty"))
  }

  test("every scaled FACT table lands multi-file (decade-realistic layout)") {
    // The replica explode inherits the source's split count: without the
    // wrFact repartition a compact source writes the whole scaled corpus
    // as ONE file and every map-only consumer is split-bound to one core
    // (the r11 em-decade bug). Pin the layout for ALL fact tables: at
    // least min(rows, defaultParallelism) part files each.
    val par = spark.sparkContext.defaultParallelism
    for (t <- Seq("orders", "lineitem", "events", "documents", "embeddings")) {
      val rows = spark.read.parquet(s"${dirs._2}/$t.parquet").count()
      val parts = new java.io.File(s"${dirs._2}/$t.parquet")
        .listFiles().count(_.getName.startsWith("part-"))
      // round-robin repartition distributes per INPUT split with a
      // random start, so a few-row fixture can leave some of the `par`
      // targets empty (empty tasks write no file) — the bound is
      // half-parallelism, which still fails loudly on the r11 bug this
      // test pins (the whole scaled corpus landing as ONE file)
      assert(parts >= math.max(2L, math.min(rows, par.toLong) / 2),
        s"$t: $parts part files for $rows rows (parallelism $par) — split-bound")
    }
  }

  test("facts scale by the factor, dims stay fixed, keys stay disjoint") {
    def cnt(t: String) = spark.read.parquet(s"${dirs._2}/$t.parquet").count()
    assert(cnt("lineitem") == 4 && cnt("orders") == 4 && cnt("events") == 4)
    assert(cnt("customer") == 1 && cnt("part") == 1 && cnt("region") == 1)
    val keys = spark.read.parquet(s"${dirs._2}/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(keys.size == 4) // offsets keep replica keys collision-free
  }
}
