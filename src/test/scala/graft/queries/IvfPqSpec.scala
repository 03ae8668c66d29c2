package graft.queries

import graft.SparkSpec

/** IVFPQ — the composed index (coarse probing over compressed codes):
  * the persisted search must be byte-identical to the in-memory path,
  * the compressed-codes scan must carry PartitionFilters on the coarse
  * list (the 100 TB claim: a probe reads ≈ NPROBE/k of the CODES, never
  * raw vectors, until the shortlist rerank), and recall must be measured
  * against the exact brute-force baseline — composition can only lose
  * candidates vs plain PQ (the IVF filter), so the floor is checked
  * where it matters. */
class IvfPqSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("persisted IVFPQ: identical neighbors, and the CODES scan is partition-pruned") {
    val idx = java.nio.file.Files.createTempDirectory("ivfpq_idx_spec").toString
    EmbedOps.ivfPqBuild(spark, sfDir, idx)
    val fromIndex = EmbedOps.ivfPqIndexed(spark, sfDir, idx)
    val live = EmbedOps.ivfPqAdc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(fromIndex.select("qid", "vec_id", "d2_micro").collect().toSet == live)
    assert(live.nonEmpty)
    // the scale claim: the probe prunes the COMPRESSED scan — the codes
    // read touches only the probed list directories
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(plan).isDefined,
      s"codes scan not partition-pruned:\n$plan")
  }

  test("every query returns exactly TOPK ranked candidates") {
    val counts = EmbedOps.ivfPqAdc(spark, sfDir)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 5L))
  }

  test("recall@5 vs brute force: the composition holds a measured floor") {
    val brute = topk(EmbedOps.all.find(_.name == "em_knn_brute").get.fn(spark, sfDir))
    val composed = topk(EmbedOps.ivfPqAdc(spark, sfDir))
    val recall = (composed & brute).size.toDouble / brute.size
    // measured on this corpus (sf0.001 N=400, sf0.01 N=1000): the IVF
    // filter at nprobe=2/k=sqrt(N) is the binding constraint (same floor
    // class as IvfRecallSpec's k=sqrt(N) row); PQ's shortlist (150 >> 5)
    // loses nothing further after the wide exact rerank
    assert(recall >= 0.2, s"composed recall collapsed: $recall")
  }
}
