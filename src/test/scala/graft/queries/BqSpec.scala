package graft.queries

import graft.SparkSpec

/** Binary (sign) quantization: 64× compression, Hamming shortlist,
  * exact rerank. One bit per dimension is the lossiest rung of the
  * ladder, so the recall floor is the loosest — but with SHORTLIST ≫
  * TOPK the rerank must still recover a meaningful fraction of true
  * neighbors, and the persisted codes must search byte-identically. */
class BqSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recall@5 vs brute force holds a measured floor") {
    val brute = topk(EmbedOps.all.find(_.name == "em_knn_brute").get.fn(spark, sfDir))
    val bq = topk(EmbedOps.bqAdc(spark, sfDir))
    val recall = (bq & brute).size.toDouble / brute.size
    assert(recall >= 0.3, s"bq recall collapsed: $recall")
  }

  test("persisted packed codes search byte-identically") {
    val idx = java.nio.file.Files.createTempDirectory("bq_idx_spec").toString
    EmbedOps.bqBuild(spark, sfDir, idx)
    val live = EmbedOps.bqAdc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val fromIndex = EmbedOps.bqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(fromIndex == live && live.nonEmpty)
  }
}
