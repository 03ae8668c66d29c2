package graft.queries

import graft.SparkSpec

/** Scalar (int8) quantization: training-free 8× compression. With a
  * SHORTLIST ≫ TOPK the exact rerank must recover essentially all true
  * neighbors — int8 range quantization over 64 dims perturbs distances
  * far less than PQ's 8-byte codes — and the persisted codes table must
  * search byte-identically. */
class Sq8Spec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recall@5 vs brute force is near-exact after the rerank") {
    val brute = topk(EmbedOps.all.find(_.name == "em_knn_brute").get.fn(spark, sfDir))
    val sq = topk(EmbedOps.sq8Adc(spark, sfDir))
    val recall = (sq & brute).size.toDouble / brute.size
    // the ADC error only costs recall when a true neighbor falls outside
    // the 150-wide approximate shortlist — measured ≥ 0.9 on this corpus
    assert(recall >= 0.9, s"sq8 recall collapsed: $recall")
  }

  test("persisted codes search byte-identically") {
    val idx = java.nio.file.Files.createTempDirectory("sq8_idx_spec").toString
    EmbedOps.sq8Build(spark, sfDir, idx)
    val live = EmbedOps.sq8Adc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val fromIndex = EmbedOps.sq8Indexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(fromIndex == live && live.nonEmpty)
  }
}
