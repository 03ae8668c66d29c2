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
    val idx = graft.TempDirs.scratch("bq_idx_spec").toString
    EmbedOps.bqBuild(spark, sfDir, idx)
    val live = EmbedOps.bqAdc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val fromIndex = EmbedOps.bqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(fromIndex == live && live.nonEmpty)
  }

  test("append is byte-equivalent to encode-all (training-free encoding)") {
    val app = EmbedOps.all.find(_.name == "em_bq_append").get.fn(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val full = EmbedOps.bqAdc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(app == full && full.nonEmpty)
  }

  test("bqDelete: victims purged from codes and search, survivors intact " +
      "(VERDICT r14 #5)") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("bq_del_spec").toString
    EmbedOps.bqBuild(s, sfDir, idx)
    val beforeIds = s.read.parquet(s"$idx/bq.parquet")
      .select("vec_id").as[Long].collect().toSet
    val victims = beforeIds.filter(_ >= 10).toSeq.sorted.take(5)
    assert(EmbedOps.bqDelete(s, idx, victims.toDF("vec_id")) == victims.size)
    assert(s.read.parquet(s"$idx/bq.parquet")
      .select("vec_id").as[Long].collect().toSet == beforeIds -- victims)
    val hits = EmbedOps.bqIndexed(s, sfDir, idx)
      .select("vec_id").as[Long].collect().toSet
    assert(victims.forall(!hits.contains(_)))
    assert(EmbedOps.bqDelete(s, idx, victims.toDF("vec_id")) == 0L)
  }
}
