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
    val idx = graft.TempDirs.scratch("sq8_idx_spec").toString
    EmbedOps.sq8Build(spark, sfDir, idx)
    val live = EmbedOps.sq8Adc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val fromIndex = EmbedOps.sq8Indexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(fromIndex == live && live.nonEmpty)
  }

  test("append is byte-equivalent to encode-all (training-free encoding), " +
      "and delete purges appended rows") {
    val s = spark
    import org.apache.spark.sql.functions.{col, lit}
    // gate-level equivalence: build-90% + append-10% == the full build
    val app = EmbedOps.all.find(_.name == "em_sq8_append").get.fn(s, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val full = EmbedOps.sq8Adc(s, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(app == full && full.nonEmpty)
    // delete-after-append: clones appended under shifted ids, then taken
    // down — search returns exactly the pre-append results
    val idx = graft.TempDirs.scratch("sq8_app_spec").toString
    EmbedOps.sq8Build(s, sfDir, idx)
    val before = EmbedOps.sq8Indexed(s, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val clones = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select((col("vec_id") + lit(1000000L)).as("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    assert(EmbedOps.sq8Append(s, clones, idx) > 0)
    val cloneIds = clones.select("vec_id")
    assert(EmbedOps.sq8Delete(s, idx, cloneIds) > 0)
    val after = EmbedOps.sq8Indexed(s, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(after == before)
  }

  test("sq8Delete: victims purged from codes and search, survivors intact, " +
      "interrupted swap heals (VERDICT r14 #5)") {
    import org.apache.hadoop.fs.Path
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("sq8_del_spec").toString
    EmbedOps.sq8Build(s, sfDir, idx)
    val beforeIds = s.read.parquet(s"$idx/sq8.parquet")
      .select("vec_id").as[Long].collect().toSet
    // victims outside the query id range so every query still searches
    val victims = beforeIds.filter(_ >= 10).toSeq.sorted.take(5)
    assert(EmbedOps.sq8Delete(s, idx, victims.toDF("vec_id")) == victims.size)
    val afterIds = s.read.parquet(s"$idx/sq8.parquet")
      .select("vec_id").as[Long].collect().toSet
    assert(afterIds == beforeIds -- victims)
    val hits = EmbedOps.sq8Indexed(s, sfDir, idx)
      .select("vec_id").as[Long].collect().toSet
    assert(victims.forall(!hits.contains(_)))
    // re-deleting the same ids is a no-op
    assert(EmbedOps.sq8Delete(s, idx, victims.toDF("vec_id")) == 0L)
    // crash window: live renamed away, survivors parked under tmp —
    // reconcileSwaps (the pqDelete swap rule, sq8 namespace) finishes it
    val f = new Path(idx).getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(f.rename(new Path(s"$idx/sq8.parquet"), new Path(s"$idx/sq8.parquet.tmp")))
    EmbedOps.reconcileSwaps(s, idx)
    assert(f.exists(new Path(s"$idx/sq8.parquet")))
    assert(!f.exists(new Path(s"$idx/sq8.parquet.tmp")))
    assert(s.read.parquet(s"$idx/sq8.parquet")
      .select("vec_id").as[Long].collect().toSet == afterIds)
  }
}
