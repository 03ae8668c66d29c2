package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PQ-ADC quality: the compressed-domain scan must be measured — not
  * asserted blindly — against the exact L2 baseline (PQ ranks by
  * asymmetric L2, so the baseline here is exact L2 top-k, not the cosine
  * brute used by the LSH/IVF specs). */
class PqRecallSpec extends SparkSpec {

  private def l2TopK(k: Int) = {
    val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val q = v.where(col("vec_id") < 10).toDF("qid", "qe")
    v.crossJoin(q).where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("aggregate(zip_with(emb, qe, (a, b) -> (a - b) * (a - b)), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)").as("d2"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("d2").asc, col("vec_id").asc)))
      .where(col("rn") <= k)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("PQ-ADC recall@5 vs exact L2 stays meaningful at 16x compression") {
    val brute = l2TopK(5)
    assert(brute.nonEmpty)
    val pq = EmbedOps.pqAdc(spark, sfDir)
      .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq & brute).size.toDouble / brute.size
    // Measured: 0.44 at sf0.001 (N=400), 0.60 at sf0.01 (N=1000) — random
    // 64-dim vectors are PQ's worst case (no cluster structure for the
    // codebooks to exploit; shortlist-only ADC recall was 0.14 before the
    // exact rerank stage). The floor pins the two-stage structure working,
    // not a hero number.
    assert(recall >= 0.3, s"PQ recall collapsed: $recall")
  }

  test("every query returns exactly TOPK ranked codes-scan candidates") {
    val out = EmbedOps.pqAdc(spark, sfDir)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(out.nonEmpty && out.forall(_ == 5L))
  }
}
