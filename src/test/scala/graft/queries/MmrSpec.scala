package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MMR diversified top-k: pick 1 must equal the plain nearest neighbor,
  * picks are distinct and exactly TOPK, and — the point of the operator
  * — an exact duplicate of the first pick is demoted out of pick 2
  * (plain similarity ranking would place it there), on a corpus where
  * the duplicate is planted deliberately. */
class MmrSpec extends SparkSpec {

  test("diversification: a planted duplicate of pick 1 never takes pick 2") {
    val s = spark
    import s.implicits._
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
    // plant: replicate every query's plain top-1 candidate under a
    // shifted id — the replica ties it in query-similarity, so a pure
    // similarity ranking puts the pair at picks {1, 2}
    val base = EmbedOps.mmrSelect(s, sfDir)
    val top1 = base.where(col("pick") === 1)
      .select("vec_id").distinct().as[Long].collect().toSeq
    val dir = graft.TempDirs.scratch("mmr_plant").toString
    v.unionByName(
        v.where(col("vec_id").isin(top1: _*))
          .withColumn("vec_id", col("vec_id") + 1000000L))
      .write.parquet(s"$dir/embeddings.parquet")
    val picks = EmbedOps.mmrSelect(s, dir)
      .select("qid", "vec_id", "pick")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val byQ = picks.groupBy(_._1)
    byQ.foreach { case (qid, ps) =>
      assert(ps.length == 5 && ps.map(_._2).distinct.length == 5, s"qid $qid: $ps")
      val p1 = ps.find(_._3 == 1).get._2
      val p2 = ps.find(_._3 == 2).get._2
      val dupPair = math.abs(p1 - p2) == 1000000L
      assert(!dupPair,
        s"qid $qid: duplicate pair ($p1, $p2) occupies picks 1 and 2 — no diversification")
    }
  }

  test("exactly TOPK distinct picks per query with a complete pick sequence") {
    val picks = EmbedOps.mmrSelect(spark, sfDir)
      .select("qid", "pick").collect().map(r => (r.getLong(0), r.getInt(1)))
    picks.groupBy(_._1).values.foreach { ps =>
      assert(ps.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5))
    }
  }

  test("IVFPQ-composed MMR: complete pick sequences, no self-picks, and " +
      "every pick comes from inside the compressed shortlist") {
    val s = spark
    val rows = EmbedOps.mmrIvfPq(s, sfDir)
      .select("qid", "vec_id", "pick")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, ps) =>
      assert(ps.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5), s"qid $qid: $ps")
      assert(ps.map(_._2).distinct.length == ps.length, s"qid $qid dup picks")
      assert(!ps.exists(_._2 == qid), s"qid $qid picked itself")
    }
    // the candidate pool is the ADC shortlist by construction — pick 1
    // must be the exact-cosine argmax over that pool, which the brute
    // gate's pick 1 (argmax over ALL candidates) can only match or beat:
    // composed pick-1 similarity ≤ brute pick-1 similarity per query
    val brute1 = EmbedOps.mmrSelect(s, sfDir)
      .where(col("pick") === 1)
      .select("qid", "score_micro")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    EmbedOps.mmrIvfPq(s, sfDir)
      .where(col("pick") === 1)
      .select("qid", "score_micro")
      .collect().foreach { r =>
        assert(r.getLong(1) <= brute1(r.getLong(0)),
          s"qid ${r.getLong(0)}: composed pick-1 beats the brute argmax")
      }
  }
}
