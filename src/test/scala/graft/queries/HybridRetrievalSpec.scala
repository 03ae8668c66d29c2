package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Filtered ANN + hybrid BM25⊕vector retrieval: the semantic properties
  * the hash oracle can't express as directly — predicate enforcement on
  * the filtered search, and end-to-end fusion behavior on a planted
  * both-sides-relevant document. */
class HybridRetrievalSpec extends SparkSpec {

  test("filtered search returns ONLY vectors satisfying the predicate, " +
      "never the query itself, with contiguous ranks") {
    val s = spark
    val idx = graft.TempDirs.scratch("hyb_ivf_flt").toString
    EmbedOps.ivfBuild(s, sfDir, idx, None)
    val keepIds = s.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("label") % 3 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val rows = EmbedOps.ivfKnnIndexedFiltered(s, sfDir, idx,
        s.read.parquet(s"$sfDir/embeddings.parquet")
          .where(col("label") % 3 === 0).select("vec_id"))
      .select("qid", "vec_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, vid, _) =>
      assert(keepIds(vid), s"qid $qid returned $vid outside the keep-set")
      assert(vid != qid, s"qid $qid returned itself")
    }
    rows.groupBy(_._1).values.foreach { ps =>
      assert(ps.map(_._3).sorted.toSeq == (1 to ps.length),
        s"non-contiguous ranks: $ps")
    }
  }

  test("persisted RAG retrieval is byte-identical to the in-gate hybrid " +
      "RAG composition") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("ragp_vec").toString
    val txtIdx = graft.TempDirs.scratch("ragp_txt").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSet
    assert(rows(EmbedOps.ragPersisted(s, sfDir, vecIdx, txtIdx)) ==
      rows(EmbedOps.ragHybrid(s, sfDir)),
      "from-disk RAG retrieve diverges from the in-gate composition")
  }

  test("filtered top-1 similarity never beats the unfiltered top-1 " +
      "(the keep-set only removes candidates)") {
    val s = spark
    val idx = graft.TempDirs.scratch("hyb_ivf_cmp").toString
    EmbedOps.ivfBuild(s, sfDir, idx, None)
    val unf = EmbedOps.ivfKnnIndexed(s, sfDir, idx)
      .where(col("rn") === 1).select("qid", "sim_micro")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    EmbedOps.ivfKnnIndexedFiltered(s, sfDir, idx,
        s.read.parquet(s"$sfDir/embeddings.parquet")
          .where(col("label") % 3 === 0).select("vec_id"))
      .where(col("rn") === 1).select("qid", "sim_micro")
      .collect().foreach { r =>
        assert(r.getLong(1) <= unf(r.getLong(0)),
          s"qid ${r.getLong(0)}: filtered top-1 beats unfiltered")
      }
  }

  test("filtered search through the compression honors the predicate: " +
      "only keep-set vectors, no self-matches, contiguous ranks") {
    val s = spark
    val keepIds = s.read.parquet(s"$sfDir/embeddings.parquet")
      .where(col("label") % 3 === 0).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val rows = EmbedOps.ivfPqFiltered(s, sfDir)
      .select("qid", "vec_id", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (qid, vid, _) =>
      assert(keepIds(vid), s"qid $qid returned $vid outside the keep-set")
      assert(vid != qid, s"qid $qid returned itself")
    }
    rows.groupBy(_._1).values.foreach { ps =>
      assert(ps.map(_._3).sorted.toSeq == (1 to ps.length))
    }
  }

  test("hybrid RRF: complete rank sequences, fused scores within the " +
      "two-sided bound, and both-ranked docs beat text-only/vector-only " +
      "score arithmetic") {
    val rows = EmbedOps.hybridRrf(spark, sfDir)
      .select("qid", "doc_id", "rrf_micro", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val maxOne = math.floor(1.0e9 / 61.0 + 0.5).toLong // best single-side share
    rows.groupBy(_._1).values.foreach { ps =>
      assert(ps.map(_._4).sorted.toSeq == (1 to ps.length))
      ps.foreach { case (_, _, sc, _) =>
        assert(sc > 0L && sc <= 2 * maxOne, s"rrf score out of bounds: $sc")
      }
    }
  }

  test("hybrid through the compression: complete rank sequences, no " +
      "self-picks, scores within the two-sided bound") {
    val rows = EmbedOps.hybridRrfIvfPq(spark, sfDir)
      .select("qid", "doc_id", "rrf_micro", "rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val maxOne = math.floor(1.0e9 / 61.0 + 0.5).toLong
    rows.groupBy(_._1).foreach { case (qid, ps) =>
      assert(ps.map(_._4).sorted.toSeq == (1 to ps.length))
      assert(!ps.exists(_._2 == qid), s"qid $qid picked itself")
      ps.foreach { case (_, _, sc, _) =>
        assert(sc > 0L && sc <= 2 * maxOne, s"score out of bounds: $sc")
      }
    }
  }

  test("a planted doc that is both token-identical and vector-identical " +
      "to the query is retrieved by the fusion") {
    val s = spark
    val dir = graft.TempDirs.scratch("hyb_plant").toString
    val clone = 900000L
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    docs.unionByName(docs.where(col("doc_id") === 0L)
        .withColumn("doc_id", lit(clone)))
      .write.parquet(s"$dir/documents.parquet")
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
    v.unionByName(v.where(col("vec_id") === 0L)
        .withColumn("vec_id", lit(clone)))
      .write.parquet(s"$dir/embeddings.parquet")
    val q0 = EmbedOps.hybridRrf(s, dir)
      .where(col("qid") === 0L)
      .select("doc_id", "rn")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(q0.exists(_._1 == clone),
      s"planted both-sides duplicate of query 0 not retrieved: ${q0.toSeq}")
  }
}
