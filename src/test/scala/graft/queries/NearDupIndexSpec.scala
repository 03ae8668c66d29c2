package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted near-dup index lifecycle (VERDICT r10 item 6): takedown
  * deletion must (a) remove exactly the targeted docs from both index
  * tables, (b) rewrite ONLY the `_db` buckets the deleted ids hash to —
  * every other bucket's files survive byte-identically at their exact
  * paths — and (c) let a replica of deleted content ADMIT afterwards
  * while replicas of surviving content still collapse. */
class NearDupIndexSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    s.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
  }

  private def listFiles(idx: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(idx)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && java.nio.file.Files.isRegularFile(p))
      .filterNot(_.toString.contains("del.old"))
      .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
  }

  test("crawl cycle: append admitted batch, next batch collapses against it, append-only files") {
    val s = spark
    import org.apache.spark.sql.functions.col
    val idx = graft.TempDirs.scratch("neardup_app").toString
    // cycle 1: index the first half of the corpus
    val half1 = corpus.where(col("doc_id") % 2 === 0)
    val half2 = corpus.where(col("doc_id") % 2 === 1)
    DocText.neardupIndexBuild(half1, idx)
    // cycle 2: the second half arrives — fresh content, all admits
    assert(DocText.neardupCheck(half2, idx)
      .where(col("new_doc") === col("old_doc")).count() == 0)
    val before = listFiles(idx)
    DocText.neardupIndexAppend(half2, idx)
    val after = listFiles(idx)
    // append-only: every pre-existing bucket file survives byte-identical
    before.foreach { case (p, sz) =>
      assert(after.get(p).contains(sz), s"existing bucket file rewritten: $p")
    }
    assert(after.size > before.size)
    // cycle 3: replicas of the APPENDED half now collapse against the
    // grown index (they'd have admitted against the cycle-1 index)
    val replicas = half2.withColumn("doc_id", col("doc_id") + 1000000L)
    val pairs = DocText.neardupCheck(replicas, idx)
      .select("new_doc", "old_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    half2.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      assert(pairs.contains((id + 1000000L, id)),
        s"replica of appended $id missed its original")
    }
  }

  test("takedown rewrites only affected buckets and re-admits deleted content") {
    val s = spark
    val idx = graft.TempDirs.scratch("neardup_idx").toString
    DocText.neardupIndexBuild(corpus, idx)

    val takedown = corpus.where(col("doc_id") % 10 === 3)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(takedown.nonEmpty)
    val tdBuckets = takedown.map(i => s"_db=${i % 64}").toSet

    val before = listFiles(idx)
    val removed = DocText.neardupIndexDelete(s, idx, takedown)
    assert(removed == takedown.size.toLong, s"removed $removed of ${takedown.size}")
    val after = listFiles(idx)

    // O(affected buckets): every file OUTSIDE the takedown buckets
    // survives at its exact path and size — cold buckets byte-untouched
    before.foreach { case (p, sz) =>
      if (!tdBuckets.exists(p.contains))
        assert(after.get(p).contains(sz), s"cold bucket file rewritten: $p")
    }

    // the targeted docs are gone from both tables, nothing else is
    for (t <- Seq("bands.parquet", "shingles.parquet")) {
      val left = s.read.parquet(s"$idx/$t").select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(takedown.forall(!left.contains(_)), s"$t still holds deleted ids")
      val expect = corpus.select("doc_id").collect().map(_.getLong(0)).toSet -- takedown
      assert(left == expect, s"$t lost survivors: missing ${expect -- left}")
    }

    // a new batch of exact replicas: replicas of DELETED originals admit
    // (no match row), replicas of survivors still collapse at jaccard 1.0
    val fresh = corpus.withColumn("doc_id", col("doc_id") + 1000000L)
    val hits = DocText.neardupCheck(fresh, idx)
      .select("new_doc", "old_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.forall { case (_, o) => !takedown.contains(o) },
      "deleted original still suppresses")
    // pairwise: each replica vs ITS OWN original (organic near-dups of
    // OTHER surviving docs may legitimately still match the replica)
    val pairs = hits.toSet
    corpus.select("doc_id").collect().map(_.getLong(0)).foreach { id =>
      if (takedown.contains(id))
        assert(!pairs.contains((id + 1000000L, id)),
          s"replica of deleted $id still matched its original")
      else
        assert(pairs.contains((id + 1000000L, id)),
          s"replica of survivor $id missed its original")
    }
  }
}
