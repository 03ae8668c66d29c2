package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance (VERDICT r9 item 5): appending a batch
  * must (a) search byte-identically to a train-on-subset/assign-all
  * build, (b) never rewrite existing list files, (c) stay a map-only job
  * over only the new rows, and (d) raise the drift flag exactly when the
  * incoming distribution has shifted away from the frozen quantizer. */
class IvfAppendSpec extends SparkSpec {

  private def vecs = {
    val s = spark
    s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  private def listFiles(idx: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(idx, "assign.parquet")
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
  }

  test("append searches identically to train-on-subset/assign-all, without rewriting files") {
    val v = vecs
    val build = v.where(col("vec_id") % 10 =!= 0)
    val fresh = v.where(col("vec_id") % 10 === 0)

    val idxA = java.nio.file.Files.createTempDirectory("ivf_app_a").toString
    EmbedOps.ivfBuildV(build, idxA, None)
    val before = listFiles(idxA)
    val stats = EmbedOps.ivfAppend(spark, fresh, idxA)
    val after = listFiles(idxA)
    // same-distribution batch: sane stats, no retrain advice
    assert(stats.appended == fresh.count())
    assert(!stats.retrainAdvised,
      s"same-distribution append advised retrain: $stats")
    // append-only layout: every pre-existing file survives at its exact
    // size; the batch only ADDS files (per touched list directory)
    before.foreach { case (p, sz) =>
      assert(after.get(p).contains(sz), s"existing list file rewritten: $p")
    }
    assert(after.size > before.size)

    // the combined index answers byte-identically to assigning the FULL
    // corpus against the same trained quantizer in one shot: reuse idxA's
    // centroids + stats, lay out a fresh assign dir from one all-corpus
    // batch, and compare searches
    val idxB = java.nio.file.Files.createTempDirectory("ivf_app_b").toString
    for (art <- Seq("centroids.parquet", "stats.parquet"))
      spark.read.parquet(s"$idxA/$art").write.parquet(s"$idxB/$art")
    EmbedOps.ivfAppend(spark, v, idxB) // assign-all into an empty layout
    val a = EmbedOps.ivfKnnIndexed(spark, sfDir, idxA)
      .select("qid", "vec_id", "sim_micro").collect().toSet
    val b = EmbedOps.ivfKnnIndexed(spark, sfDir, idxB)
      .select("qid", "vec_id", "sim_micro").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("the append job reads only the new rows: it works with the stored lists deleted") {
    val idx = java.nio.file.Files.createTempDirectory("ivf_app_plan").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    // behavioral proof that append never scans assign.parquet: remove it
    // entirely — the append must still succeed (new rows + the collected
    // centroid/stats artifacts are its ONLY inputs) and lay out exactly
    // the batch rows
    val assignDir = java.nio.file.Paths.get(idx, "assign.parquet")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(assignDir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    val fresh = v.where(col("vec_id") % 10 === 0)
    val stats = EmbedOps.ivfAppend(spark, fresh, idx)
    assert(stats.appended == fresh.count())
    assert(spark.read.parquet(assignDir.toString).count() == stats.appended)
  }

  test("drift detection: a shifted batch advises retrain, an in-distribution one does not") {
    val idx = java.nio.file.Files.createTempDirectory("ivf_app_drift").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    val inDist = EmbedOps.ivfAppend(spark,
      v.where(col("vec_id") % 10 === 0), idx)
    assert(!inDist.retrainAdvised, s"in-distribution flagged: $inDist")
    // shift every coordinate by +10: assignment distances explode past
    // any in-distribution mean — the frozen quantizer is stale
    val shifted = v.where(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("emb"), x => x + lit(10.0)).as("emb"))
    val out = EmbedOps.ivfAppend(spark, shifted, idx)
    assert(out.retrainAdvised, s"shifted batch not flagged: $out")
    assert(out.batchMeanD2 > out.buildMeanD2)
  }

  test("index compaction collapses per-list append debris without changing search results") {
    val idx = java.nio.file.Files.createTempDirectory("ivf_app_compact").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    // five appended micro-batches: each lands one file per touched list
    (0 until 5).foreach { i =>
      EmbedOps.ivfAppend(spark,
        v.where(col("vec_id") % 10 === 0)
          .select((col("vec_id") + (i + 1) * 1000000L).as("vec_id"), col("emb")), idx)
    }
    val before = EmbedOps.ivfKnnIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "sim_micro").collect().toSet
    val filesBefore = listFiles(idx)
    val done = EmbedOps.ivfCompact(spark, idx, ifMoreThan = 2)
    assert(done.nonEmpty)
    done.foreach { case (_, nb, na) => assert(na < nb) }
    val filesAfter = listFiles(idx)
    assert(filesAfter.size < filesBefore.size)
    // untouched (cold) list dirs keep their exact files
    val hot = done.map { case (lid, _, _) => s"list_id=$lid" }.toSet
    filesBefore.filterNot { case (p, _) => hot.exists(p.contains) }
      .foreach { case (p, sz) =>
        assert(filesAfter.get(p).contains(sz), s"cold list file touched: $p")
      }
    // purely physical: identical search results
    val after = EmbedOps.ivfKnnIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "sim_micro").collect().toSet
    assert(after == before && after.nonEmpty)
  }

  test("targeted deletion rewrites only affected lists and vanishes from searches") {
    val s = spark
    import s.implicits._
    val idx = java.nio.file.Files.createTempDirectory("ivf_del").toString
    EmbedOps.ivfBuildV(vecs, idx, None)
    val filesBefore = listFiles(idx)
    // delete a handful of ids that DO appear in search results
    val pre = EmbedOps.ivfKnnIndexed(spark, sfDir, idx)
      .select("vec_id").distinct().as[Long].collect().toSeq.sorted.take(5)
    assert(pre.nonEmpty)
    val (nDel, affected) = EmbedOps.ivfDelete(spark, idx, pre.toDF("vec_id"))
    assert(nDel == pre.size && affected.nonEmpty)
    // unaffected list dirs keep their exact files
    val hot = affected.map(l => s"list_id=$l").toSet
    val filesAfter = listFiles(idx)
    filesBefore.filterNot { case (p, _) => hot.exists(p.contains) }
      .foreach { case (p, sz) =>
        assert(filesAfter.get(p).contains(sz), s"cold list touched: $p")
      }
    // deleted ids are gone from the layout and from every search
    val remaining = spark.read.parquet(s"$idx/assign.parquet")
      .where(col("vec_id").isin(pre: _*)).count()
    assert(remaining == 0L)
    val post = EmbedOps.ivfKnnIndexed(spark, sfDir, idx)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(pre.forall(!post.contains(_)))
    // deleting ids not in the index is a clean no-op
    assert(EmbedOps.ivfDelete(spark, idx,
      Seq(99999999L).toDF("vec_id")) == ((0L, Nil)))
  }

  test("empty append batch is a no-op with no drift advice") {
    val idx = java.nio.file.Files.createTempDirectory("ivf_app_empty").toString
    EmbedOps.ivfBuildV(vecs, idx, None)
    val before = listFiles(idx)
    val stats = EmbedOps.ivfAppend(spark, vecs.where(lit(false)), idx)
    assert(stats.appended == 0L && !stats.retrainAdvised)
    assert(listFiles(idx) == before)
  }
}
