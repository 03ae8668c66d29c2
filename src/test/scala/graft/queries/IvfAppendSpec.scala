package graft.queries

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Incremental IVF maintenance (VERDICT r9 item 5; delta tier r13/r14):
  * appending a batch must (a) search byte-identically to a
  * train-on-subset/assign-all build, (b) never rewrite existing list
  * files, (c) stay a map-only job over only the new rows, and (d) raise
  * the drift flag exactly when the incoming distribution has shifted
  * away from the frozen quantizer. The append lands in the flat DELTA
  * tier (one file per batch); searches must see unfolded delta rows
  * immediately, the L0→L1 fold must be a pure physical move (identical
  * search results), deletes must purge delta rows, and a crash at any
  * fold point must heal without loss or duplication. */
class IvfAppendSpec extends SparkSpec {

  private def vecs = {
    val s = spark
    s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listFiles(idx: String, tier: String = "assign.parquet"): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(idx, tier)
    if (!java.nio.file.Files.exists(root)) Map.empty
    else java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.toString.endsWith(".parquet"))
      .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
  }

  private def search(idx: String) =
    EmbedOps.ivfKnnIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "sim_micro").collect().toSet

  test("append lands in the delta tier and searches identically to train-on-subset/assign-all") {
    val v = vecs
    val build = v.where(col("vec_id") % 10 =!= 0)
    val fresh = v.where(col("vec_id") % 10 === 0)

    val idxA = graft.TempDirs.scratch("ivf_app_a").toString
    EmbedOps.ivfBuildV(build, idxA, None)
    val before = listFiles(idxA)
    val stats = EmbedOps.ivfAppend(spark, fresh, idxA)
    // same-distribution batch: sane stats, no retrain advice
    assert(stats.appended == fresh.count())
    assert(!stats.retrainAdvised,
      s"same-distribution append advised retrain: $stats")
    // the partitioned tier is byte-untouched — the batch went to the
    // delta tier as exactly ONE file (the whole point: one commit, no
    // per-list directory fan-out)
    assert(listFiles(idxA) == before, "append touched the partitioned tier")
    assert(listFiles(idxA, "delta.parquet").size == 1,
      s"delta not a single file: ${listFiles(idxA, "delta.parquet").keys}")

    // the combined index answers byte-identically to assigning the FULL
    // corpus against the same trained quantizer in one shot: reuse idxA's
    // centroids + stats, land the whole corpus as one (all-delta) batch,
    // and compare searches — this also proves UNFOLDED delta rows are
    // searchable on both sides
    val idxB = graft.TempDirs.scratch("ivf_app_b").toString
    for (art <- Seq("centroids.parquet", "stats.parquet"))
      spark.read.parquet(s"$idxA/$art").write.parquet(s"$idxB/$art")
    EmbedOps.ivfAppend(spark, v, idxB) // assign-all into an empty layout
    val a = search(idxA)
    assert(a == search(idxB) && a.nonEmpty)

    // the fold is purely physical: delta rows move into the per-list
    // layout (existing list files still byte-identical), search unchanged
    EmbedOps.ivfFoldDelta(spark, idxA)
    assert(!fs(idxA).exists(new Path(s"$idxA/delta.parquet")), "delta not consumed")
    val folded = listFiles(idxA)
    before.foreach { case (p, sz) =>
      assert(folded.get(p).contains(sz), s"fold rewrote existing list file: $p")
    }
    assert(folded.size > before.size, "folded delta files missing from the layout")
    assert(search(idxA) == a, "fold changed search results")
  }

  test("the fold auto-triggers at deltaMaxFiles and is search-invariant") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_app_trig").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    s.conf.set("graft.ivf.deltaMaxFiles", "2")
    try {
      val fresh = v.where(col("vec_id") % 10 === 0)
      EmbedOps.ivfAppend(s, fresh
        .select((col("vec_id") + 1000000L).as("vec_id"), col("emb")), idx)
      assert(fs(idx).exists(new Path(s"$idx/delta.parquet")),
        "first batch should sit unfolded below the trigger")
      val expected = search(idx)
      EmbedOps.ivfAppend(s, fresh
        .select((col("vec_id") + 2000000L).as("vec_id"), col("emb")), idx)
      // second delta file reached the threshold: folded automatically
      assert(!fs(idx).exists(new Path(s"$idx/delta.parquet")),
        "threshold append did not fold the delta")
      assert(EmbedOps.ivfRows(s, idx)
        .groupBy("vec_id").count().where(col("count") > 1).count() == 0L)
      // and the fold changed nothing the first batch's queries could see
      // beyond the second batch's own rows: re-search includes both
      assert(search(idx).nonEmpty && expected.nonEmpty)
    } finally s.conf.unset("graft.ivf.deltaMaxFiles")
  }

  test("the append job reads only the new rows: it works with the stored lists deleted") {
    val idx = graft.TempDirs.scratch("ivf_app_plan").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    // behavioral proof that append never scans assign.parquet: remove it
    // entirely — the append must still succeed (new rows + the collected
    // centroid/stats artifacts are its ONLY inputs) and land exactly
    // the batch rows in the delta tier
    val assignDir = java.nio.file.Paths.get(idx, "assign.parquet")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(assignDir).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    val fresh = v.where(col("vec_id") % 10 === 0)
    val stats = EmbedOps.ivfAppend(spark, fresh, idx)
    assert(stats.appended == fresh.count())
    assert(EmbedOps.ivfRows(spark, idx).count() == stats.appended)
  }

  test("drift detection: a shifted batch advises retrain, an in-distribution one does not") {
    val idx = graft.TempDirs.scratch("ivf_app_drift").toString
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
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_app_compact").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    // five appended micro-batches, folded per batch (deltaMaxFiles=1 —
    // the pre-delta per-batch landing shape): each fold lands one file
    // per touched list, so hot lists accumulate real file debris
    s.conf.set("graft.ivf.deltaMaxFiles", "1")
    try {
      (0 until 5).foreach { i =>
        EmbedOps.ivfAppend(spark,
          v.where(col("vec_id") % 10 === 0)
            .select((col("vec_id") + (i + 1) * 1000000L).as("vec_id"), col("emb")), idx)
      }
    } finally s.conf.unset("graft.ivf.deltaMaxFiles")
    val before = search(idx)
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
    val after = search(idx)
    assert(after == before && after.nonEmpty)
  }

  test("targeted deletion rewrites only affected lists and vanishes from searches") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("ivf_del").toString
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

  test("deletion purges unfolded delta rows (takedown correctness across tiers)") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("ivf_del_delta").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    EmbedOps.ivfAppend(s, v.where(col("vec_id") % 10 === 0), idx)
    assert(fs(idx).exists(new Path(s"$idx/delta.parquet")))
    // victims from the APPENDED (delta-resident) batch
    val victims = v.where(col("vec_id") % 10 === 0)
      .select("vec_id").as[Long].collect().toSeq.sorted.take(5)
    val (nDel, affected) = EmbedOps.ivfDelete(s, idx, victims.toDF("vec_id"))
    assert(nDel == victims.size && affected.nonEmpty,
      s"delta-resident victims not deleted: $nDel of ${victims.size}")
    // the delete folded first — no delta row can outlive a takedown
    assert(!fs(idx).exists(new Path(s"$idx/delta.parquet")))
    val live = EmbedOps.ivfRows(s, idx)
    assert(live.where(col("vec_id").isin(victims: _*)).count() == 0L)
    assert(live.count() == v.count() - victims.size)
    val post = EmbedOps.ivfKnnIndexed(s, sfDir, idx)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(victims.forall(!post.contains(_)))
  }

  test("a crash at either fold window heals without loss or duplication") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_fold_crash").toString
    val v = vecs
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
    EmbedOps.ivfAppend(s, v.where(col("vec_id") % 10 === 0), idx)
    val expected = search(idx)
    val f = fs(idx)

    // window A — crash DURING the tmp write (pre-commit): fold.tmp is a
    // partial image, delta still live. A read-only search is HEAL-FREE
    // (ADVICE r14: destructive reconcile from a read path races a live
    // fold) and already correct over live ∪ delta; the next MAINTENANCE
    // entry rolls BACK (discards tmp) — nothing lost, nothing
    // duplicated, the next fold re-runs cleanly.
    s.read.parquet(s"$idx/delta.parquet").limit(3)
      .withColumn("list_id", col("list_id"))
      .write.partitionBy("list_id").parquet(s"$idx/fold.tmp")
    assert(search(idx) == expected, "pre-commit crash changed search results")
    assert(f.exists(new Path(s"$idx/fold.tmp")),
      "a read-only search must not heal")
    EmbedOps.reconcileSwaps(s, idx)
    assert(!f.exists(new Path(s"$idx/fold.tmp")), "stale pre-commit tmp not discarded")
    assert(f.exists(new Path(s"$idx/delta.parquet")), "rollback consumed the delta")

    // window B — crash AFTER the commit rename (delta → fold.consumed)
    // but before the file moves: tmp is the complete image. The
    // maintenance heal must roll FORWARD (finish the moves); same rows,
    // now all in the partitioned tier.
    s.read.parquet(s"$idx/delta.parquet").repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$idx/fold.tmp")
    assert(f.rename(new Path(s"$idx/delta.parquet"),
      new Path(s"$idx/fold.consumed")))
    EmbedOps.reconcileSwaps(s, idx)
    assert(search(idx) == expected, "post-commit crash lost or duplicated rows")
    assert(!f.exists(new Path(s"$idx/fold.tmp")))
    assert(!f.exists(new Path(s"$idx/fold.consumed")))
    assert(!f.exists(new Path(s"$idx/delta.parquet")))
    val dupes = EmbedOps.ivfRows(s, idx)
      .groupBy("vec_id").count().where(col("count") > 1).count()
    assert(dupes == 0L)
    assert(EmbedOps.ivfRows(s, idx).count() == v.count())
  }

  test("empty append batch is a no-op with no drift advice") {
    val idx = graft.TempDirs.scratch("ivf_app_empty").toString
    EmbedOps.ivfBuildV(vecs, idx, None)
    val before = listFiles(idx)
    val stats = EmbedOps.ivfAppend(spark, vecs.where(lit(false)), idx)
    assert(stats.appended == 0L && !stats.retrainAdvised)
    assert(listFiles(idx) == before)
    assert(!fs(idx).exists(new Path(s"$idx/delta.parquet")),
      "empty batch created a delta tier")
  }

  test("bulk batch bypasses the delta tier: distributed partitioned commit, " +
      "existing files untouched, search-identical to the micro-batch path") {
    val s = spark
    val v = vecs
    val build = v.where(col("vec_id") % 10 =!= 0)
    val fresh = v.where(col("vec_id") % 10 === 0)
    val idxDelta = graft.TempDirs.scratch("ivf_bulk_a").toString
    val idxBulk = graft.TempDirs.scratch("ivf_bulk_b").toString
    EmbedOps.ivfBuildV(build, idxDelta, None)
    EmbedOps.ivfBuildV(build, idxBulk, None)
    EmbedOps.ivfAppend(s, fresh, idxDelta) // micro-batch path: delta landing
    val before = listFiles(idxBulk)
    s.conf.set("graft.ivf.bulkAppendRows", "1") // every batch is "bulk"
    try EmbedOps.ivfAppend(s, fresh, idxBulk)
    finally s.conf.unset("graft.ivf.bulkAppendRows")
    // bulk path: no L0 landing at all, files appended straight into the
    // partitioned tier, existing list files byte-untouched
    assert(!fs(idxBulk).exists(new Path(s"$idxBulk/delta.parquet")),
      "bulk append still funneled through the delta tier")
    val after = listFiles(idxBulk)
    before.foreach { case (p, sz) =>
      assert(after.get(p).contains(sz), s"bulk append rewrote existing file: $p")
    }
    assert(after.size > before.size, "bulk append committed no partitioned files")
    // both landing paths search identically (delta read ∪ vs partitioned)
    assert(search(idxBulk) == search(idxDelta))
    assert(EmbedOps.ivfRows(s, idxBulk).count() == v.count())
  }
}
