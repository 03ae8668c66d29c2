package graft.queries

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Drift-triggered retrain with zero-downtime generation cutover
  * (VERDICT r15 #3): `ivfRebuild` trains a new generation beside the
  * live one from the index's own rows, commits via the `rebuild.ready`
  * marker, and cuts over with checked renames — crash windows roll
  * forward/back from disk state alone, reads refuse the cutover window
  * loudly, and the result is byte-identical to a from-scratch build on
  * the same vectors. */
class IvfRebuildSpec extends SparkSpec {

  private def vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def search(idx: String): Set[(Long, Long, Long, Int)] =
    EmbedOps.ivfKnnIndexed(spark, sfDir, idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("rebuild after drift: searches byte-match a fresh build and the " +
      "drift baseline refreshes") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_rb").toString
    val idxRef = graft.TempDirs.scratch("ivf_rbref").toString
    val v = vecs
    EmbedOps.ivfBuildV(v, idx, None)
    // a shifted ingest batch drifts past the ratio → advice fires
    // (deterministic set: vec_id < 50 — reused for the reference build)
    val shifted = v.where(col("vec_id") < 50)
      .select((col("vec_id") + 5000000L).as("vec_id"),
        expr("transform(emb, x -> x + 10.0D)").as("emb"))
    val st = EmbedOps.ivfAppend(s, shifted, idx)
    assert(st.retrainAdvised, s"fixture batch did not drift: $st")

    // act on the advice: the new generation must search exactly like a
    // from-scratch build on the SAME vector set (old corpus ∪ batch)
    val (lists, newMean) = EmbedOps.ivfRebuild(s, idx)
    assert(lists > 0 && newMean > 0.0)
    EmbedOps.ivfBuildV(v.union(shifted), idxRef, None)
    assert(search(idx) == search(idxRef),
      "rebuilt generation diverges from a fresh build")
    // the baseline refreshed: the same shifted distribution no longer
    // reads as drift against the retrained quantizer
    val shifted2 = v.where(col("vec_id") < 50)
      .select((col("vec_id") + 6000000L).as("vec_id"),
        expr("transform(emb, x -> x + 10.0D)").as("emb"))
    assert(!EmbedOps.ivfAppend(s, shifted2, idx).retrainAdvised,
      "retrained baseline still flags the shifted distribution")
    // the previous generation is parked, not deleted (explicit rollback)
    assert(fs(idx).exists(new Path(s"$idx/rebuild.old/assign.parquet")))
  }

  test("crash before the ready marker rolls back; crash after it rolls " +
      "forward; reads inside the window refuse loudly") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_rbcrash").toString
    val v = vecs
    EmbedOps.ivfBuildV(v, idx, None)
    val before = search(idx)
    val f = fs(idx)

    // window a: the dead rebuild wrote a (possibly partial) tmp but never
    // committed — reconcile discards it, the live generation is untouched
    EmbedOps.ivfBuildV(v.limit(100), s"$idx/rebuild.tmp", None)
    EmbedOps.reconcileSwaps(s, idx)
    assert(!f.exists(new Path(s"$idx/rebuild.tmp")))
    assert(search(idx) == before)

    // window b: committed (marker present), died mid-cutover after parking
    // ONE artifact — a read now must refuse; reconcile must roll forward
    EmbedOps.ivfBuildV(v, s"$idx/rebuild.tmp", None)
    f.create(new Path(s"$idx/rebuild.ready"), true).close()
    f.mkdirs(new Path(s"$idx/rebuild.old"))
    assert(f.rename(new Path(s"$idx/centroids.parquet"),
      new Path(s"$idx/rebuild.old/centroids.parquet")))
    val ex = intercept[RuntimeException] { EmbedOps.ivfRows(s, idx).count() }
    assert(ex.getMessage.contains("cutover"), ex.getMessage)
    EmbedOps.reconcileSwaps(s, idx)
    assert(!f.exists(new Path(s"$idx/rebuild.ready")))
    assert(search(idx) == before,
      "rolled-forward generation diverges (same corpus, same training)")
  }

  test("IndexStream end-to-end: drift past the ratio triggers the rebuild " +
      "callback, the maintained index keeps serving (VERDICT r15 #3)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val v = vecs
    val idx = graft.TempDirs.scratch("ivf_rbstream").toString
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)

    var rebuilt = 0
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Double])]
    val q = graft.streaming.IndexStream.start(
      input.toDS().map { case (id, e) => graft.streaming.IndexStream.Vec(id, e) },
      idx) { (_, stats) =>
      // the operator's drift hook: act on the advice from maintenance —
      // here inline, because foreachBatch IS the single maintainer
      if (stats.retrainAdvised) { EmbedOps.ivfRebuild(s, idx); rebuilt += 1 }
    }
    try {
      val fresh = v.where(col("vec_id") % 10 === 0)
        .as[(Long, Seq[Double])].collect().toSeq
      input.addData(fresh: _*); q.processAllAvailable()
      assert(rebuilt == 0, "in-distribution batch must not trigger a rebuild")
      // deterministic drifted set (vec_id < 200, %10 == 0 → 20 vectors),
      // reproducible below for the fresh-build reference
      val shifted = fresh.filter(_._1 < 200L).map { case (id, e) =>
        (id + 5000000L, e.map(_ + 10.0)) }
      input.addData(shifted: _*); q.processAllAvailable()
      assert(rebuilt == 1, "drifted batch did not trigger the rebuild hook")
    } finally q.stop()

    // the retrained index equals a fresh build on everything it ingested
    val idxRef = graft.TempDirs.scratch("ivf_rbsref").toString
    val shiftedDf = v.where(col("vec_id") % 10 === 0 && col("vec_id") < 200)
      .select((col("vec_id") + 5000000L).as("vec_id"),
        expr("transform(emb, x -> x + 10.0D)").as("emb"))
    EmbedOps.ivfBuildV(v.union(shiftedDf), idxRef, None)
    assert(search(idx) == search(idxRef),
      "stream-triggered rebuild diverges from a fresh build")
  }
}
