package graft.queries

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Crash-safety of the index maintenance swaps (ADVICE r11 medium): the
  * two-rename swap (live→old, tmp→live) can die between the renames,
  * leaving a list/bucket's survivors parked under tmp and nothing live.
  * `reconcileSwaps`/`neardupReconcile` must heal that state from disk
  * alone before any maintenance op reads the live layout — no silent row
  * loss, whatever point the previous process died at. Also pins the
  * namespace split: a delete must never clobber the `compact.old`
  * generation a compaction parked for lazy readers. */
class SwapReconcileSpec extends SparkSpec {

  private def vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def fs(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def biggestList(assign: String): Long =
    spark.read.parquet(assign)
      .groupBy(col("list_id").cast("long").as("lid")).count()
      .orderBy(desc("count"), asc("lid")).head.getLong(0)

  test("IVF delete crash between the renames: survivors return to the live layout") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_crash_c").toString
    EmbedOps.ivfBuildV(vecs, idx, None)
    val assign = s"$idx/assign.parquet"
    val n = vecs.count()
    val lid = biggestList(assign)
    val live = s.read.parquet(s"$assign/list_id=$lid")
    val victim = live.agg(min("vec_id")).head.getLong(0)
    // crash window c: the dead delete staged its survivors under del.tmp
    // and renamed live→del.old, but died before tmp→live
    live.where(col("vec_id") =!= victim)
      .write.parquet(s"$idx/del.tmp/list_id=$lid")
    val f = fs(idx)
    f.mkdirs(new Path(s"$idx/del.old"))
    assert(f.rename(new Path(s"$assign/list_id=$lid"),
      new Path(s"$idx/del.old/list_id=$lid")))
    // the replay scrub path: ivfDelete reconciles first, then deletes —
    // the victim is already gone from the healed layout, so this is a
    // no-op delete over intact survivors (ids as literals: the lazy
    // `live` plan points at the renamed-away path)
    import s.implicits._
    val (nDel, _) = EmbedOps.ivfDelete(s, idx, Seq(victim).toDF("vec_id"))
    assert(nDel == 0L)
    assert(!f.exists(new Path(s"$idx/del.tmp")))
    val after = s.read.parquet(assign)
    assert(after.count() == n - 1, "survivor rows lost after crash+heal")
    assert(after.where(col("vec_id") === victim).count() == 0L)
    assert(after.groupBy("vec_id").count().where(col("count") > 1).count() == 0L)
  }

  test("a read through the mid-swap loss window fails loudly instead of " +
      "silently omitting the list (ADVICE r15)") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_crash_read").toString
    EmbedOps.ivfBuildV(vecs, idx, None)
    val assign = s"$idx/assign.parquet"
    val lid = biggestList(assign)
    val live = s.read.parquet(s"$assign/list_id=$lid")
    val victim = live.agg(min("vec_id")).head.getLong(0)
    // crash window c again: survivors parked under del.tmp, live renamed
    // away — a plain read here would return plausible-but-pruned top-k
    live.where(col("vec_id") =!= victim)
      .write.parquet(s"$idx/del.tmp/list_id=$lid")
    val f = fs(idx)
    f.mkdirs(new Path(s"$idx/del.old"))
    assert(f.rename(new Path(s"$assign/list_id=$lid"),
      new Path(s"$idx/del.old/list_id=$lid")))
    val ex = intercept[RuntimeException] { EmbedOps.ivfRows(s, idx).count() }
    assert(ex.getMessage.contains("reconcileSwaps"),
      s"guard message should name the heal entrypoint: ${ex.getMessage}")
    // the guard is NON-destructive: the debris is still there for the
    // maintenance-side heal, which restores the survivors
    assert(f.exists(new Path(s"$idx/del.tmp/list_id=$lid")))
    EmbedOps.reconcileSwaps(s, idx)
    assert(EmbedOps.ivfRows(s, idx).count() == vecs.count() - 1)
    // pre-swap tmp (live intact) does NOT trip the guard — the live
    // layout is complete, reads proceed
    s.read.parquet(s"$assign/list_id=$lid").limit(1)
      .write.parquet(s"$idx/del.tmp/list_id=$lid")
    assert(EmbedOps.ivfRows(s, idx).count() == vecs.count() - 1)
  }

  test("a read behind a committed-but-unfinished fold fails loudly (ADVICE r15)") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_fold_read").toString
    EmbedOps.ivfBuildV(vecs, idx, None)
    // simulate the fold's post-commit window: the delta was renamed to the
    // consumed marker but its tmp image never moved in — those rows are
    // invisible to a plain two-tier read
    fs(idx).mkdirs(new Path(s"$idx/fold.consumed"))
    val ex = intercept[RuntimeException] { EmbedOps.ivfRows(s, idx).count() }
    assert(ex.getMessage.contains("fold"), ex.getMessage)
    fs(idx).delete(new Path(s"$idx/fold.consumed"), true)
    assert(EmbedOps.ivfRows(s, idx).count() == vecs.count())
  }

  test("IVF delete crash before the swap started: staged tmp is discarded, live intact") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_crash_a").toString
    EmbedOps.ivfBuildV(vecs, idx, None)
    val assign = s"$idx/assign.parquet"
    val n = vecs.count()
    val lid = biggestList(assign)
    val live = s.read.parquet(s"$assign/list_id=$lid")
    val victim = live.agg(min("vec_id")).head.getLong(0)
    // crash window a/b: survivors staged, live untouched
    live.where(col("vec_id") =!= victim)
      .write.parquet(s"$idx/del.tmp/list_id=$lid")
    // re-running the SAME delete must land exactly once: reconcile
    // discards the stale tmp, the delete re-runs from the intact live
    import s.implicits._
    val (nDel, affected) = EmbedOps.ivfDelete(s, idx, Seq(victim).toDF("vec_id"))
    assert(nDel == 1L && affected == Seq(lid))
    val after = s.read.parquet(assign)
    assert(after.count() == n - 1)
    assert(after.where(col("vec_id") === victim).count() == 0L)
  }

  test("codes-table swap heals both ways") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("codes_crash").toString
    val rows = Seq((1L, 0, 2L), (2L, 0, 3L)).toDF("vec_id", "m", "code")
    // live missing, tmp staged → finish the swap
    rows.write.parquet(s"$idx/codes.parquet.tmp")
    EmbedOps.reconcileSwaps(s, idx)
    assert(s.read.parquet(s"$idx/codes.parquet").count() == 2L)
    assert(!fs(idx).exists(new Path(s"$idx/codes.parquet.tmp")))
    // both present → swap never started, tmp discarded
    rows.limit(1).write.parquet(s"$idx/codes.parquet.tmp")
    EmbedOps.reconcileSwaps(s, idx)
    assert(s.read.parquet(s"$idx/codes.parquet").count() == 2L)
    assert(!fs(idx).exists(new Path(s"$idx/codes.parquet.tmp")))
  }

  test("a delete never clobbers the compact.old generation a compaction parked") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_ns").toString
    val slices = (0 until 4).map(i => vecs.where(pmod(col("vec_id"), lit(4)) === i))
    EmbedOps.ivfBuildV(slices.head, idx, Some(2))
    // fold per batch (deltaMaxFiles=1): each append lands one file per
    // touched list, accumulating the per-list debris compaction targets
    s.conf.set("graft.ivf.deltaMaxFiles", "1")
    try slices.tail.foreach(b => EmbedOps.ivfAppend(s, b, idx))
    finally s.conf.unset("graft.ivf.deltaMaxFiles")
    val done = EmbedOps.ivfCompact(s, idx, ifMoreThan = 2)
    assert(done.nonEmpty, "fixture did not trigger compaction")
    val f = fs(idx)
    val parked = new Path(s"$idx/compact.old/list_id=${done.head._1}")
    assert(f.exists(parked))
    val victim = s.read.parquet(s"$idx/assign.parquet").agg(min("vec_id")).head.getLong(0)
    import s.implicits._
    val (nDel, _) = EmbedOps.ivfDelete(s, idx, Seq(victim).toDF("vec_id"))
    assert(nDel == 1L)
    assert(f.exists(parked), "delete clobbered the parked compaction generation")
  }

  test("near-dup takedown crash between the renames: the bucket's survivors return " +
      "and neardupCheck still collapses against them") {
    val s = spark
    val idx = graft.TempDirs.scratch("neardup_crash").toString
    val corpus = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    DocText.neardupIndexBuild(corpus, idx)
    // two docs sharing a bucket: victim (the dead takedown's target) and
    // a surviving neighbour whose replica must STILL collapse after heal
    val ids = corpus.select("doc_id").orderBy("doc_id").limit(200)
      .collect().map(_.getLong(0))
    val victim = ids.head
    val b = victim % 64
    val neighbour = ids.tail.find(_ % 64 == b).get
    val f = fs(idx)
    Seq("bands.parquet", "shingles.parquet").foreach { t =>
      val live = s.read.parquet(s"$idx/$t/_db=$b")
      live.where(col("doc_id") =!= victim)
        .write.parquet(s"$idx/del.tmp/$t/_db=$b")
      f.mkdirs(new Path(s"$idx/del.old/$t"))
      assert(f.rename(new Path(s"$idx/$t/_db=$b"),
        new Path(s"$idx/del.old/$t/_db=$b")))
    }
    // the next crawl-batch check heals first, then reads the live layout
    val replicas = corpus
      .where(col("doc_id").isin(victim, neighbour))
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val pairs = DocText.neardupCheck(replicas, idx)
      .select("new_doc", "old_doc").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((neighbour + 1000000L, neighbour)),
      "bucket survivors lost: neighbour's replica no longer collapses")
    assert(!pairs.contains((victim + 1000000L, victim)),
      "the dead takedown's target resurrected into the live layout")
    assert(!f.exists(new Path(s"$idx/del.tmp")))
  }

  test("DataFrame-keyed takedown deletes exactly the relation's ids (VERDICT r11 ask)") {
    val s = spark
    val idx = graft.TempDirs.scratch("neardup_dfdel").toString
    val corpus = s.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    DocText.neardupIndexBuild(corpus, idx)
    // the deletion set as a relation — a retention query's output shape
    val dels = corpus.select("doc_id").where(pmod(col("doc_id"), lit(7)) === 3)
    val expected = dels.count()
    val removed = DocText.neardupIndexDelete(s, idx, dels)
    assert(removed == expected, s"removed $removed of $expected")
    val left = s.read.parquet(s"$idx/shingles.parquet")
      .join(dels, Seq("doc_id"), "left_semi").count()
    assert(left == 0L, "deleted ids linger in the shingle store")
    assert(s.read.parquet(s"$idx/shingles.parquet").count() ==
      corpus.count() - expected)
  }
}
