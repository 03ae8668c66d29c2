package graft.queries

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lifecycle of the persisted BM25 postings index (VERDICT r15 #1):
  * build/search parity with the in-gate scorer, append equivalence to a
  * one-shot build, idempotent takedown with exact corpus-stats
  * propagation, fold/compact content preservation, and the replay-safe
  * streaming append. The driver-facing hash gate is
  * `em_hybrid_rrf_persisted` (shares `hybridRrfOracleSql`); this spec
  * pins the maintenance semantics no single-shot oracle row can see. */
class TextIndexSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

  private def ranks(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def fused(df: DataFrame): Set[(Long, Long, Long, Int)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("indexed BM25 hybrid is byte-identical to the in-gate scorer") {
    val idx = graft.TempDirs.scratch("bm25_parity").toString
    TextIndex.bm25Build(docs, idx)
    assert(fused(EmbedOps.hybridRrfPersisted(spark, sfDir, idx)) ==
      fused(EmbedOps.hybridRrf(spark, sfDir)))
  }

  test("append lands in the delta tier and searches like a one-shot build") {
    val s = spark
    val idxApp = graft.TempDirs.scratch("bm25_app").toString
    val idxFull = graft.TempDirs.scratch("bm25_full").toString
    TextIndex.bm25Build(docs.where(col("doc_id") % 10 =!= 0), idxApp)
    val n = TextIndex.bm25Append(s, docs.where(col("doc_id") % 10 === 0), idxApp)
    assert(n == docs.where(col("doc_id") % 10 === 0).count())
    // the batch sits UNFOLDED in the delta tier — reads must still see it
    assert(new Path(s"$idxApp/postings.delta.parquet")
      .getFileSystem(s.sparkContext.hadoopConfiguration)
      .exists(new Path(s"$idxApp/postings.delta.parquet")))
    TextIndex.bm25Build(docs, idxFull)
    assert(fused(EmbedOps.hybridRrfPersisted(s, sfDir, idxApp)) ==
      fused(EmbedOps.hybridRrfPersisted(s, sfDir, idxFull)),
      "appended index diverges from the one-shot build")
    // folding changes the layout, never the content
    TextIndex.bm25FoldDelta(s, idxApp)
    assert(fused(EmbedOps.hybridRrfPersisted(s, sfDir, idxApp)) ==
      fused(EmbedOps.hybridRrfPersisted(s, sfDir, idxFull)))
  }

  test("takedown rewrites only affected buckets and matches a fresh build " +
      "on the filtered corpus") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("bm25_del").toString
    val idxRef = graft.TempDirs.scratch("bm25_delref").toString
    TextIndex.bm25Build(docs, idx)
    val victims = docs.select("doc_id").where(col("doc_id") % 7 === 3)
    val expected = victims.count()
    val removed = TextIndex.bm25Delete(s, idx, victims)
    assert(removed == expected, s"removed $removed of $expected")
    // no trace in either artifact
    assert(s.read.parquet(s"$idx/postings.parquet")
      .join(victims, Seq("doc_id"), "left_semi").count() == 0L)
    assert(s.read.parquet(s"$idx/doclen.parquet")
      .join(victims, Seq("doc_id"), "left_semi").count() == 0L)
    assert(s.read.parquet(s"$idx/doclen.parquet").count() ==
      docs.count() - expected)
    // full lifecycle parity: the post-delete index must rank exactly like
    // an index built from scratch on the surviving corpus (avgdl/df/N all
    // propagated exactly)
    TextIndex.bm25Build(docs.where(col("doc_id") % 7 =!= 3), idxRef)
    assert(ranks(TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20)) ==
      ranks(TextIndex.bm25RankIndexed(s, sfDir, idxRef, 10, 20)))
    // idempotent: the IndexStream scrub can re-run a takedown blindly
    assert(TextIndex.bm25Delete(s, idx, victims) == 0L)
    assert(ranks(TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20)) ==
      ranks(TextIndex.bm25RankIndexed(s, sfDir, idxRef, 10, 20)))
  }

  test("sustained appends fold at the file gate and compact collapses debris") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_compact").toString
    val idxFull = graft.TempDirs.scratch("bm25_cfull").toString
    val slices = (0 until 4).map(i => docs.where(pmod(col("doc_id"), lit(4)) === i))
    TextIndex.bm25Build(slices.head, idx)
    s.conf.set("graft.ivf.deltaMaxFiles", "1")
    try slices.tail.foreach(b => TextIndex.bm25Append(s, b, idx))
    finally s.conf.unset("graft.ivf.deltaMaxFiles")
    val done = TextIndex.bm25Compact(s, idx, ifMoreThan = 2)
    assert(done.nonEmpty, "fixture did not trigger compaction")
    assert(done.forall { case (_, before, after) => after < before })
    TextIndex.bm25Build(docs, idxFull)
    assert(fused(EmbedOps.hybridRrfPersisted(s, sfDir, idx)) ==
      fused(EmbedOps.hybridRrfPersisted(s, sfDir, idxFull)),
      "fold+compact changed the index content")
  }

  /** The at-rest corpus-stats scalars vs a fresh aggregate of doclen —
    * the recompute ≡ increment invariant (VERDICT r16 #2a). */
  private def statsPair(idx: String): (Long, Long) = {
    val r = spark.read.parquet(s"$idx/stats.parquet")
      .select("n_docs", "dl_sum").head
    (r.getLong(0), r.getLong(1))
  }
  private def recomputePair(idx: String): (Long, Long) = {
    val r = spark.read.parquet(s"$idx/doclen.parquet")
      .agg(count(lit(1)).cast("long"),
        coalesce(sum("dl"), lit(0L)).cast("long")).head
    (r.getLong(0), r.getLong(1))
  }

  test("corpus stats: increment ≡ recompute across build, append and delete") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_stats").toString
    TextIndex.bm25Build(docs.where(col("doc_id") % 10 =!= 0), idx)
    assert(statsPair(idx) == recomputePair(idx), "after build")
    // append INCREMENTS (O(batch)); the artifact must equal a recompute
    TextIndex.bm25Append(s, docs.where(col("doc_id") % 10 === 0), idx)
    assert(statsPair(idx) == recomputePair(idx), "after append")
    // delete RECOMPUTES from the survivors it just rewrote
    TextIndex.bm25Delete(s, idx, docs.select("doc_id").where(col("doc_id") % 7 === 3))
    assert(statsPair(idx) == recomputePair(idx), "after delete")
    // and a replayed delete converges (no double-decrement — the reason
    // stats are per-doc-derived, not increment rows)
    TextIndex.bm25Delete(s, idx, docs.select("doc_id").where(col("doc_id") % 7 === 3))
    assert(statsPair(idx) == recomputePair(idx), "after replayed delete")
  }

  test("a crashed stats window refuses reads loudly and heals on reconcile") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_dirty").toString
    TextIndex.bm25Build(docs.where(col("doc_id") % 10 =!= 0), idx)
    // simulate a maintainer dying between its doclen append and its
    // stats write: the batch's doclen rows land, the marker stays
    val f = new Path(idx).getFileSystem(s.sparkContext.hadoopConfiguration)
    f.create(new Path(s"$idx/stats.dirty"), true).close()
    docs.where(col("doc_id") % 10 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
      .coalesce(1).write.mode("append").parquet(s"$idx/doclen.parquet")
    val e = intercept[RuntimeException] {
      TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20).collect()
    }
    assert(e.getMessage.contains("stats.dirty"), e.getMessage)
    // the next maintenance entry recomputes from the (self-consistent)
    // doclen table and clears the marker
    TextIndex.reconcile(s, idx)
    assert(!f.exists(new Path(s"$idx/stats.dirty")))
    assert(statsPair(idx) == recomputePair(idx), "after heal")
    TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20).collect() // reads again
  }

  test("df tier: per-term rows equal a recompute from the partitioned " +
      "postings across fold and delete; crash window refuses and heals") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_df").toString
    def tierEqualsRecompute(): Unit = {
      val tier = s.read.parquet(s"$idx/df.parquet")
        .select(col("term"), col("df").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val rec = s.read.parquet(s"$idx/postings.parquet")
        .groupBy("term").agg(count(lit(1)).cast("long").as("df"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(tier == rec, "df tier diverged from postings recompute")
    }
    TextIndex.bm25Build(docs.where(col("doc_id") % 10 =!= 0), idx)
    tierEqualsRecompute()
    TextIndex.bm25Append(s, docs.where(col("doc_id") % 10 === 0), idx)
    TextIndex.bm25FoldDelta(s, idx) // fold re-derives the touched buckets
    tierEqualsRecompute()
    TextIndex.bm25Delete(s, idx, docs.select("doc_id").where(col("doc_id") % 7 === 3))
    tierEqualsRecompute()
    // crash window: marker present → reads refuse; reconcile re-derives
    val f = new Path(idx).getFileSystem(s.sparkContext.hadoopConfiguration)
    f.create(new Path(s"$idx/df.dirty"), true).close()
    val e = intercept[RuntimeException] {
      TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20).collect()
    }
    assert(e.getMessage.contains("df.dirty"), e.getMessage)
    TextIndex.reconcile(s, idx)
    assert(!f.exists(new Path(s"$idx/df.dirty")))
    tierEqualsRecompute()
    TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20).collect()
  }

  test("postings are term-clustered within every bucket file (build, fold " +
      "and compact preserve the clustering)") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_sorted").toString
    TextIndex.bm25Build(docs.where(col("doc_id") % 4 === 0), idx)
    s.conf.set("graft.ivf.deltaMaxFiles", "1") // force a fold per append
    try (1 to 3).foreach(i =>
      TextIndex.bm25Append(s, docs.where(col("doc_id") % 4 === i), idx))
    finally s.conf.unset("graft.ivf.deltaMaxFiles")
    TextIndex.bm25Compact(s, idx, ifMoreThan = 2)
    // every file individually sorted by term = each term's postings are
    // contiguous → parquet row-group min/max prune to the query vocabulary
    val unsorted = spark.read.parquet(s"$idx/postings.parquet")
      .select(input_file_name().as("f"), col("term"))
      .withColumn("prev", lag("term", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("f")
          .orderBy(monotonically_increasing_id())))
      .where(col("prev") > col("term"))
    assert(unsorted.isEmpty, "found a bucket file with out-of-order terms")
  }

  test("doclen file count stays bounded across sustained appends with " +
      "content identical and stats recompute ≡ increment (VERDICT r17 #2)") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_doclen").toString
    val slices = (0 until 8).map(i => docs.where(pmod(col("doc_id"), lit(8)) === i))
    TextIndex.bm25Build(slices.head, idx)
    // the fold gate: doclen folds when its debris crosses deltaMaxFiles,
    // exactly like the postings delta tier
    s.conf.set("graft.ivf.deltaMaxFiles", "3")
    try slices.tail.foreach(b => TextIndex.bm25Append(s, b, idx))
    finally s.conf.unset("graft.ivf.deltaMaxFiles")
    val f = new Path(idx).getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = EmbedOps.parquetFileCount(f, new Path(s"$idx/doclen.parquet"))
    assert(files <= 3, s"doclen debris unbounded: $files files after 7 appends " +
      "at deltaMaxFiles=3")
    // content identical to one row per document, stats invariant intact
    val lens = s.read.parquet(s"$idx/doclen.parquet")
    assert(lens.count() == docs.count())
    assert(lens.groupBy("doc_id").count().where(col("count") > 1).isEmpty)
    assert(statsPair(idx) == recomputePair(idx), "after folded appends")
    // an explicit compact folds leftover debris below its own threshold
    TextIndex.bm25Compact(s, idx, ifMoreThan = 0)
    assert(EmbedOps.parquetFileCount(f, new Path(s"$idx/doclen.parquet")) == 1)
    assert(s.read.parquet(s"$idx/doclen.parquet").count() == docs.count())
    assert(statsPair(idx) == recomputePair(idx), "after compact")
    // a completed fold must not park the displaced generation (ADVICE r18)
    assert(!f.exists(new Path(s"$idx/doclen.parquet.old")),
      "fold left doclen.parquet.old after a successful swap")
  }

  test("a crashed doclen fold heals on reconcile from either side of the swap") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_dlfold").toString
    TextIndex.bm25Build(docs, idx)
    val f = new Path(idx).getFileSystem(s.sparkContext.hadoopConfiguration)
    val live = new Path(s"$idx/doclen.parquet")
    val tmp = new Path(s"$idx/doclen.parquet.tmp")
    val n = docs.count()
    // crash BEFORE the live→old rename: tmp beside live → discard tmp
    s.read.parquet(live.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    TextIndex.reconcile(s, idx)
    assert(!f.exists(tmp) && f.exists(live))
    assert(s.read.parquet(live.toString).count() == n)
    // crash AFTER live moved away: tmp alone → finish the rename
    s.read.parquet(live.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    f.delete(live, true)
    TextIndex.reconcile(s, idx)
    assert(!f.exists(tmp) && f.exists(live))
    assert(s.read.parquet(live.toString).count() == n)
    assert(statsPair(idx) == recomputePair(idx), "after heals")
    // crash AFTER the swap completed but BEFORE the .old delete: the
    // displaced generation is debris beside a healthy live table —
    // reconcile sweeps it instead of parking a full table copy
    // (ADVICE r18)
    val old = new Path(s"$idx/doclen.parquet.old")
    s.read.parquet(live.toString).coalesce(1)
      .write.mode("overwrite").parquet(old.toString)
    TextIndex.reconcile(s, idx)
    assert(!f.exists(old), "reconcile left a stale doclen.parquet.old " +
      "beside a healthy live table")
    assert(s.read.parquet(live.toString).count() == n)
  }

  test("oversized query vocabularies fall back observably and return " +
      "identical results (VERDICT r17 wrong #3)") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_fallback").toString
    TextIndex.bm25Build(docs, idx)
    val withPush = ranks(TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20))
    val before = TextIndex.termPushdownFallbacks.get()
    s.conf.set("graft.text.termPushdownMax", "1") // force the fallback
    val withoutPush =
      try ranks(TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20))
      finally s.conf.unset("graft.text.termPushdownMax")
    assert(TextIndex.termPushdownFallbacks.get() == before + 1,
      "fallback did not increment the observable counter")
    assert(withoutPush == withPush,
      "dropping the term predicate changed results (it must only cost reads)")
    // and the counter does NOT move on the pushed-down path
    ranks(TextIndex.bm25RankIndexed(s, sfDir, idx, 10, 20))
    assert(TextIndex.termPushdownFallbacks.get() == before + 1)
  }

  test("streamed text batches are replay-idempotent (marker + scrub)") {
    val s = spark
    val idx = graft.TempDirs.scratch("bm25_replay").toString
    TextIndex.bm25Build(docs.where(col("doc_id") % 10 =!= 0), idx)
    val fresh = docs.where(col("doc_id") % 10 === 0)
    val b0 = fresh.where(col("doc_id") % 20 === 0)
    val b1 = fresh.where(col("doc_id") % 20 =!= 0)

    // committed replay: skipped outright
    assert(graft.streaming.IndexStream.appendBatchText(b0, 0L, idx).isDefined)
    assert(graft.streaming.IndexStream.appendBatchText(b0, 0L, idx).isEmpty)

    // crash between the append and the commit marker: pending marker
    // exists, the batch landed — the replay must scrub before re-running
    val f = new Path(idx).getFileSystem(s.sparkContext.hadoopConfiguration)
    val pending = new Path(s"$idx/_pending/1")
    f.mkdirs(pending.getParent)
    f.create(pending, true).close()
    TextIndex.bm25Append(s, b1, idx) // the crashed run's landed rows
    assert(graft.streaming.IndexStream.appendBatchText(b1, 1L, idx).isDefined)

    // no duplicate (doc_id, term) posting and no duplicate doclen row
    TextIndex.bm25FoldDelta(s, idx)
    val dupPost = s.read.parquet(s"$idx/postings.parquet")
      .groupBy("doc_id", "term").count().where(col("count") > 1).count()
    assert(dupPost == 0L, s"$dupPost duplicate postings after replay")
    val dupLen = s.read.parquet(s"$idx/doclen.parquet")
      .groupBy("doc_id").count().where(col("count") > 1).count()
    assert(dupLen == 0L, s"$dupLen duplicate doclen rows after replay")
    assert(s.read.parquet(s"$idx/doclen.parquet").count() == docs.count())
  }
}
