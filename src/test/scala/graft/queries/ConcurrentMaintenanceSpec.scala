package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Concurrent readers beside the single maintainer (VERDICT r17 #5).
  *
  * The r15 design claim is "N concurrent readers are safe beside one
  * maintainer": destructive swap reconciliation only runs from
  * maintenance entries, reads refuse loudly inside crash/maintenance
  * windows (dirty markers, swap debris) — so a read that RETURNS must
  * be a consistent content state, never a silent mix. No spec actually
  * drove readers concurrently with append/fold/delete/compact until
  * this one: reader threads hammer one index dir while the maintainer
  * loops the full lifecycle, and every completed read must equal one of
  * the quiesced content states (the batch is constructed so the set of
  * legal answers is exact); every failed read must carry one of the
  * loud by-design failure classes. Anything else — a wrong answer, or
  * an unexpected failure class — fails the spec.
  *
  * Loud-by-design failure classes (all raised before or during a scan
  * of a layout whose maintainer is mid-swap):
  *   - dirty-marker refusals (`stats.dirty`, `df.dirty`)
  *   - swap-debris refusals (`unfinished … swap`, `committed-but-
  *     unfinished delta`, `mid generation-cutover`)
  *   - file-level races on a swapped-away generation (FileNotFound /
  *     "does not exist"): the reader snapshotted the old file list and
  *     the maintainer's rename won — fail-loud, Spark's
  *     `ignoreMissingFiles` stays false so a missing file can never
  *     silently shrink a result
  */
class ConcurrentMaintenanceSpec extends SparkSpec {

  /** Messages that mean "refused / failed loudly by design". */
  private def loudByDesign(t: Throwable): Boolean = {
    val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => e.getClass.getName + ": " + String.valueOf(e.getMessage))
      .mkString(" | ").toLowerCase
    Seq("stats.dirty", "df.dirty", "unfinished", "unreconciled",
      "mid generation-cutover", "filenotfound", "does not exist",
      "no postings content", "path does not exist")
      .exists(msgs.contains)
  }

  /** Drive `readers` threads through `read` while `maintain` runs once
    * on the calling thread; returns (successful results, failures). */
  private def storm[R](readers: Int)(read: () => R)(maintain: => Unit)
      : (Seq[R], Seq[Throwable]) = {
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val oks = new java.util.concurrent.ConcurrentLinkedQueue[R]()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to readers).map { i =>
      val t = new Thread(() => {
        while (!stop.get()) {
          try { val r = read(); oks.add(r); () }
          catch { case e: Throwable => errs.add(e); () }
          Thread.sleep(20)
        }
      }, s"graft-stress-reader-$i")
      t.setDaemon(true); t
    }
    threads.foreach(_.start())
    try maintain finally stop.set(true)
    threads.foreach(_.join(180000))
    (oks.asScala.toSeq, errs.asScala.toSeq)
  }

  private def docs: DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

  test("text index: concurrent searches beside a sustained append/fold/" +
      "compact/delete loop are correct or refuse loudly — never silently " +
      "wrong") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("bm25_storm").toString
    val idxWith = graft.TempDirs.scratch("bm25_storm_w").toString
    // the churn batch: novel-vocabulary docs (never match a query term),
    // so the only legal read results are the two quiesced content states
    // — base, and base+batch (corpus stats shift scores between them)
    val batch = (0 until 40).map(i =>
      (5000L + i, (0 until 30).map(j => s"zq${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    TextIndex.bm25Build(docs, idx)
    TextIndex.bm25Build(docs.unionByName(batch), idxWith)
    def ranks(d: String): Set[(Long, Long, Int)] =
      TextIndex.bm25RankIndexed(s, sfDir, d, 10, 20).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val base = ranks(idx)
    val withBatch = ranks(idxWith)
    val legal = Set(base, withBatch)

    val (oks, errs) = storm(3)(() => ranks(idx)) {
      (1 to graft.TestScale.stormRounds(4)).foreach { _ =>
        TextIndex.bm25Append(s, batch, idx)
        TextIndex.bm25FoldDelta(s, idx)
        TextIndex.bm25Compact(s, idx, ifMoreThan = 2)
        TextIndex.bm25Delete(s, idx, batch.select("doc_id"))
      }
    }
    assert(oks.nonEmpty, "no read ever completed — the storm is vacuous")
    val wrong = oks.filterNot(legal.contains)
    assert(wrong.isEmpty,
      s"${wrong.size} of ${oks.size} concurrent reads returned a result " +
        "matching NEITHER quiesced content state (silent inconsistency)")
    val unexpected = errs.filterNot(loudByDesign)
    assert(unexpected.isEmpty,
      s"${unexpected.size} of ${errs.size} failures were not a loud " +
        s"by-design class: ${unexpected.take(3).map(_.toString).mkString("; ")}")
    // quiesced end state: the loop ends on delete → base content exactly
    assert(ranks(idx) == base, "post-storm content diverged from base")
  }

  test("near-dup index: concurrent checks beside an append/takedown loop " +
      "return the exact planted pairs or refuse loudly — never silently " +
      "missing pairs (VERDICT r18 #2)") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("neardup_storm").toString
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val old = all.where(col("doc_id") < 1000000L)
    // probe = exact replicas of a corpus slice (jaccard 1.0 against their
    // originals — the NearDupIndexSpec fixture): a deterministic nonempty
    // base answer at every sf
    val probe = old.where(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    DocText.neardupIndexBuild(old, idx)
    // churn batch with a fully NOVEL vocabulary: disjoint shingle sets →
    // true jaccard vs every probe doc is 0, so whatever subset of the
    // batch is visible mid-append/mid-delete, the verify step keeps the
    // result pinned to exactly the planted base pairs. The batch's ids
    // spread across ~40 of the 64 buckets, so every takedown cycle
    // rewrites buckets that also hold planted old docs — the window a
    // silently-missing-pair bug would need.
    val churn = (0 until 40).map(i =>
      (7000000L + i, (0 until 30).map(j => s"zznd${i}tok$j").mkString(" ")))
      .toDF("doc_id", "text")
    def pairs(): Set[(Long, Long, Double)] =
      DocText.neardupCheckPlan(probe, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val base = pairs()
    assert(base.nonEmpty, "fixture: no planted near-dup pairs — vacuous")

    val (oks, errs) = storm(3)(() => pairs()) {
      (1 to graft.TestScale.stormRounds(4)).foreach { _ =>
        DocText.neardupIndexAppend(churn, idx)
        DocText.neardupIndexDelete(s, idx, churn.select("doc_id"))
      }
    }
    assert(oks.nonEmpty, "no read ever completed — the storm is vacuous")
    val wrong = oks.filterNot(_ == base)
    assert(wrong.isEmpty,
      s"${wrong.size} of ${oks.size} concurrent near-dup checks diverged " +
        "from the planted base pairs (silently missing or phantom pairs)")
    val unexpected = errs.filterNot(loudByDesign)
    assert(unexpected.isEmpty,
      s"${unexpected.size} of ${errs.size} failures were not a loud " +
        s"by-design class: ${unexpected.take(3).map(_.toString).mkString("; ")}")
    assert(pairs() == base, "post-storm content diverged from base")
  }

  test("resident RagHandle: concurrent serving beside a text-index " +
      "maintenance loop returns the frozen snapshot exactly or fails " +
      "loudly — never a silent mix (r19 serving story)") {
    val s = spark
    import s.implicits._
    val vecIdx = graft.TempDirs.scratch("rag_storm_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_storm_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      def serve(qid: Long): Set[(Long, Long, Long, Long, Int)] =
        h.query(qid).collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getInt(4))).toSet
      val base = (0L until 10L).map(q => q -> serve(q)).toMap
      assert(base.values.forall(_.nonEmpty))
      // churn batch: NOVEL vocabulary (its terms never enter any query's
      // pruned postings scan) and ids far outside the packed chunk-id
      // space (so the takedown can never anti-join a real chunk away).
      // The handle's text stats/df are FROZEN at open, so whatever
      // subset of the batch is at rest, every completed query has
      // exactly one legal answer: the open-time snapshot.
      val churn = (0 until 30).map(i =>
        (500000000000L + i, (0 until 24).map(j => s"zzrag${i}w$j").mkString(" ")))
        .toDF("doc_id", "text")
      val (oks, errs) = storm(3)(() => {
        val q = scala.util.Random.nextInt(10).toLong
        (q, serve(q))
      }) {
        (1 to graft.TestScale.stormRounds(3)).foreach { _ =>
          TextIndex.bm25Append(s, churn, txtIdx)
          TextIndex.bm25FoldDelta(s, txtIdx)
          TextIndex.bm25Compact(s, txtIdx, ifMoreThan = 2)
          TextIndex.bm25Delete(s, txtIdx, churn.select("doc_id"))
        }
      }
      assert(oks.nonEmpty, "no query ever completed — the storm is vacuous")
      val wrong = oks.filterNot { case (q, r) => r == base(q) }
      assert(wrong.isEmpty,
        s"${wrong.size} of ${oks.size} concurrent serves diverged from " +
          "the handle's frozen snapshot (silent mix of generations)")
      val unexpected = errs.filterNot(loudByDesign)
      assert(unexpected.isEmpty,
        s"${unexpected.size} of ${errs.size} failures were not a loud " +
          s"by-design class: ${unexpected.take(3).map(_.toString).mkString("; ")}")
      // quiesced end state: the loop ends on delete → snapshot holds
      (0L until 10L).foreach(q => assert(serve(q) == base(q),
        s"post-storm serve diverged for qid $q"))
    } finally h.close()
  }

  test("resident RagHandle: OVERLAPPING-vocabulary maintenance mixes " +
      "generations, but ENUMERABLY (ADVICE r19): every completed serve " +
      "beside the append/takedown loop equals the frozen snapshot or the " +
      "precomputed completed-append mix — never a third, partially " +
      "visible state — and the mix itself is observed and documented") {
    val s = spark
    import s.implicits._
    val vecIdx = graft.TempDirs.scratch("rag_ovl_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_ovl_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      def serve(qid: Long): Set[(Long, Long, Long, Long, Int)] =
        h.query(qid).collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getInt(4))).toSet
      val base = (0L until 10L).map(q => q -> serve(q)).toMap
      // twins: one per query doc, each the doc's own leading 64-token
      // window — MAXIMALLY overlapping vocabulary, the exact window the
      // novel-vocab storm above deliberately avoids (ADVICE r19). Text
      // side only; ids sit outside the packed chunk-id space and land in
      // unused doc slots (777001+) after the dedup tail's % RAG_DOCBASE.
      val twins = s.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id") < 10)
        .select((col("doc_id") + 600000777001L).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 64), " ").as("text"))
      // the mix, precomputed DETERMINISTICALLY: a completed overlapping
      // append's live postings scored against the handle's frozen
      // stats/df — neither the snapshot nor the reopened state. Content
      // placement (delta vs folded) never changes scores, so this one
      // answer covers every post-commit tier state the storm can see.
      TextIndex.bm25Append(s, twins, txtIdx)
      val mixed = (0L until 10L).map(q => q -> serve(q)).toMap
      val moved = (0L until 10L).filter(q => mixed(q) != base(q))
      assert(moved.nonEmpty,
        "fixture: no query's stale serve moved after a completed " +
          "overlapping-vocab append — the mix window is vacuous here")
      info(s"observed generation mix on qids $moved (frozen stats x live " +
        "postings) — detectable via isCurrent, refusable via requireCurrent")
      assert(!h.isCurrent,
        "a committed overlapping append must flip the staleness probe")
      // takedown restores the snapshot exactly (postings physically
      // removed; the handle's frozen stats equal the open-time values)
      assert(TextIndex.bm25Delete(s, txtIdx, twins.select("doc_id")) == 10L)
      (0L until 10L).foreach(q => assert(serve(q) == base(q),
        s"takedown did not restore the snapshot for qid $q"))
      // the storm: readers hammer the stale-tolerant handle while the
      // maintainer cycles the overlapping batch in and out — the legal
      // completed-answer set has exactly TWO members per qid (appends
      // land as one atomic delta file; the multi-bucket delete window is
      // fenced end to end by the postings.del read guard)
      val (oks, errs) = storm(3)(() => {
        val q = scala.util.Random.nextInt(10).toLong
        (q, serve(q))
      }) {
        (1 to graft.TestScale.stormRounds(3)).foreach { _ =>
          TextIndex.bm25Append(s, twins, txtIdx)
          TextIndex.bm25Delete(s, txtIdx, twins.select("doc_id"))
        }
      }
      assert(oks.nonEmpty, "no serve ever completed — the storm is vacuous")
      val wrong = oks.filterNot { case (q, r) => r == base(q) || r == mixed(q) }
      assert(wrong.isEmpty,
        s"${wrong.size} of ${oks.size} serves matched NEITHER the frozen " +
          "snapshot NOR the completed-append mix — a third, partially " +
          s"visible state: ${wrong.take(2).mkString("; ")}")
      val nMixed = oks.count { case (q, r) => r == mixed(q) && r != base(q) }
      info(s"storm: ${oks.size} completed (mix state served $nMixed " +
        s"times), ${errs.size} loud refusals")
      val unexpected = errs.filterNot(loudByDesign)
      assert(unexpected.isEmpty,
        s"${unexpected.size} of ${errs.size} failures were not a loud " +
          s"by-design class: ${unexpected.take(3).map(_.toString).mkString("; ")}")
      // quiesced end: the loop ends on delete → snapshot holds
      (0L until 10L).foreach(q => assert(serve(q) == base(q),
        s"post-storm serve diverged for qid $q"))
    } finally h.close()
  }

  test("vector index: concurrent kNN beside the IVF lifecycle loop always " +
      "returns the exact base TOPK or refuses loudly") {
    val s = spark
    val idx = graft.TempDirs.scratch("ivf_storm").toString
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    EmbedOps.ivfBuildV(v, idx, None)
    // the churn batch is constructed ORTHOGONAL to every query vector
    // (deterministic residuals of fixed seed patterns against the query
    // span): cosine to every query is ~0, far below any base TOPK sim —
    // so whatever subset of the batch is visible mid-append/delete,
    // every successful read has exactly one legal answer, the base
    // result. (A negated-query batch is NOT enough: IVF's TOPK comes
    // from the probed lists only, whose 5th-best sim dips to ~0.2 here.)
    val s2 = spark
    import s2.implicits._
    val qs = v.where(col("vec_id") < 10).orderBy("vec_id").collect()
      .map(_.getSeq[Double](1).toArray)
    val dims = qs.head.length
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); i += 1 }; d
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / math.sqrt(dot(a, a) * dot(b, b))
    // orthonormal basis of the query span (Gram–Schmidt)
    val qBasis = qs.foldLeft(Vector.empty[Array[Double]]) { (acc, q0) =>
      val r = q0.clone()
      acc.foreach { b => val p = dot(r, b); (0 until dims).foreach(i => r(i) -= p * b(i)) }
      val n = math.sqrt(dot(r, r))
      if (n > 1e-9) acc :+ r.map(_ / n) else acc
    }
    val farArr = (0 until 10).map { k =>
      val r = Array.tabulate(dims)(j => (((k * 31 + j * 17 + 5) % 13) - 6).toDouble)
      qBasis.foreach { b => val p = dot(r, b); (0 until dims).foreach(i => r(i) -= p * b(i)) }
      (5000000L + k, r.toSeq)
    }
    val far = farArr.toDF("vec_id", "emb")
    def knn(): Set[(Long, Long, Long, Int)] =
      EmbedOps.ivfKnnIndexed(s, sfDir, idx).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val base = knn()
    // fixture precondition (not a claim about the engine): the far batch
    // must be strictly un-rankable for every query, or the single-legal-
    // answer assertion below would be meaningless
    locally {
      val maxFar = (for (q <- qs; f <- farArr) yield cos(q, f._2.toArray)).max
      val minBase = base.map(_._3).min / 1e6
      assert(maxFar < minBase,
        f"fixture degenerated: max query↔far cosine $maxFar%.4f is not " +
          f"below the weakest base TOPK sim $minBase%.4f — regenerated " +
          "testdata needs a new far-batch construction")
    }

    val (oks, errs) = storm(3)(() => knn()) {
      (1 to graft.TestScale.stormRounds(4)).foreach { _ =>
        EmbedOps.ivfAppend(s, far, idx)
        EmbedOps.ivfFoldDelta(s, idx)
        EmbedOps.ivfCompact(s, idx, ifMoreThan = 2)
        EmbedOps.ivfDelete(s, idx, far.select("vec_id"))
      }
    }
    assert(oks.nonEmpty, "no read ever completed — the storm is vacuous")
    val wrong = oks.filterNot(_ == base)
    assert(wrong.isEmpty,
      s"${wrong.size} of ${oks.size} concurrent kNN reads diverged from " +
        "the base TOPK (the far batch must never be rankable)")
    val unexpected = errs.filterNot(loudByDesign)
    assert(unexpected.isEmpty,
      s"${unexpected.size} of ${errs.size} failures were not a loud " +
        s"by-design class: ${unexpected.take(3).map(_.toString).mkString("; ")}")
    assert(knn() == base, "post-storm content diverged from base")
  }
}
