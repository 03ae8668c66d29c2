package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resident RAG serving handle (VERDICT r18 #1): `EmbedOps.ragOpen`
  * resolves the frozen quantizers, probes, LUTs, stats, vocabulary and
  * df ONCE; `query(qid)` must then be byte-identical to the per-request
  * reload path `ragPersistedQ` for EVERY query doc — the parity that
  * lets a deployment hold the artifacts resident without changing a
  * single result. */
class RagHandleSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getInt(4))).toSet

  test("handle.query is byte-identical to ragPersistedQ for every qid, " +
      "including zero-result columns and schema") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_vec").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_txt").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      (0L until 10L).foreach { qid =>
        val warm = h.query(qid)
        val cold = EmbedOps.ragPersistedQ(s, sfDir, vecIdx, txtIdx, qid)
        assert(warm.columns.toSeq == cold.columns.toSeq,
          s"qid $qid: column drift between handle and per-request path")
        val (w, c) = (rows(warm), rows(cold))
        assert(w == c, s"qid $qid: handle serving diverges from " +
          s"ragPersistedQ (handle-only: ${w -- c}, reload-only: ${c -- w})")
        assert(w.nonEmpty, s"qid $qid returned no passages")
      }
    } finally h.close()
  }

  test("handle refuses out-of-range qids loudly (same contract as " +
      "ragPersistedQ — no silent text-only fusion)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_oor_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_oor_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      intercept[IllegalArgumentException](h.query(10L))
      intercept[IllegalArgumentException](h.query(-1L))
      intercept[IllegalArgumentException](
        EmbedOps.ragPersistedQ(s, sfDir, vecIdx, txtIdx, 10L))
    } finally h.close()
  }

  test("concurrent queries through one handle return the same results " +
      "as sequential ones (the serving shape: N threads, one handle)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_conc_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_conc_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      val expected = (0L until 10L).map(q => q -> rows(h.query(q))).toMap
      import java.util.concurrent.{Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(4)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      try {
        (0 until 40).foreach { i =>
          pool.execute(() => {
            val qid = (i % 10).toLong
            try {
              if (rows(h.query(qid)) != expected(qid))
                failures.add(s"qid $qid diverged on thread ${Thread.currentThread.getName}")
            } catch {
              case e: Throwable => failures.add(s"qid $qid threw: ${e.getMessage}")
            }
          })
        }
        pool.shutdown()
        assert(pool.awaitTermination(300, TimeUnit.SECONDS), "pool timed out")
      } finally { pool.shutdownNow(); () }
      assert(failures.isEmpty, s"concurrent serving failures: " +
        failures.toArray.take(3).mkString("; "))
    } finally h.close()
  }

  test("generation stamp (VERDICT r19 #3 / ADVICE r19): content-mutating " +
      "maintenance flips isCurrent (folds/compactions don't), " +
      "requireCurrent refuses a stale serve loudly, reopen serves the " +
      "new content, and the takedown round-trips back to the base") {
    // isolated session: the requireCurrent conf must not leak into
    // parallel suites sharing the singleton
    val s = spark.newSession()
    graft.Sessions.registerFunctions(s)
    import s.implicits._
    val vecIdx = graft.TempDirs.scratch("rag_gen_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_gen_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      assert(h.isCurrent, "a freshly opened handle must be current")
      val base0 = rows(h.query(0L))
      // content-neutral maintenance: the handle stays current
      graft.queries.TextIndex.bm25FoldDelta(s, txtIdx)
      graft.queries.TextIndex.bm25Compact(s, txtIdx, ifMoreThan = 2)
      assert(h.isCurrent,
        "folds/compactions are content-neutral and must not flip the stamp")
      // OVERLAPPING-vocabulary append — the ADVICE r19 window: a twin of
      // query doc 0 enters BOTH live halves while the handle's stats/df/
      // probes stay frozen at open. The stamp makes it detectable. The
      // twin is doc 0's leading 64-token window + doc 0's embedding (the
      // IndexStreamSpec clone discipline: distance 0 → vector rank 1 →
      // deterministically retrievable after reopen; text-only twins can
      // legitimately rank below high-tf docs on this corpus).
      val twin = s.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id") === 0)
        .select(lit(777L).as("doc_id"),
          array_join(slice(split(col("text"), " "), 1, 64), " ").as("text"))
      val twinVec = s.read.parquet(s"$sfDir/embeddings.parquet")
        .where(col("vec_id") === 0)
        .select(lit(777L).as("vec_id"),
          col("embedding").cast("array<double>").as("emb"))
      EmbedOps.ivfPqAppend(s, twinVec, vecIdx)
      assert(!h.isCurrent,
        "a committed vector append must flip isCurrent")
      graft.queries.TextIndex.bm25Append(s, twin, txtIdx)
      // opt-in fence: the stale serve refuses loudly instead of mixing
      // live postings with frozen stats
      s.conf.set("graft.serve.requireCurrent", "true")
      val e = intercept[RuntimeException](h.query(0L))
      assert(e.getMessage.contains("stale"),
        s"expected the staleness refusal, got: ${e.getMessage}")
      s.conf.set("graft.serve.requireCurrent", "false")
      // reopen re-resolves: current again, and the twin (identical text →
      // top BM25 score for query 0) is retrievable through the new handle
      val h2 = h.reopen()
      assert(h2.isCurrent, "a reopened handle must be current")
      val with777 = rows(h2.query(0L))
      assert(with777.exists(_._2 == 777L),
        s"reopened handle does not retrieve the appended twin doc: $with777")
      // takedown on both halves flips again; a reopen after it restores
      // the base exactly
      graft.queries.TextIndex.bm25Delete(s, txtIdx, Seq(777L).toDF("doc_id"))
      EmbedOps.ivfPqDelete(s, vecIdx, Seq(777L).toDF("vec_id"))
      assert(!h2.isCurrent, "a committed takedown must flip isCurrent")
      val h3 = h2.reopen()
      assert(rows(h3.query(0L)) == base0,
        "takedown + reopen did not restore the open-time base results")
    } finally h.close()
  }

  test("queryFiltered and queryMmr are byte-identical to their " +
      "per-request at-rest paths for every qid (VERDICT r19 #2 — the " +
      "retrieval matrix served resident)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_mx_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_mx_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    // a metadata keep-set over the packed chunk ids (every 3rd chunk) —
    // the em_*_filtered family's shape, derived once like a deployment's
    // filter table
    val keep = s.read.parquet(s"$vecIdx/codes.parquet")
      .select(col("vec_id").cast("long").as("vec_id")).distinct()
      .where(pmod(col("vec_id"), lit(3L)) === 0)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      def fRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
      def mRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getLong(3))).toSet
      var anyF = false; var anyM = false
      (0L until 10L).foreach { qid =>
        val wf = fRows(h.queryFiltered(qid, keep))
        val cf = fRows(EmbedOps.ivfPqFilteredAtRest(s, vecIdx, keep, Seq(qid)))
        assert(wf == cf, s"qid $qid: filtered serving diverges " +
          s"(handle-only: ${wf -- cf}, reload-only: ${cf -- wf})")
        anyF ||= wf.nonEmpty
        val wm = mRows(h.queryMmr(qid))
        val cm = mRows(EmbedOps.mmrAtRest(s, vecIdx, Seq(qid)))
        assert(wm == cm, s"qid $qid: MMR serving diverges " +
          s"(handle-only: ${wm -- cm}, reload-only: ${cm -- wm})")
        anyM ||= wm.nonEmpty
      }
      assert(anyF && anyM, "the matrix parity is vacuous — no results")
    } finally h.close()
  }

  test("batched query(qids) is byte-identical to the per-qid loop " +
      "(VERDICT r19 #8 — burst serving amortizes the plan, never the " +
      "semantics)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_batch_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_batch_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      Seq(Seq(3L), Seq(0L, 5L, 9L), (0L until 10L).toSeq).foreach { qids =>
        val batched = rows(h.query(qids))
        val looped = qids.map(q => rows(h.query(q))).reduce(_ ++ _)
        assert(batched == looped,
          s"batch $qids diverged (batch-only: ${batched -- looped}, " +
            s"loop-only: ${looped -- batched})")
        assert(batched.nonEmpty)
      }
      intercept[IllegalArgumentException](h.query(Seq.empty[Long]))
      intercept[IllegalArgumentException](h.query(Seq(0L, 10L)))
    } finally h.close()
  }

  test("the serve plan is fully pruned, single AND batched: no raw-corpus " +
      "scan in the request path, PartitionFilters on the sidecar and " +
      "postings scans (the scaladoc's 'every read in the request path is " +
      "pruned', pinned in the plan)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // AQE off so FileSourceScanExec nodes are inspectable pre-reoptimize
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    graft.Sessions.registerFunctions(s)
    val vecIdx = graft.TempDirs.scratch("rag_plan_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_plan_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      Seq("single" -> h.query(0L), "batched" -> h.query(Seq(0L, 3L, 7L)))
        .foreach { case (shape, df) =>
          val scans = graft.tools.PlanLint.nodes(df.queryExecution.executedPlan)
            .collect { case f: FileSourceScanExec => f }
          def over(tier: String) = scans.filter(
            _.relation.location.rootPaths.exists(_.toString.contains(tier)))
          // the request path reads INDEX artifacts only — the corpus
          // tables are for builds and query-doc resolution at open
          val corpus = over("documents.parquet") ++ over("embeddings.parquet")
          assert(corpus.isEmpty,
            s"$shape serve plan scans the raw corpus: " +
              corpus.map(_.simpleStringWithNodeId()).mkString("; "))
          // both partitioned tiers in the returned plan must prune (the
          // codes tier runs eagerly inside query() and is bucket-pruned
          // by construction — codesLiveRows' isin on the partition col)
          Seq("emb.parquet", "postings.parquet").foreach { tier =>
            val t = over(tier)
            assert(t.nonEmpty, s"no $tier scan in the $shape serve plan")
            t.foreach(f => assert(f.partitionFilters.nonEmpty,
              s"$shape serve's $tier scan carries NO PartitionFilters: " +
                f.simpleStringWithNodeId()))
          }
        }
    } finally h.close()
  }

  test("handle results are stable across repeated queries (resident " +
      "artifacts are read-only, no per-request state)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_rep_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_rep_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      val first = rows(h.query(3L))
      (1 to 3).foreach { i =>
        assert(rows(h.query(3L)) == first, s"repeat $i drifted")
      }
    } finally h.close()
  }
}
