package graft.tools

/** Single-query serving-latency probe for the at-rest RAG stack
  * (VERDICT r17 #6): every retrieval gate batches NQUERIES queries,
  * which amortizes costs a deployment's per-request path doesn't get to
  * amortize — one probe assignment, one postings scan, one fusion per
  * REQUEST. This tool builds `em_rag_persisted`'s two artifacts once
  * (the composed IVFPQ index + the BM25 postings index over the chunk
  * corpus), then measures ONE-query latency through
  * `EmbedOps.ragPersistedQ`:
  *
  *   - `cold_s`: the first single query after the artifacts land — file
  *     listing, footer reads, codegen, broadcast warm-up all unamortized
  *     (a deployment pays this once per executor restart, not per query)
  *   - `p50_s` / `p95_s`: over `rounds` passes of all 10 query docs in
  *     rotation on the warm session (the steady-state per-request-reload
  *     number)
  *   - `handle_*`: the same rotation through a RESIDENT `RagHandle`
  *     (VERDICT r18 #1) — artifacts resolved once at `handle_open_s`,
  *     each request plans only the pruned scans. The open cost amortizes
  *     across a deployment's request stream; `handle_p50_s` is the
  *     steady-state serving floor this repo actually ships.
  *   - `throughput`: QPS + p50/p95 per thread width (VERDICT r19 #6) —
  *     1/4/8/16 request threads drive ONE handle for a fixed wall
  *     window each (round-robin qids per thread), the capacity-plan
  *     matrix the storm's correctness pinning doesn't measure. The
  *     saturation knee is where QPS stops scaling with width (requests
  *     contend for the same local[N] cores — on a cluster, for the
  *     same executor slots).
  *
  * Usage: ServeLatency <sfDir> [rounds=3] [workDir] [tputWindowSec=20]
  * Prints ONE JSON line; all raw latencies included so tails are
  * re-derivable (the r17 bench-artifact lesson: record runs, not only
  * the summary statistic). tputWindowSec=0 skips the throughput matrix.
  */
object ServeLatency {

  private def pct(sorted: Seq[Double], p: Double): Double =
    sorted(math.min(sorted.size - 1, math.ceil(p * sorted.size).toInt - 1))

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    // rounds=0 would index sorted(-1) in pct — a usage error, not an
    // IndexOutOfBoundsException (ADVICE r18)
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val work = args.lift(2).getOrElse(
      graft.TempDirs.scratch("graft_serve").toString)
    val (vecDir, textDir) = (s"$work/rag_vec", s"$work/rag_txt")
    val spark = graft.Sessions.build("graft-serve-latency")

    val tb0 = System.nanoTime()
    graft.queries.EmbedOps.ragBuildPersisted(spark, sfDir, vecDir, textDir)
    val buildS = (System.nanoTime() - tb0) / 1e9

    def one(qid: Long): Double = {
      val t0 = System.nanoTime()
      graft.queries.EmbedOps.ragPersistedQ(spark, sfDir, vecDir, textDir, qid)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = one(0L)
    val warm = (1 to rounds).flatMap(_ => (0L until 10L).map(one))
    val sorted = warm.sorted

    // the RESIDENT serving path (VERDICT r18 #1): open the handle once
    // (quantizers, probes, LUTs, stats, vocabulary, df, persisted
    // corpus), then serve the same query rotation from it — the number a
    // deployment that holds the artifacts resident actually sees
    val to0 = System.nanoTime()
    val handle = graft.queries.EmbedOps.ragOpen(spark, sfDir, vecDir, textDir)
    val openS = (System.nanoTime() - to0) / 1e9
    def oneH(qid: Long): Double = {
      val t0 = System.nanoTime()
      handle.query(qid).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val hCold = oneH(0L)
    val hWarm = (1 to rounds).flatMap(_ => (0L until 10L).map(oneH))
    val hSorted = hWarm.sorted
    // burst serving (VERDICT r19 #8): all 10 query docs in ONE batched
    // pass — the amortization a request burst gets over the per-qid loop
    // (whose cost is the 10-request slice of the rotation above)
    def oneBatch(): Double = {
      val t0 = System.nanoTime()
      handle.query((0L until 10L).toSeq)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    oneBatch() // warm-up
    val hBatch = Seq.fill(rounds)(oneBatch()).sorted

    // throughput matrix (VERDICT r19 #6): N threads, one handle, fixed
    // wall window per width — QPS and per-request latency percentiles.
    // Threads round-robin disjoint qid starts so the request mix matches
    // the latency rotation above.
    val tputWindowSec = args.lift(3).map(_.toInt).getOrElse(20)
    val widths = Seq(1, 4, 8, 16)
    val tput: Seq[(Int, Int, Double, Double, Double)] =
      if (tputWindowSec <= 0) Nil
      else widths.map { w =>
        val lats = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
        val stopAt = System.nanoTime() + tputWindowSec * 1000000000L
        val pool = java.util.concurrent.Executors.newFixedThreadPool(w)
        val done = new java.util.concurrent.CountDownLatch(w)
        (0 until w).foreach { t =>
          pool.execute(() => {
            try {
              var i = t
              while (System.nanoTime() < stopAt) {
                lats.add(oneH((i % 10).toLong))
                i += w
              }
            } finally done.countDown()
          })
        }
        done.await()
        pool.shutdown()
        import scala.jdk.CollectionConverters._
        val xs = lats.asScala.toSeq.sorted
        val qps = xs.size / tputWindowSec.toDouble
        (w, xs.size, qps,
          if (xs.nonEmpty) pct(xs, 0.50) else -1.0,
          if (xs.nonEmpty) pct(xs, 0.95) else -1.0)
      }
    handle.close()

    // Locale.ROOT: decimal-comma locales would corrupt the JSON values
    def fmtd(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def runsJson(xs: Seq[Double]) = xs.map(fmtd).mkString("[", ",", "]")
    val tputJson = tput.map { case (w, n, qps, p50, p95) =>
      s"""{"threads":$w,"n":$n,"qps":${fmtd(qps)},""" +
        s""""p50_s":${fmtd(p50)},"p95_s":${fmtd(p95)}}"""
    }.mkString("[", ",", "]")
    println(s"""{"sf":"$sfDir","build_s":$buildS,"cold_s":$cold,""" +
      s""""p50_s":${pct(sorted, 0.50)},"p95_s":${pct(sorted, 0.95)},""" +
      s""""n":${warm.size},"runs":${runsJson(warm)},""" +
      s""""handle_open_s":$openS,"handle_cold_s":$hCold,""" +
      s""""handle_p50_s":${pct(hSorted, 0.50)},""" +
      s""""handle_p95_s":${pct(hSorted, 0.95)},""" +
      s""""handle_n":${hWarm.size},"handle_runs":${runsJson(hWarm)},""" +
      s""""handle_batch10_p50_s":${pct(hBatch, 0.50)},""" +
      s""""handle_batch10_runs":${runsJson(hBatch)},""" +
      s""""tput_window_s":$tputWindowSec,"throughput":$tputJson}""")
    spark.stop()
  }
}
