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
  *
  * Usage: ServeLatency <sfDir> [rounds=3] [workDir]
  * Prints ONE JSON line; all raw latencies included so tails are
  * re-derivable (the r17 bench-artifact lesson: record runs, not only
  * the summary statistic).
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
    handle.close()

    // Locale.ROOT: decimal-comma locales would corrupt the JSON values
    def runsJson(xs: Seq[Double]) = xs.map(v =>
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v)))
      .mkString("[", ",", "]")
    println(s"""{"sf":"$sfDir","build_s":$buildS,"cold_s":$cold,""" +
      s""""p50_s":${pct(sorted, 0.50)},"p95_s":${pct(sorted, 0.95)},""" +
      s""""n":${warm.size},"runs":${runsJson(warm)},""" +
      s""""handle_open_s":$openS,"handle_cold_s":$hCold,""" +
      s""""handle_p50_s":${pct(hSorted, 0.50)},""" +
      s""""handle_p95_s":${pct(hSorted, 0.95)},""" +
      s""""handle_n":${hWarm.size},"handle_runs":${runsJson(hWarm)}}""")
    spark.stop()
  }
}
