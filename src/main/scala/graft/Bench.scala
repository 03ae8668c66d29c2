package graft

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR, forcing full plan evaluation through the `noop`
  * sink (df.count() would let Catalyst prune the projections and
  * under-report). Prints ONE JSON line for the driver.
  *
  * Methodology: one un-timed warm-up per query (JIT, codegen-cache, file
  * listing, shuffle-service spin-up), then median of 3 timed runs — a
  * single cold run per query swung ±4× round-over-round on identical
  * code, hiding real regressions behind noise. The cache is cleared
  * before every timed run so queries that persist() an intermediate
  * index pay its build cost in every measurement (warm-JIT, cold-cache
  * — the reproducible point on the warm/cold spectrum).
  */
object Bench {
  // timed runs per gate after the warm-up. Overridable for oversized
  // local sweeps (a full sf10 pass at median-of-3 is ~95 min wall;
  // RUNS=1 trades per-gate noise robustness for a recordable sweep) —
  // the driver's default path stays median-of-3.
  private val Runs =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Host-drift canaries (VERDICT r18 #3): gates dominated by fixed
    * per-query cost from families that haven't changed in many rounds.
    * Cross-window ratios on this box carry ±1.3× ambient drift that hits
    * these gates as uniformly as the graded surface (BENCH_NOTES r18),
    * so the cross-round median ratio OVER THE CANARIES estimates the
    * drift and `tools/ratio.py` divides it out of same-sf comparisons —
    * the r18 window adjudication, made mechanical.
    *
    * CLASSED since r20 (VERDICT r19 #5): the original set was all tiny
    * scan/catalog/scalar gates, and the r19 windows showed a uniform
    * ~1.2–1.4× corrected drift on the (untouched) join-shaped relational
    * family the scan canaries under-spanned. The `join` class adds
    * mid-weight shuffle/join gates untouched since their landing rounds,
    * so a join-only environment shift separates from a scan-only one in
    * `ratio.py`'s per-class report. */
  private val CanaryClasses: Seq[(String, Seq[String])] = Seq(
    "scan" -> Seq(
      "iql_show_tag_keys", "iql_show_measurements", "iql_show_field_keys",
      "iql_show_tag_values", "iql_raw", "iql_regex_field",
      "iql_scalar_chain", "iql_div_zero", "iql_minmax_spread", "em_norms"),
    "join" -> Seq(
      "r_semi_join", "r_region_revenue", "r_topk_per_group"),
    // r20 (the em_mmr_ivfpq adjudication): the r19 drift on that gate
    // tracked em_ivfpq_adc inside the SAME invocation during the A/B
    // (both 2-3x in one contaminated window, both recovered together) —
    // a vector-family shift the scan/join classes don't span. These
    // three are mid-weight embedding gates untouched since their
    // landing rounds (brute kNN join, centroid agg, bucket-stats agg).
    "vector" -> Seq(
      "em_knn_brute", "em_centroids", "em_bucket_stats"))
  private val Canaries = CanaryClasses.flatMap(_._2)

  private def fmt4(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

  def main(args: Array[String]): Unit = {
    // fail at startup, not as 220 silently-failed -1.0 gates (ADVICE r18)
    require(Runs >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1 (got $Runs)")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // optional subset (comma-separated names) for scale checks on oversized
    // local corpora; a filtered run skips the write bench and does NOT
    // overwrite BENCH_SELF.json (the driver's full-sweep artifact)
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // contamination flag (VERDICT r18 #4): leftover index/scratch dirs
    // crowd /tmp's directory metadata and read as a fake 2–3× regression
    // on the FS-heavy lifecycle gates (BENCH_NOTES r18) — record the
    // count at sweep start so a polluted window is visible in the
    // artifact instead of re-diagnosed from symptoms. Counted BEFORE the
    // session builds: the session's own spark-/blockmgr- scratch dirs
    // would otherwise inflate the flag (ADVICE r19).
    val tmpDirsAtStart = {
      val prefixes = Seq("graft_", "bm25_", "ivf", "rag", "pq_", "sq8_",
        "bq_", "opq_", "neardup", "hyb_", "sdec_", "scaleup_", "handoff_",
        "codes_", "mmr_", "takedown_", "spark-", "blockmgr-")
      val t = new java.io.File(System.getProperty("java.io.tmpdir"))
      Option(t.list()).map(_.count(n => prefixes.exists(n.startsWith)))
        .getOrElse(0)
    }
    val spark = Sessions.build("graft-bench")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      def once(): Double = {
        spark.catalog.clearCache() // cold-cache per run; also reaps per-query persist()s
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val (runs, phases) =
        try {
          once() // warm-up, discarded
          Phases.drain()
          // per-run phase splits from instrumented gates (VERDICT r18
          // #5): median per phase across the timed runs, like the total
          val rp = Seq.fill(Runs) { val t = once(); (t, Phases.drain()) }
          val keys = rp.flatMap(_._2.keys).distinct
          (rp.map(_._1),
            keys.map(k => k -> median(rp.map(_._2.getOrElse(k, 0.0)))).toMap)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            TempDirs.keepForForensics() // keep the failed gate's scratch dirs
            Phases.drain()
            (Seq.empty[Double], Map.empty[String, Double])
        }
      (name, if (runs.isEmpty) -1.0 else median(runs), runs, phases)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // all raw runs per gate, recorded alongside the median (VERDICT r17
    // #1): a co-tenant-noise run shows up as spread inside the artifact
    // itself, so round-over-round comparison never needs a side re-run
    // to adjudicate whether a movement is code or box contention
    val qruns = results.map { case (k, _, rs, _) =>
      // Locale.ROOT: a decimal-comma default locale would emit [1,2345]
      // — still parseable JSON, silently wrong values (ADVICE r18)
      "\"" + k + "\":" + rs.map(fmt4).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // build-vs-operate splits for the instrumented lifecycle gates
    val qphases = results.collect { case (k, _, _, ph) if ph.nonEmpty =>
      "\"" + k + "\":" + ph.toSeq.sortBy(_._1)
        .map { case (p, v) => "\"" + p + "\":" + fmt4(v) }
        .mkString("{", ",", "}")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // explicit run/fail counts + partial flag: a 56-of-166 crash round must
    // not read as a full-surface total (ADVICE r8 on BENCH_SELF.json)
    val nRun = results.count(_._2 >= 0)
    val nFailed = results.size - nRun
    // write-path throughput — the reference's ONLY benchmark is a write
    // benchmark (service/write_test.go:38-57 BenchmarkRouting, 100-point
    // payloads through the routing layer, no recorded q/s). Same shape
    // here: synthesize line-protocol batches, push them through the FULL
    // ingest path (parse → type → register (+ parquet append when
    // durable)), report points/sec. Median of 3 after a warm-up batch.
    def writeBench(durable: Boolean): Double = {
      val points = 100000
      val batch = (0 until points).map(i =>
        s"wbench,host=h${i % 32} v=${i % 997},u=${i}i ${1000000000L + i.toLong * 1000}")
      def once(): Double = {
        val dir = if (durable)
          Some(graft.TempDirs.scratch("graft_wbench").toString)
        else None
        val e = new Engine(spark, sfDir, dir)
        val t0 = System.nanoTime()
        val (ok, bad) = e.writeLineProtocol(batch, "wbench")
        require(ok == points && bad == 0, s"write bench: ok=$ok bad=$bad")
        points / ((System.nanoTime() - t0) / 1e9)
      }
      try { once(); median(Seq.fill(Runs)(once())) }
      catch { case e: Throwable =>
        System.err.println(s"[bench] write($durable) failed: ${e.getMessage}"); -1.0 }
    }
    val wps = if (only.isDefined) -1.0 else writeBench(durable = false)
    val wpsDurable = if (only.isDefined) -1.0 else writeBench(durable = true)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""n_run":$nRun,"n_failed":$nFailed,"partial":${nFailed > 0 || only.isDefined},""" +
      s""""write_pps":$wps,"write_pps_durable":$wpsDurable,"sf":"$sfDir"}"""
    println(line)
    // self-recorded artifact: the driver's captured stdout tail can truncate
    // the per-query map (it did in round 4) — the full line survives on disk.
    // The on-disk copy additionally carries the raw per-gate runs, the
    // canary gate list + tmp contamination flag, and the per-phase splits
    // (the stdout line stays schema-stable for the driver's parser).
    val canariesJson = Canaries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val classesJson = CanaryClasses.map { case (cls, gs) =>
      "\"" + cls + "\":" + gs.map("\"" + _ + "\"").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val cpus = Sessions.cpus
    val selfLine = line.dropRight(1) +
      s""","query_runs":$qruns,"canaries":$canariesJson""" +
      s""","canary_classes":$classesJson""" +
      s""","tmp_dirs_at_start":$tmpDirsAtStart,"cpus":$cpus""" +
      s""","query_phases":$qphases}"""
    if (only.isEmpty) {
      def put(name: String): Unit =
        java.nio.file.Files.write(java.nio.file.Paths.get(name),
          (selfLine + "\n").getBytes("UTF-8"))
      // per-core-count artifact (VERDICT r20 #2): the driver runs the
      // bench TWICE per round (full cores, then a lower-core scaling
      // run) and the second run used to clobber the single BENCH_SELF —
      // the full-core per-query map was lost every round. One file per
      // core count keeps both; the legacy name stays as a copy of the
      // full-core run (written only when this invocation uses at least
      // half the machine, so a scaling run can never overwrite it).
      put(s"BENCH_SELF_c$cpus.json")
      if (cpus.toInt * 2 >= Runtime.getRuntime.availableProcessors)
        put("BENCH_SELF.json")
    }
    // second, SHORT stdout line (VERDICT r20 #2): the full line above is
    // ~9 KB at 220 gates and the driver's ~2 KB stdout-tail capture
    // truncates it (BENCH_r19/r20 both parsed null). This summary fits
    // any tail; distinct "metric" so a parser scanning for the full
    // line's schema never mistakes it for the per-query map.
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec",""" +
      s""""n_run":$nRun,"n_failed":$nFailed,"partial":${nFailed > 0 || only.isDefined},""" +
      s""""write_pps":$wps,"write_pps_durable":$wpsDurable,"cpus":$cpus,""" +
      s""""tmp_dirs_at_start":$tmpDirsAtStart,"self_artifact":"BENCH_SELF_c$cpus.json",""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
