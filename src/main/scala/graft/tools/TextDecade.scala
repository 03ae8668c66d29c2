package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** TextIndex decade probe (VERDICT r16 #1 done-criterion): the O(query)
  * claim is "per-query READ BYTES sublinear in corpus size" — buckets
  * push as PartitionFilters, the query vocabulary prunes row groups
  * inside probed buckets, corpus constants come from the two-scalar
  * stats artifact, df from the per-term tier. Two runs of this tool
  * (sf0.1 vs a ScaleUp ×10/×100 corpus) give the ratio directly.
  *
  * Measures a FIXED query set (the nq query docs, identical text at
  * every scale by ScaleUp's replica-0 preservation) against an index
  * built from the full corpus: wall seconds AND task-metric input bytes
  * for the search alone (build excluded), median of 3 after a warm-up.
  *
  * Usage: TextDecade <sfDir> [nq] [workDir]
  * Prints ONE JSON line {n_docs, index_bytes, search_s, search_bytes_read}.
  */
object TextDecade {

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val nq = args.lift(1).map(_.toInt).getOrElse(10)
    val work = args.lift(2).getOrElse(
      graft.TempDirs.scratch("graft_text_decade").toString)
    val idx = s"$work/bm25"
    val spark = graft.Sessions.build("graft-text-decade")

    val corpus = graft.Tables(spark, sfDir, "documents")
    val nDocs = corpus.count()
    graft.queries.TextIndex.bm25Build(
      corpus.select("doc_id", "text"), idx)
    val idxBytes = {
      val p = new org.apache.hadoop.fs.Path(idx)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.getContentSummary(p).getLength
    }

    // input-bytes accounting: task metrics summed across exactly the
    // jobs of one search run (listener events are async — wait for the
    // queue to drain before reading the counter)
    val bytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytes.addAndGet(m.inputMetrics.bytesRead)
        ()
      }
    })
    // the listener bus is async and private — drain by polling the
    // counter to a fixpoint (tool-scale synchronization, not engine code).
    // One quiet 200ms interval proved too short a window when the bus
    // stalls under load (ADVICE r17): require 5 consecutive stable reads
    // (1s of stability) before declaring the queue empty, so a previous
    // run's late events can't leak past bytes.set(0) into the next run.
    def drained(): Long = {
      var stable = 0; var prev = bytes.get()
      while (stable < 5) {
        Thread.sleep(200)
        val cur = bytes.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      prev
    }
    def once(): (Double, Long) = {
      spark.catalog.clearCache()
      drained(); bytes.set(0L)
      val t0 = System.nanoTime()
      graft.queries.TextIndex.bm25RankIndexed(spark, sfDir, idx, nq, 10)
        .write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, drained())
    }
    once() // warm-up, discarded
    val runs = Seq.fill(3)(once())
    // medians taken independently per dimension (ADVICE r17): the
    // median-by-time run can carry an outlier byte count and vice versa
    val medS = runs.map(_._1).sorted.apply(1)
    val medB = runs.map(_._2).sorted.apply(1)
    val allRuns = runs.map { case (s, b) => s"""[$s,$b]""" }.mkString("[", ",", "]")
    println(s"""{"n_docs":$nDocs,"index_bytes":$idxBytes,""" +
      s""""search_s":$medS,"search_bytes_read":$medB,"runs":$allRuns}""")
    spark.stop()
  }
}
