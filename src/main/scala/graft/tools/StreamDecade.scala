package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.{IndexStream, NearDedupStream}

/** Streaming-path decade probe (VERDICT r11 "what's missing" #3): the
  * batch families all have measured ×100 decades; this records the same
  * evidence for the streaming operators — sustained throughput AND state
  * size under a real Structured Streaming replay, so two runs (sf0.1 vs
  * the ScaleUp ×10/×100 corpora) give the scaling ratio.
  *
  * Both replays use the FileStreamSource discipline of `CqBench`: the
  * corpus is re-chunked into time-contiguous parquet slices, drained one
  * per trigger, so each micro-batch is one ingest slice and event time
  * advances monotonically like live ingest. Ingest RATE is held constant
  * across scales (DOC_RATE docs per simulated second): a bigger corpus
  * replays as a LONGER stream, not a denser one, so NearDedupStream's
  * claim-state plateau must stay bounded by rate × horizon — corpus-size-
  * independent — which the recorded `max_state_rows` verifies, while
  * docs/s measures the sustained processing rate.
  *
  * IndexStream replays the corpus tail as appends against an index built
  * from the head: per-batch work is O(batch) against frozen centroids, so
  * vecs/s should hold flat as the at-rest index under it grows 10–100×.
  *
  * Usage: StreamDecade <sfDir> [chunks] [horizonMs]
  * Prints ONE JSON line with both families' numbers.
  */
object StreamDecade {

  private val DOC_RATE = 50L // docs per simulated second, all scales

  private def maxStateRows(q: StreamingQuery): Long =
    q.recentProgress.flatMap(p => p.stateOperators.map(_.numRowsTotal))
      .foldLeft(0L)(math.max)

  /** Chunked replay dir: `src` ordered by `ord`, written as `chunks`
    * sequential single-file slices (modification order == event order). */
  private def replayDir(src: DataFrame, ord: String, chunks: Int,
      work: String): (String, Long) = {
    val dir = s"$work/replay"
    val n = src.count()
    val per = math.max(1L, (n + chunks - 1) / chunks)
    // ntile-free deterministic slicing on the order key's rank: one
    // global sort per slice write is tool-scale work, not engine work
    val ranked = src.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col(ord))))
    ranked.persist()
    try {
      var i = 0L
      while (i * per < n) {
        ranked.where(col("__rn") > i * per && col("__rn") <= (i + 1) * per)
          .coalesce(1).write.mode("append").parquet(dir)
        i += 1
      }
    } finally ranked.unpersist()
    (dir, n)
  }

  private def bench(name: String)(run: => (Long, Long, Long)): String = {
    val t0 = System.nanoTime()
    val (rows, state, batches) = run
    val wall = (System.nanoTime() - t0) / 1e9
    // Locale.ROOT: the line is parsed JSON — see ADVICE r18 on f"%.Nf"
    val wallS = String.format(java.util.Locale.ROOT, "%.2f", Double.box(wall))
    val rps = String.format(java.util.Locale.ROOT, "%.0f",
      Double.box(rows / wall))
    s""""$name":{"rows":$rows,"wall_s":$wallS,"rows_per_s":$rps,"max_state_rows":$state,"batches":$batches}"""
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-streamdecade")
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val chunks = args.lift(1).map(_.toInt).getOrElse(32)
    val horizonMs = args.lift(2).map(_.toLong).getOrElse(600000L)
    import spark.implicits._

    def has(t: String): Boolean =
      new java.io.File(s"$sfDir/$t.parquet").exists()

    // ---- NearDedupStream: the whole documents corpus as one crawl feed
    val neardedup = if (!has("documents")) "\"neardedup\":null" else bench("neardedup") {
      val work = graft.TempDirs.scratch("sdec_doc").toString
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val (dir, n) = replayDir(docs, "doc_id", chunks, work)
      val admitted = new java.util.concurrent.atomic.AtomicLong
      val nBatches = new java.util.concurrent.atomic.AtomicLong
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, __rn INT")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        // constant-rate event time: rank/DOC_RATE simulated seconds
        .select(timestamp_millis(lit(1704067200000L) +
            col("__rn").cast("long") * (1000L / DOC_RATE)).as("ts"),
          col("doc_id"), col("text"))
        .as[NearDedupStream.Doc]
      val q = NearDedupStream.bandFlags(stream, horizonMs)
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .foreachBatch { (flags: org.apache.spark.sql.Dataset[NearDedupStream.Flag], _: Long) =>
          admitted.addAndGet(NearDedupStream.admitted(flags.toDF()).count())
          nBatches.incrementAndGet(); ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      require(admitted.get > 0, "neardedup replay admitted nothing")
      (n, maxStateRows(q), nBatches.get)
    }

    // ---- IndexStream: head 90% builds the at-rest index, tail 10%
    //      streams in as maintenance appends
    val indexstream = if (!has("embeddings")) "\"indexstream\":null" else bench("indexstream") {
      val work = graft.TempDirs.scratch("sdec_vec").toString
      val idx = s"$work/ivf"
      val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      graft.queries.EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)
      val fresh = v.where(col("vec_id") % 10 === 0)
      val (dir, n) = replayDir(fresh, "vec_id", math.max(4, chunks / 4), work)
      val appended = new java.util.concurrent.atomic.AtomicLong
      val nBatches = new java.util.concurrent.atomic.AtomicLong
      val stream = spark.readStream
        .schema("vec_id LONG, emb ARRAY<DOUBLE>, __rn INT")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("vec_id"), col("emb")).as[IndexStream.Vec]
      val q = IndexStream.start(stream, idx) { (_, stats) =>
        appended.addAndGet(stats.appended); nBatches.incrementAndGet(); ()
      }
      try q.processAllAvailable() finally q.stop()
      require(appended.get == n, s"appended ${appended.get} of $n")
      (n, 0L, nBatches.get)
    }

    // ---- IndexStream, composed (IVFPQ) half: same head/tail replay
    //      against a persisted composed index (codes delta landing)
    val ivfpqstream = if (!has("embeddings")) "\"ivfpqstream\":null" else bench("ivfpqstream") {
      val work = graft.TempDirs.scratch("sdec_cpq").toString
      val idx = s"$work/ivf"
      val cpq = s"$work/ivfpq"
      val v = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val head = v.where(col("vec_id") % 10 =!= 0)
      graft.queries.EmbedOps.ivfBuildV(head, idx, None)
      head.withColumnRenamed("emb", "embedding")
        .write.parquet(s"$work/src/embeddings.parquet")
      graft.queries.EmbedOps.ivfPqBuild(spark, s"$work/src", cpq)
      val fresh = v.where(col("vec_id") % 10 === 0)
      val (dir, n) = replayDir(fresh, "vec_id", math.max(4, chunks / 4), work)
      val nBatches = new java.util.concurrent.atomic.AtomicLong
      val stream = spark.readStream
        .schema("vec_id LONG, emb ARRAY<DOUBLE>, __rn INT")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("vec_id"), col("emb")).as[IndexStream.Vec]
      val q = IndexStream.start(stream, idx, ivfPqDir = Some(cpq)) { (_, _) =>
        nBatches.incrementAndGet(); ()
      }
      try q.processAllAvailable() finally q.stop()
      (n, 0L, nBatches.get)
    }

    // ---- IndexStream, TEXT half (VERDICT r16 #8): head 90% of the
    //      documents builds the at-rest BM25 postings index, tail 10%
    //      streams in as maintenance appends (delta landing + stats
    //      increments + amortized folds) — the full-ladder stream claim's
    //      text rung, measured like the vector rungs.
    val textstream = if (!has("documents")) "\"textstream\":null" else bench("textstream") {
      val work = graft.TempDirs.scratch("sdec_txt").toString
      val tdx = s"$work/bm25"
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      graft.queries.TextIndex.bm25Build(docs.where(col("doc_id") % 10 =!= 0), tdx)
      val fresh = docs.where(col("doc_id") % 10 === 0)
      val (dir, n) = replayDir(fresh, "doc_id", math.max(4, chunks / 4), work)
      val appended = new java.util.concurrent.atomic.AtomicLong
      val nBatches = new java.util.concurrent.atomic.AtomicLong
      val stream = spark.readStream
        .schema("doc_id LONG, text STRING, __rn INT")
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .select(col("doc_id"), col("text")).as[IndexStream.Doc]
      val q = IndexStream.startText(stream, tdx)
      try q.processAllAvailable() finally q.stop()
      // the committed batches' docs are all visible (delta ∪ folded) and
      // the stats artifact matched every increment along the way (a
      // mismatch errors the read path loudly)
      appended.set(spark.read.parquet(s"$tdx/doclen.parquet").count() -
        docs.where(col("doc_id") % 10 =!= 0).count())
      require(appended.get == n, s"appended ${appended.get} of $n")
      nBatches.set(q.recentProgress.length.toLong)
      (n, 0L, nBatches.get)
    }

    println(s"""{"dir":"$sfDir","horizon_ms":$horizonMs,$neardedup,$indexstream,$ivfpqstream,$textstream}""")
    spark.stop()
  }
}
