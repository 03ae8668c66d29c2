package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.{EmbedOps, IvfAppendStats, TextIndex}

/** Streaming ANN-index maintenance — the ingest-path composition of
  * Structured Streaming with the incremental IVF append: a stream of
  * embedding vectors keeps a persisted index current without ever
  * retraining in-line. Each micro-batch runs `EmbedOps.ivfAppend`: a
  * map-only assignment of ONLY the batch's rows against the frozen
  * centroids (broadcast as a literal), appended into the
  * `partitionBy(list_id)` layout — O(batch) work and O(batch) new
  * files, the same cost shape as the measurement store's ingest.
  *
  * `foreachBatch` is at-least-once: on failure/restart the last
  * micro-batch REPLAYS, and a blind `mode("append")` would duplicate
  * its vectors in the persisted index. The sink therefore carries the
  * same committed-batch high-water discipline the measurement store's
  * CQ target uses (`patchIntoTarget`, SURVEY §2.11), keyed on the
  * `batchId` that `foreachBatch` supplies for exactly this purpose:
  *   - `_commits/<batchId>` marker present → the batch fully landed in
  *     a previous run; the replay is skipped outright.
  *   - `_pending/<batchId>` present without its commit → a crash hit
  *     between the parquet append and the commit marker; the batch's
  *     vec_ids are scrubbed (`ivfDelete` — partition-pruned to the
  *     affected lists, a no-op when nothing was appended) before the
  *     append re-runs. The scrub path only executes after an actual
  *     mid-batch crash; the normal path costs two empty marker files.
  * Net: appends are replay-idempotent — no duplicate vec_id can
  * survive, whatever point the previous run died at. That includes a
  * crash INSIDE a previous scrub: the delete's own tmp+rename swap is
  * not atomic, so `ivfDelete`/`pqDelete` first run
  * `EmbedOps.reconcileSwaps`, which finishes (or rolls back) any
  * interrupted per-list swap from the on-disk state before the scrub
  * reads the live layout (ADVICE r11).
  *
  * Retraining stays OUT of the stream: each batch's drift stats
  * (mean assignment distance vs the build-time baseline) surface
  * through `onBatch`, so the operator of a standing ingest schedules a
  * rebuild — the expensive O(corpus) operation — on drift evidence,
  * from maintenance, exactly like `Engine.maintain` owns compaction.
  * Sustained appends' per-list file debris is `EmbedOps.ivfCompact`'s
  * job, also maintenance-side.
  *
  * This is `foreachBatch`, not a stateful operator: the index IS the
  * state, at rest, shared with every batch/search consumer — streaming
  * state stores hold per-key state inside one query, the wrong home for
  * a corpus-sized artifact other jobs read. */
object IndexStream {

  final case class Vec(vec_id: Long, emb: Seq[Double])

  private def fs(s: SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  /** Run `append` under the committed-batch marker discipline rooted at
    * `dir`: skip if `batchId` is committed, `scrub` first if a pending
    * marker shows a crash landed a partial append, and only mark
    * committed after `append` returns. */
  private def guarded[T](s: SparkSession, dir: String, batchId: Long)(
      scrub: => Unit)(append: => T): Option[T] = {
    val (f, _) = fs(s, dir)
    val commit = new org.apache.hadoop.fs.Path(s"$dir/_commits/$batchId")
    val pending = new org.apache.hadoop.fs.Path(s"$dir/_pending/$batchId")
    if (f.exists(commit)) return None
    if (f.exists(pending)) scrub
    f.mkdirs(pending.getParent)
    f.create(pending, true).close()
    val out = append
    f.mkdirs(commit.getParent)
    f.create(commit, true).close()
    f.delete(pending, false)
    Some(out)
  }

  /** Idempotent per-batch IVF append (the `foreachBatch` body, factored
    * out so the replay contract is directly testable): returns `None`
    * when `batchId` is already committed (replayed batch skipped),
    * otherwise the append stats. Safe to call again with the same
    * (batch, batchId) after a crash at ANY point — a partial append is
    * scrubbed by vec_id before re-running (partition-pruned to the
    * affected lists; a clean crash-before-append scrubs nothing). */
  def appendBatch(batch: DataFrame, batchId: Long, indexDir: String,
      driftRatio: Double = 2.0): Option[IvfAppendStats] =
    guarded(batch.sparkSession, indexDir, batchId) {
      EmbedOps.ivfDelete(batch.sparkSession, indexDir, batch.select("vec_id"))
    } {
      EmbedOps.ivfAppend(batch.sparkSession, batch, indexDir, driftRatio)
    }

  /** Idempotent per-batch PQ-codes append — same discipline, own marker
    * namespace under `pqDir` (a crash between the IVF commit and the PQ
    * append replays ONLY the PQ half). Returns vectors encoded, None on
    * a committed replay. */
  def appendBatchPq(batch: DataFrame, batchId: Long, pqDir: String): Option[Long] =
    guarded(batch.sparkSession, pqDir, batchId) {
      EmbedOps.pqDelete(batch.sparkSession, pqDir, batch.select("vec_id"))
    } {
      EmbedOps.pqAppend(batch.sparkSession, batch, pqDir)
    }

  /** Idempotent per-batch append for the COMPOSED (IVFPQ) index — same
    * discipline, own marker namespace under `ivfPqDir`. The scrub is
    * `ivfPqDelete`, which folds the codes delta first, so a crash that
    * landed a partial batch in the delta tier is purged before the
    * re-append whichever tier it reached. Returns vectors encoded. */
  def appendBatchIvfPq(batch: DataFrame, batchId: Long,
      ivfPqDir: String): Option[Long] =
    guarded(batch.sparkSession, ivfPqDir, batchId) {
      EmbedOps.ivfPqDelete(batch.sparkSession, ivfPqDir, batch.select("vec_id"))
    } {
      EmbedOps.ivfPqAppend(batch.sparkSession, batch, ivfPqDir)
    }

  /** Idempotent per-batch append for the training-free rungs (SQ8 /
    * BQ) — same discipline, own marker namespaces. Their encodes are
    * per-vector self-contained, so the appended table is byte-
    * equivalent to encode-all; the scrub is the flat tmp+swap delete. */
  def appendBatchSq8(batch: DataFrame, batchId: Long, sq8Dir: String): Option[Long] =
    guarded(batch.sparkSession, sq8Dir, batchId) {
      EmbedOps.sq8Delete(batch.sparkSession, sq8Dir, batch.select("vec_id"))
    } {
      EmbedOps.sq8Append(batch.sparkSession, batch, sq8Dir)
    }

  def appendBatchBq(batch: DataFrame, batchId: Long, bqDir: String): Option[Long] =
    guarded(batch.sparkSession, bqDir, batchId) {
      EmbedOps.bqDelete(batch.sparkSession, bqDir, batch.select("vec_id"))
    } {
      EmbedOps.bqAppend(batch.sparkSession, batch, bqDir)
    }

  /** Idempotent per-batch BM25 postings append — the TEXT rung of the
    * ladder (VERDICT r15 #1): a (doc_id, text) stream keeps the
    * persisted postings index current exactly like the vector rungs.
    * Same marker discipline, own namespace under `textDir`; the scrub is
    * `bm25Delete`, itself idempotent (the per-doc doclen table makes a
    * retried delete converge — see TextIndex's layout note), so a crash
    * at ANY point inside a previous scrub-or-append replays safely. */
  def appendBatchText(batch: DataFrame, batchId: Long,
      textDir: String): Option[Long] =
    guarded(batch.sparkSession, textDir, batchId) {
      TextIndex.bm25Delete(batch.sparkSession, textDir, batch.select("doc_id"))
    } {
      TextIndex.bm25Append(batch.sparkSession, batch, textDir)
    }

  final case class Doc(doc_id: Long, text: String)

  /** Start maintaining the TEXT index from a document stream — the text
    * half of the deployment the vector `start` maintains (documents and
    * embeddings share an id space; a production pipeline feeds both
    * streams the same ingest batches). Same single-writer contract per
    * index dir as `start`. */
  def startText(input: Dataset[Doc], textDir: String): StreamingQuery =
    input.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Doc], batchId: Long) =>
        appendBatchText(batch.toDF(), batchId, textDir)
        ()
      }
      .start()

  /** Start appending `input` to the index at `indexDir` (must already be
    * built — the stream maintains, never trains). The commit-marker
    * namespace ties the index to ONE maintaining stream lineage (the
    * single-writer contract): `batchId` is monotone only within a
    * checkpoint, so starting a NEW stream (fresh checkpoint) against an
    * index a previous stream maintained requires clearing
    * `_commits`/`_pending` first. `onBatch` receives
    * (batchId, stats) after each committed batch — replayed
    * already-committed batches are skipped and do NOT re-fire it; use it
    * to alert on `retrainAdvised`. */
  def start(input: Dataset[Vec], indexDir: String, driftRatio: Double = 2.0,
      pqDir: Option[String] = None, ivfPqDir: Option[String] = None,
      sq8Dir: Option[String] = None, bqDir: Option[String] = None)
      (onBatch: (Long, IvfAppendStats) => Unit = (_, _) => ()): StreamingQuery =
    input.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Vec], batchId: Long) =>
        val df = batch.toDF()
        appendBatch(df, batchId, indexDir, driftRatio)
          .foreach(stats => onBatch(batchId, stats))
        // a deployment feeds BOTH indexes the same batches (BENCH_NOTES
        // r10): the compressed codes table rides the same stream, its
        // own marker namespace keeping each half independently replayable
        pqDir.foreach(appendBatchPq(df, batchId, _))
        // the composed index rides the same way — each maintained index
        // is an independent replayable half with its own markers
        ivfPqDir.foreach(appendBatchIvfPq(df, batchId, _))
        // the training-free rungs ride too: one stream can keep the
        // entire compression ladder current
        sq8Dir.foreach(appendBatchSq8(df, batchId, _))
        bqDir.foreach(appendBatchBq(df, batchId, _))
      }
      .start()
}
