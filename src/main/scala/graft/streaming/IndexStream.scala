package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.{EmbedOps, IvfAppendStats}

/** Streaming ANN-index maintenance — the ingest-path composition of
  * Structured Streaming with the incremental IVF append: a stream of
  * embedding vectors keeps a persisted index current without ever
  * retraining in-line. Each micro-batch runs `EmbedOps.ivfAppend`: a
  * map-only assignment of ONLY the batch's rows against the frozen
  * centroids (broadcast as a literal), appended into the
  * `partitionBy(list_id)` layout — O(batch) work and O(batch) new
  * files, the same cost shape as the measurement store's ingest.
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

  /** Start appending `input` to the index at `indexDir` (must already be
    * built — the stream maintains, never trains). `onBatch` receives
    * (batchId, stats) after each commit; use it to alert on
    * `retrainAdvised`. */
  def start(input: Dataset[Vec], indexDir: String, driftRatio: Double = 2.0)
      (onBatch: (Long, IvfAppendStats) => Unit = (_, _) => ()): StreamingQuery =
    input.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Vec], batchId: Long) =>
        val stats = EmbedOps.ivfAppend(
          batch.sparkSession, batch.toDF(), indexDir, driftRatio)
        onBatch(batchId, stats)
      }
      .start()
}
