package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the unbounded form of `d_dedup_exact`, the
  * first gate of a continuously-ingesting training-data pipeline
  * (crawler output arrives as a stream; identical payloads must collapse
  * BEFORE they hit the expensive per-doc operators).
  *
  * Shape: content fingerprint (md5 of text — the same key batch dedup
  * groups on) + `dropDuplicatesWithinWatermark`. The watermark bounds
  * the dedup state to the fingerprints seen inside the horizon — one
  * small record per DISTINCT recent document, evicted as event time
  * advances — so state is bounded by ingest rate × horizon, never by
  * corpus size. A duplicate arriving after the horizon re-admits (and is
  * collapsed by the periodic batch dedup pass instead): the standard
  * at-scale split between streaming near-line dedup and batch full-corpus
  * dedup.
  *
  * At-least-once parity: redelivered batches inside the horizon collapse
  * to one row — the streaming analog of the reference's replica dedup at
  * merge time (service/coordinator.go:98-104).
  */
object DedupStream {

  final case class Doc(ts: java.sql.Timestamp, doc_id: Long, text: String)

  def plan(input: Dataset[Doc], watermark: String = "10 minutes"): DataFrame =
    input.toDF()
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
