package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-dup dedup — the ingest-path composition of
  * `DedupStream` (watermark-bounded exact dedup) with the batch MinHash
  * kernel (`d_lsh_pairs`): an arriving document is suppressed when any
  * of its LSH band keys was claimed by an earlier document inside the
  * watermark horizon. A crawler stream full of boilerplate variants
  * collapses near-line, BEFORE the expensive per-doc operators, with the
  * same banded-signature construction the batch pass uses — so what the
  * stream admits and the periodic batch `d_lsh_pairs`/`d_dup_clusters`
  * sweep would collapse agree on what "near-duplicate" means.
  *
  * State is SIGNATURES within the horizon, not documents: one small
  * record per distinct band key (the claiming doc_id), evicted by
  * event-time timeout as the watermark passes `ts + horizon`. Bounded by
  * ingest rate × horizon × NBANDS, never by corpus size. A near-dup
  * arriving after the horizon re-admits and falls to the batch sweep —
  * the same streaming/batch split `DedupStream` documents.
  *
  * Shape: explode each doc into its NBANDS band rows → `groupByKey(band
  * key)` → `flatMapGroupsWithState` marks each row dup/fresh (first
  * claimant in event-time order holds the key) → a doc is ADMITTED iff
  * every band came back fresh. A doc's band rows explode from one input
  * row, so they always land in the same micro-batch and the per-doc
  * reduction (`admitted`) is batch-local — run it inside `foreachBatch`
  * rather than as a second stateful operator.
  */
object NearDedupStream {

  final case class Doc(ts: java.sql.Timestamp, doc_id: Long, text: String)
  // public: Spark's generated (de)serializers cannot touch private classes
  final case class BandRow(bkey: String, ts: java.sql.Timestamp,
      doc_id: Long, text: String)
  final case class Flag(doc_id: Long, ts: java.sql.Timestamp, text: String,
      dup: Boolean)
  /** Holder of a band key: the first claiming doc inside the horizon. */
  final case class Claim(docId: Long)

  /** Per-band dup/fresh flags. `horizonMs` doubles as the watermark. */
  def bandFlags(input: Dataset[Doc], horizonMs: Long = 600000L): Dataset[Flag] = {
    val s = input.sparkSession
    import s.implicits._
    val banded = graft.queries.DocText.withBandKeys(input.toDF())
      .select(explode(col("bands")).as("bkey"),
        col("ts"), col("doc_id"), col("text"))
      .withWatermark("ts", s"$horizonMs milliseconds")
      .as[BandRow]
    banded.groupByKey(_.bkey)
      .flatMapGroupsWithState[Claim, Flag](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[Claim]) =>
          if (state.hasTimedOut) { // horizon passed: the key re-admits
            state.remove()
            Iterator.empty
          } else {
            // event-time order (doc_id tiebreak) decides the claimant —
            // deterministic across micro-batch boundaries falling anywhere
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var held = state.getOption
            // a (doc_id, ts, text) row repeated WITHIN this batch is a
            // pure at-least-once redelivery: emit only the first
            // occurrence's flag and drop the rest silently — flagging the
            // copy dup=true would merge into the same `admitted` group
            // (keyed on exactly that triple) and kill the doc entirely
            // (zero copies admitted). The full triple is the key (ADVICE
            // r11): a same-doc_id row with a DIFFERENT payload is a
            // distinct doc downstream and must still receive its dup
            // flag from the held claim. A CROSS-batch self-claim (held
            // from an earlier batch) still flags dup=true: that batch
            // already admitted the doc, so this one must not re-admit it.
            val seenDoc = scala.collection.mutable.HashSet.empty[(Long, Long, String)]
            val out = sorted.flatMap { r =>
              if (!seenDoc.add((r.doc_id, r.ts.getTime, r.text))) None
              else {
                val dup = held.isDefined
                if (held.isEmpty) held = Some(Claim(r.doc_id))
                Some(Flag(r.doc_id, r.ts, r.text, dup))
              }
            }
            held.foreach { h =>
              state.update(h)
              // evict when the watermark proves nothing inside the
              // horizon of the freshest sighting can still arrive
              state.setTimeoutTimestamp(
                math.max(sorted.map(_.ts.getTime).max + horizonMs,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  /** Batch-local per-doc reduction for `foreachBatch`: a doc survives
    * iff none of its bands was already claimed. */
  def admitted(flags: DataFrame): DataFrame =
    flags.groupBy("doc_id", "ts", "text")
      .agg(max(col("dup")).as("__any_dup"))
      .where(!col("__any_dup")).drop("__any_dup")
}
