package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous queries — the reference's standing windowed aggregations
  * (`SELECT mean(v) INTO m2 FROM m GROUP BY time(1h)`; replicated verbatim
  * at `/root/reference/syncing/importer.go:323-333`) re-expressed as
  * Structured Streaming jobs (SURVEY §2.11):
  *
  *   readStream → dropDuplicatesWithinWatermark (at-least-once redelivery
  *   dedup = the reference's merge-time replica dedup,
  *   `service/coordinator.go:98-104`) → window agg → writeStream.
  *
  * Watermark choice is the late-data policy: the reference accepts any
  * late point (full recompute on query), so parity favors a generous
  * watermark + update mode — documented divergence, SURVEY §7.3.
  *
  * Scale notes: state is keyed by (window, tags) — bounded by watermark
  * eviction; sink is an append/update table per CQ. No driver-side state.
  */
object ContinuousQuery {

  final case class CQ(
      name: String,
      sourceMeasurement: String,
      field: String,
      agg: String,              // mean | sum | count | min | max
      windowDur: String,        // e.g. "1 hour"
      tags: Seq[String],
      watermark: String = "1 hour")

  /** Build the streaming DataFrame for a CQ over an input stream with
    * columns (ts TIMESTAMP, tags..., field, event_id optional). */
  def plan(input: DataFrame, cq: CQ): DataFrame = {
    val aggCol = cq.agg match {
      case "mean"  => avg(col(cq.field))
      case "sum"   => sum(col(cq.field))
      case "count" => count(col(cq.field))
      case "min"   => min(col(cq.field))
      case "max"   => max(col(cq.field))
      case a       => throw new IllegalArgumentException(s"unsupported CQ aggregate $a")
    }
    val dedupKeys = "ts" +: cq.tags
    input
      .withWatermark("ts", cq.watermark)
      .dropDuplicatesWithinWatermark(dedupKeys)
      .groupBy(window(col("ts"), cq.windowDur).as("w") +: cq.tags.map(col): _*)
      .agg(aggCol.as(cq.agg))
      .select(col("w.start").as("time") +: cq.tags.map(col) :+ col(cq.agg): _*)
  }

  /** Start a CQ writing to an in-memory sink table named after the CQ
    * (tests / interactive); production sinks swap format for parquet/Delta
    * with a checkpoint dir — the hinted-handoff/recovery analog is the
    * checkpoint + WAL (SURVEY §2.11). */
  def start(spark: SparkSession, input: DataFrame, cq: CQ,
      outputMode: String = "update", trigger: Option[Trigger] = None): StreamingQuery = {
    val w = plan(input, cq).writeStream
      .queryName(cq.name)
      .outputMode(outputMode)
      .format("memory")
    trigger.foreach(w.trigger) // default micro-batch trigger keeps the CQ standing
    w.start()
  }

  /** Batch backfill of the same CQ definition (reference semantics: CQs
    * recompute over history when created) — identical plan, batch source. */
  def backfill(input: DataFrame, cq: CQ): DataFrame = {
    val aggCol = cq.agg match {
      case "mean"  => avg(col(cq.field))
      case "sum"   => sum(col(cq.field))
      case "count" => count(col(cq.field))
      case "min"   => min(col(cq.field))
      case "max"   => max(col(cq.field))
      case a       => throw new IllegalArgumentException(s"unsupported CQ aggregate $a")
    }
    input
      .dropDuplicates("ts" +: cq.tags)
      .groupBy(window(col("ts"), cq.windowDur).as("w") +: cq.tags.map(col): _*)
      .agg(aggCol.as(cq.agg))
      .select(col("w.start").as("time") +: cq.tags.map(col) :+ col(cq.agg): _*)
  }
}
