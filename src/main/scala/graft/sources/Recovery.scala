package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

/** Dead-letter recovery — the Spark-native reading of the reference's
  * hinted-handoff (`/root/reference/cluster/recovery.go:89-175,187-229`):
  * where the reference buffers failed replica writes to per-node local
  * files and replays them in 500-line chunks when the node returns, we
  * quarantine unparseable/undeliverable lines to a parquet dead-letter
  * directory and replay them through the normal parse path by a
  * maintenance job (SURVEY §2.1 recovery row).
  *
  * Scale notes: the dead-letter write is an append-mode distributed sink
  * (no driver buffering); replay is just the ingest pipeline pointed at
  * the quarantine dir — idempotence comes from the engine's replica-dedup
  * semantics (e_dedup_points), mirroring the reference's merge-time dedup.
  */
object Recovery {

  /** Quarantine raw failed lines (append: multiple failed batches
    * accumulate, like the reference's per-node recovery files). */
  def quarantine(errors: Dataset[String], deadLetterDir: String): Unit =
    errors.write.mode("append").text(deadLetterDir)

  /** Replay the quarantine through the parser; returns (parsed points as a
    * DataFrame, still-failing lines). Callers re-quarantine the failures
    * (chunked retry loop = the reference's RecoverNodes cycle). */
  def replay(spark: SparkSession, deadLetterDir: String, measurement: String,
      tagKeys: Seq[String], floatFields: Seq[String],
      fieldTypes: Seq[String] = Nil)
      : (org.apache.spark.sql.DataFrame, Dataset[String]) = {
    import spark.implicits._
    val lines = spark.read.textFile(deadLetterDir)
    // strip the "<reason>: " prefix quarantined by LineProtocol.parse
    val raw = lines.map { l =>
      val i = l.indexOf(": ")
      if (i >= 0) l.substring(i + 2) else l
    }
    LineProtocol.parse(spark, raw, measurement, tagKeys, floatFields,
      fieldTypes = fieldTypes)
  }
}
