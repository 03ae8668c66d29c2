package graft.ql

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-measurement metadata: which columns are tags vs fields, where time
  * lives, and each field's fixed-point scale (SURVEY §1.3 "tags tracked in
  * per-table metadata").
  *
  * `scale` declares a field as fixed-point (100 = two decimals). sum/mean/
  * stddev then run over exact integers (`round(v*scale)::LONG`), making
  * distributed aggregation order-independent — the deliberate exactness
  * upgrade over the reference's float64 merge arithmetic
  * (`service/merge/query_merge.go:13-15`, SURVEY §7.0).
  */
/** ftype: line-protocol field type — "float" (default), "integer",
  * "boolean", "string" (InfluxDB's four field types). Fixed-point `scale`
  * only applies to float fields. */
final case class FieldMeta(name: String, scale: Option[Long],
    ftype: String = "float")
final case class TableMeta(
    measurement: String,
    timeCol: String, // LONG epoch-µs column
    tags: Seq[String],
    fields: Seq[FieldMeta],
    rawTimeNs: Option[String] = None, // raw parquet ns column, for pushdown
    // shard-group-duration analog (reference syncing/models.go:5): durable
    // data is directory-partitioned by `_tb = timeCol DIV bucketUs`, so
    // retention expiry is a partition drop and time scans prune directories
    bucketUs: Option[Long] = None,
    // physical TimestampType(µs) scan column, preferred for pushdown when
    // the file is µs-encoded (then rawTimeNs is derived and cannot prune)
    rawTimeTsUs: Option[String] = None) {
  def field(n: String): FieldMeta =
    fields.find(_.name == n).getOrElse(
      throw ParseException(s"unknown field '$n' on measurement '$measurement'"))
  def isTag(n: String): Boolean = tags.contains(n)
}

object Catalog {
  /** The `events` stream table as an InfluxDB-style measurement:
    * time = ts_us (µs), tag = event_type, fields = value (2-dec), user_id. */
  val events: TableMeta = TableMeta("events", "ts_us",
    tags = Seq("event_type"),
    fields = Seq(FieldMeta("value", Some(100L)), FieldMeta("user_id", None, "integer")),
    rawTimeNs = Some("ts_ns"))

  def load(spark: SparkSession, sfDir: String, measurement: String): (DataFrame, TableMeta) =
    measurement match {
      case "events" =>
        // pushdown column depends on the file's physical time encoding:
        // ns-LONG files prune via ts_ns bounds; µs-TIMESTAMP files keep the
        // raw ts scan column, so prune via TIMESTAMP bounds on it instead
        val (df, tsIsPhysical) = Tables.events(spark, sfDir)
        (df, if (tsIsPhysical) events.copy(rawTimeTsUs = Some("ts")) else events)
      case m => throw ParseException(s"unknown measurement '$m'")
    }
}
