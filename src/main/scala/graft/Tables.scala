package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All tables are plain parquet reads except `events`, whose physical `ts`
  * encoding has varied across testdata generations. The loader dispatches on
  * the actual parquet read schema (VERDICT r8 headline) and always surfaces
  * the same logical columns:
  *   - `ts`     TIMESTAMP  (µs instants; DuckDB reads the same file to the
  *              same µs values, which grounds the oracle's `epoch_us(ts)`)
  *   - `ts_us`  LONG epoch microseconds (exact integer time arithmetic —
  *              elapsed/derivative/integral need it; see SURVEY.md §2.4)
  *   - `ts_ns`  LONG epoch nanoseconds (raw when the file is ns-encoded,
  *              derived `ts_us * 1000` otherwise)
  *
  * Supported physical shapes of `ts`:
  *   1. TIMESTAMP(NANOS) read as raw ns LONG via
  *      `spark.sql.legacy.parquet.nanosAsLong` (rounds 1–7 testdata). Here
  *      `ts_ns` IS the scan column, so Translator's redundant ns bounds
  *      reach the parquet row-group index; integer `div` (not `/`) keeps
  *      ns→µs exact (epoch ns ~1.7e18 exceeds 2^53).
  *   2. timestamp[us] read as TimestampType (round-8+ testdata; Sessions
  *      disables NTZ inference and pins UTC, so values are exact epoch µs).
  *      Here `ts` itself stays the pristine scan column — time pushdown must
  *      bind TIMESTAMP bounds on it (TableMeta.rawTimeTsUs → Translator).
  *   3. BIGINT epoch ns (ScaleUp round-trip of shape 1) — same as shape 1.
  *   4. TIMESTAMP_NTZ (a session without Sessions.build's conf): cast to
  *      TimestampType (UTC session tz → identical instants), then shape 2,
  *      minus scan-column pushdown (the cast sits above the scan).
  */
object Tables {
  import org.apache.spark.sql.types.{LongType, TimestampType, TimestampNTZType}

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The events table, plus whether `ts` survives as the physical
    * TimestampType scan column (usable for parquet predicate pushdown). */
  def events(spark: SparkSession, sfDir: String): (DataFrame, Boolean) = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        (raw.withColumn("ts_ns", col("ts"))
          .withColumn("ts_us", expr("ts div 1000"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)")), false)
      case TimestampType =>
        (raw.withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L), true)
      case TimestampNTZType =>
        val cast = raw.withColumn("ts", col("ts").cast(TimestampType))
        (cast.withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L), false)
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported parquet-read type $other " +
            "(expected ns LONG, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" => events(spark, sfDir)._1
    case n        => spark.read.parquet(s"$sfDir/$n.parquet")
  }

  /** Exact integer cents from a column whose data is 2-decimal doubles.
    * Both Spark and DuckDB round(x*100) land on the same integer, making
    * downstream sums order-independent and bit-identical across engines —
    * the foundation of the DuckDB-oracle hash match (BASELINE.md t2).
    */
  def cents(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(c * 100).cast("long")
}

/** One verifiable operator: a DataFrame program plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB on the same parquet files.
  * `oracle == None` → the driver records a weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Oracle-checked query. */
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  /** Rows-only query (non-deterministic or not SQL-expressible). */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
