package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * All tables are plain parquet reads except `events`, whose `ts` column is
  * parquet TIMESTAMP(NANOS) — unsupported by Spark's vectorized reader.
  * We read it as a raw nanosecond LONG (`spark.sql.legacy.parquet.nanosAsLong`)
  * and derive:
  *   - `ts`     TIMESTAMP  (microsecond, truncated — matches what DuckDB
  *              produces when it reads the same file: ns are truncated to µs)
  *   - `ts_us`  LONG epoch microseconds (exact integer time arithmetic —
  *              elapsed/derivative/integral need it; see SURVEY.md §2.4)
  *
  * Integer `div` (not `/`) keeps the ns→µs conversion exact: epoch-ns values
  * (~1.7e18) exceed 2^53 and would lose precision through a double.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      // Requires spark.sql.legacy.parquet.nanosAsLong=true, set once at
      // session build time (Sessions.build) — not mutated here (ADVICE r1).
      // ts_ns keeps the RAW parquet column: filters on the derived ts_us
      // ((ts div 1000) ≥ X) are not convertible to parquet predicates, so
      // time-range row-group pruning only happens through ts_ns bounds
      // (Translator emits them; see predicate()).
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts_ns", col("ts"))
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    case n =>
      spark.read.parquet(s"$sfDir/$n.parquet")
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
