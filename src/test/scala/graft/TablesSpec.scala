package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regression for the round-8 headline: the testdata's physical `ts`
  * encoding moved (TIMESTAMP(NANOS) → timestamp[us]) and a loader that
  * assumed one shape crashed 110 gates. `Tables.events` must surface
  * identical logical (ts, ts_us, ts_ns) for every encoding a file can
  * arrive in; this spec writes the same instants in each WRITABLE
  * encoding and pins the dispatch. (TIMESTAMP(NANOS) itself is not
  * Spark-writable — its read path is the nanosAsLong BIGINT shape
  * asserted here.) */
class TablesSpec extends SparkSpec {

  private val instantsUs = Seq(
    1704844800000000L,           // 2024-01-10 00:00:00 UTC
    1705449599999999L,           // 2024-01-16 23:59:59.999999
    0L)                          // epoch

  private def writeDir(): String =
    graft.TempDirs.scratch("graft_tables").toString

  private def check(dir: String, expectRawTs: Boolean): Unit = {
    val (df, rawTs) = Tables.events(spark, dir)
    assert(rawTs == expectRawTs)
    val got = df.select("ts_us", "ts_ns")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == instantsUs.map(us => (us, us * 1000L)).toSet, got)
    // ts itself is always a TIMESTAMP carrying the same instants
    assert(df.schema("ts").dataType == TimestampType)
    val tsUs = df.select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSet
    assert(tsUs == instantsUs.toSet)
  }

  test("µs TIMESTAMP encoding: ts stays the pristine scan column") {
    val s = spark
    import s.implicits._
    val dir = writeDir()
    instantsUs.toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir, expectRawTs = true)
  }

  test("BIGINT epoch-ns encoding (nanosAsLong / ScaleUp round-trip)") {
    val s = spark
    import s.implicits._
    val dir = writeDir()
    instantsUs.map(_ * 1000L).toDF("ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir, expectRawTs = false)
  }

  test("TIMESTAMP_NTZ encoding: cast to instants under the UTC session") {
    val s = spark
    import s.implicits._
    val dir = writeDir()
    instantsUs.toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    check(dir, expectRawTs = false)
  }

  test("an unsupported ts type fails loudly, not at first query") {
    val s = spark
    import s.implicits._
    val dir = writeDir()
    Seq("a", "b").toDF("ts").write.mode("overwrite").parquet(s"$dir/events.parquet")
    intercept[IllegalStateException] { Tables.events(spark, dir) }
  }
}
