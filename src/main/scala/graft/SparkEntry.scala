package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * SURVEY §7.2's minimum slice re-expressed on the events table: the
    * reference's core SELECT path — time-range + tag filter, tumbling
    * time bucket, mean aggregate (service/query_handler_test.go:11-16).
    */
  def entry(spark: SparkSession): DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "events")
      .where(col("ts") <= current_timestamp() && col("event_type").isin("click", "view"))
      .groupBy(window(col("ts"), "1 day").getField("start").as("bucket"), col("event_type"))
      .agg(avg("value").as("mean_value"), count(lit(1)).as("cnt"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.validated.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.validated.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
