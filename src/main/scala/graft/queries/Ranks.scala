package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed total-order ranking. `row_number().over(Window.orderBy(k))`
  * is a single-task global sort — fine for a handful of rows, a scale
  * ceiling for a corpus. `globalRank` produces the IDENTICAL 0-based rank
  * for a unique key at any scale: range-repartition on the key (the
  * sampled split points decide only where partitions cut, never the
  * result), rank within each partition, then add broadcast partition-size
  * prefix offsets. */
object Ranks {

  /** 0-based rank of each row in ascending `keys` order. The key tuple
    * must be unique per row (callers rank distinct sets or unique ids). */
  def globalRank(df: DataFrame, keys: Seq[Column], out: String = "rank"): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val local = df.repartitionByRange(p, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(keys: _*)).cast("long"))
    val offs = local.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(
        // ≤ P rows; the derived-constant key keeps even this tiny window
        // partitioned (a literal would be constant-folded out of the spec)
        Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), "__pid")
      .withColumn(out, col("__lr") + col("__off") - 1L)
      .drop("__pid", "__lr", "__off")
  }
}
