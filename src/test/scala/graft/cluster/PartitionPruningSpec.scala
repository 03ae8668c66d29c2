package graft.cluster

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Read-side partition pruning over the write-side tag layout — the
  * Spark-native form of the reference's hash routing
  * (service/coordinator.go:182-196): a tag-equality predicate must prune to
  * the matching partition directories at planning time, never scan-all. */
class PartitionPruningSpec extends SparkSpec {

  test("tag-partitioned layout prunes scans on tag equality predicates") {
    val s = spark
    val dir = graft.TempDirs.scratch("events_bytag").toString
    val ev = Tables(s, sfDir, "events")
      .select("event_id", "ts_us", "event_type", "value")
    Partitioner.writePartitioned(ev, Seq("event_type"), dir)

    val pruned = s.read.parquet(dir).where(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString

    // planning-time pruning: the scan reports the partition filter and
    // reads only the matching directory
    assert(plan.contains("PartitionFilters") && plan.contains("event_type"),
      s"expected partition filter in scan:\n$plan")
    val expected = ev.where(col("event_type") === "click").count()
    assert(pruned.count() == expected)

    // multi-value (OR/IN) predicates prune to multiple directories — the
    // reference's compound-key cartesian expansion (partitioner.go:51-81)
    val multi = s.read.parquet(dir)
      .where(col("event_type").isin("click", "error"))
    assert(multi.count() ==
      ev.where(col("event_type").isin("click", "error")).count())
  }
}
