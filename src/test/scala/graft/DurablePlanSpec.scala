package graft

import graft.ql.{FieldMeta, TableMeta}

/** Plan shapes on the DURABLE read path (the 100 TB story must survive the
  * round-6 durability work): the read-time retention cutoff has to reach
  * the parquet scan as a pushed filter — not a post-scan Filter over every
  * row — and tag predicates over the partition-key layout must keep
  * pruning directories after a restart. */
class DurablePlanSpec extends SparkSpec {

  private def tmpDir(): String =
    graft.TempDirs.scratch("graft_dplan").toString

  private val meta = TableMeta("dp", "ts_us",
    tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L))))

  test("retention cutoff is pushed down to the durable parquet scan") {
    val dir = tmpDir()
    val e = new Engine(spark, sfDir, Some(dir))
    val now = 10L * 3600 * 1000000
    e.nowUs = () => now
    e.execute("CREATE RETENTION POLICY short ON default DURATION 1h REPLICATION 1")
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.setRetentionPolicy("dp", "default", "short")
    e.writeLineProtocol(Seq(
      s"dp,type=a v=1 ${(now - 2L * 3600 * 1000000) * 1000}",
      s"dp,type=b v=2 ${(now - 10L * 60 * 1000000) * 1000}"), "dp")

    val plan = e.execute("SELECT v FROM dp").queryExecution.executedPlan.toString
    // the cutoff predicate appears in the scan's PushedFilters — row-group
    // statistics skip expired data without decoding it
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(ts_us"),
      s"expected pushed ts_us cutoff in scan:\n$plan")
  }

  test("time-range predicates prune time-bucket partition directories") {
    val dir = tmpDir()
    val e = new Engine(spark, sfDir, Some(dir))
    e.registerMeasurement(meta, spark.emptyDataFrame) // autogen → 7d buckets
    val dayUs = 24L * 3600 * 1000000
    e.writeLineProtocol(Seq(
      s"dp,type=a v=1 ${1 * dayUs * 1000}",  // bucket _tb=0
      s"dp,type=b v=2 ${9 * dayUs * 1000}"), "dp") // bucket _tb=1
    val df = e.execute(s"SELECT v FROM dp WHERE time >= ${8 * dayUs}")
    val plan = df.queryExecution.executedPlan.toString
    // the WHERE's constant time bound is rebound onto the `_tb` directory
    // column: the scan lists only the touched shard-group buckets
    assert(plan.contains("PartitionFilters") && plan.contains("_tb"),
      s"expected _tb partition filter:\n$plan")
    assert(df.collect().map(_.getAs[Double]("v")).toSet == Set(2.0))
    // and `_tb` is physical layout only — never a query-visible column
    assert(!df.columns.contains("_tb"))
  }

  test("tag predicates prune partition directories across a restart") {
    val dir = tmpDir()
    val e1 = new Engine(spark, sfDir, Some(dir))
    e1.execute("CREATE PARTITION KEY type ON default.dp")
    e1.registerMeasurement(meta, spark.emptyDataFrame)
    e1.writeLineProtocol(Seq(
      "dp,type=a v=1 1000000000",
      "dp,type=b v=2 2000000000"), "dp")

    val e2 = new Engine(spark, sfDir, Some(dir)) // restart: layout from meta
    val df = e2.execute("SELECT v FROM dp WHERE type = 'b'")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("type"),
      s"expected partition filter on restored layout:\n$plan")
    assert(df.collect().map(_.getAs[Double]("v")).toSet == Set(2.0))
  }
}
