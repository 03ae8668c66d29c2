package graft

import graft.ql.{FieldMeta, TableMeta}

/** Durable write path + retention enforcement (VERDICT r4 items 1-2): data
  * written through the engine must survive a restart (the reference's data
  * nodes persist every fanned-out batch, write_handler.go:157-212), deletes
  * must be at-rest compactions, and RP durations must actually expire rows
  * (syncing/models.go:3-9). */
class DurabilitySpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_durable").toString

  private val meta = TableMeta("dm", "ts_us",
    tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L))))

  test("written points survive an engine restart on the same dataDir") {
    val dir = tmpDir()
    val e1 = new Engine(spark, sfDir, Some(dir))
    e1.registerMeasurement(meta, spark.emptyDataFrame)
    val (n, bad) = e1.writeLineProtocol(Seq(
      "dm,type=a v=1 1000000000",
      "dm,type=b v=2 2000000000"), "dm")
    assert(n == 2 && bad == 0)
    assert(e1.execute("SELECT v FROM dm").collect().length == 2)

    val e2 = new Engine(spark, sfDir, Some(dir)) // fresh instance = restart
    val rows = e2.execute("SELECT v FROM dm").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("v"))).toSet
    assert(rows == Set((1000000L, 1.0), (2000000L, 2.0)))
    // restored meta keeps the fixed-point scale: mean stays exact
    assert(e2.execute("SELECT mean(v) FROM dm").collect()
      .head.getAs[Double]("mean") == 1.5)
  }

  test("appends accumulate across restarts; SHOW MEASUREMENTS sees restored tables") {
    val dir = tmpDir()
    val e1 = new Engine(spark, sfDir, Some(dir))
    e1.registerMeasurement(meta, spark.emptyDataFrame)
    e1.writeLineProtocol(Seq("dm,type=a v=1 1000000000"), "dm")
    val e2 = new Engine(spark, sfDir, Some(dir))
    e2.writeLineProtocol(Seq("dm,type=b v=2 2000000000"), "dm")
    assert(e2.execute("SELECT v FROM dm").collect().length == 2)
    assert(e2.execute("SHOW MEASUREMENTS").collect().map(_.getString(0)).contains("dm"))
  }

  test("DELETE FROM compacts at rest and survives restart") {
    val dir = tmpDir()
    val e1 = new Engine(spark, sfDir, Some(dir))
    e1.registerMeasurement(meta, spark.emptyDataFrame)
    e1.writeLineProtocol(Seq(
      "dm,type=a v=1 1000000000",
      "dm,type=b v=2 2000000000"), "dm")
    e1.execute("DELETE FROM dm WHERE type = 'a'")
    assert(e1.execute("SELECT v FROM dm").collect().map(_.getAs[Double]("v")).toSet == Set(2.0))

    val e2 = new Engine(spark, sfDir, Some(dir))
    assert(e2.execute("SELECT v FROM dm").collect().map(_.getAs[Double]("v")).toSet == Set(2.0))
  }

  test("full DELETE leaves an empty but queryable measurement across restart") {
    val dir = tmpDir()
    val e1 = new Engine(spark, sfDir, Some(dir))
    e1.registerMeasurement(meta, spark.emptyDataFrame)
    e1.writeLineProtocol(Seq("dm,type=a v=1 1000000000"), "dm")
    e1.execute("DELETE FROM dm")
    assert(e1.execute("SELECT v FROM dm").collect().isEmpty)
    val e2 = new Engine(spark, sfDir, Some(dir))
    assert(e2.execute("SELECT v FROM dm").collect().isEmpty)
  }

  test("DROP MEASUREMENT removes the at-rest directory") {
    val dir = tmpDir()
    val e1 = new Engine(spark, sfDir, Some(dir))
    e1.registerMeasurement(meta, spark.emptyDataFrame)
    e1.writeLineProtocol(Seq("dm,type=a v=1 1000000000"), "dm")
    e1.execute("DROP MEASUREMENT dm")
    val e2 = new Engine(spark, sfDir, Some(dir))
    assertThrows[graft.ql.ParseException](e2.execute("SELECT v FROM dm").collect())
  }

  test("partition key lays tag values out as partition directories") {
    val dir = tmpDir()
    val e = new Engine(spark, sfDir, Some(dir))
    e.execute("CREATE PARTITION KEY type ON default.dm")
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq(
      "dm,type=a v=1 1000000000",
      "dm,type=b v=2 2000000000"), "dm")
    val sub = new java.io.File(s"$dir/dm/data").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(sub == Set("type=a", "type=b")) // read-side pruning comes free
    // tag column restored from the directory name (string, inference off)
    val rows = e.execute("SELECT v FROM dm WHERE type = 'b'").collect()
    assert(rows.map(_.getAs[Double]("v")).toSet == Set(2.0))
  }

  test("retention: expired rows invisible at read time, reclaimed by enforceRetention; autogen keeps all") {
    val dir = tmpDir()
    val e = new Engine(spark, sfDir, Some(dir))
    val now = 10L * 3600 * 1000000 // epoch +10h, µs
    e.nowUs = () => now
    e.execute("CREATE RETENTION POLICY short ON default DURATION 1h REPLICATION 1")
    e.registerMeasurement(meta, spark.emptyDataFrame)
    // rp-bound measurement: one point 2h old (expired), one 10min old
    e.setRetentionPolicy("dm", "default", "short")
    e.writeLineProtocol(Seq(
      s"dm,type=a v=1 ${(now - 2L * 3600 * 1000000) * 1000}",
      s"dm,type=b v=2 ${(now - 10L * 60 * 1000000) * 1000}"), "dm")
    // autogen-bound measurement with the same ancient point keeps it
    val meta2 = TableMeta("dk", "ts_us", tags = Seq("type"),
      fields = Seq(FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta2, spark.emptyDataFrame)
    e.writeLineProtocol(Seq(s"dk,type=a v=1 ${(now - 2L * 3600 * 1000000) * 1000}"), "dk")

    assert(e.execute("SELECT v FROM dm").collect().map(_.getAs[Double]("v")).toSet == Set(2.0))
    assert(e.execute("SELECT v FROM dk").collect().map(_.getAs[Double]("v")).toSet == Set(1.0))

    e.enforceRetention() // at-rest compaction
    val atRest = spark.read.parquet(s"$dir/dm/data").collect()
    assert(atRest.length == 1) // the expired row is physically gone
    assert(spark.read.parquet(s"$dir/dk/data").count() == 1) // infinite RP untouched

    // survivors stay correct across a restart (rp mapping is re-declared
    // by the operator; data itself is already compacted)
    val e2 = new Engine(spark, sfDir, Some(dir))
    assert(e2.execute("SELECT v FROM dm").collect().map(_.getAs[Double]("v")).toSet == Set(2.0))
  }
}
