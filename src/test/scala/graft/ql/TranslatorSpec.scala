package graft.ql

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Translator semantics the DuckDB gate can't probe: error behaviors
  * (reference 400s), the merge-semantics unit vectors from
  * `service/coordinator_test.go:86-197` re-expressed on a tiny in-memory
  * measurement, and SHOW output shape. */
class TranslatorSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  /** The reference's test fixture: treasures gold=100, silver=50, trash=0
    * (`service/test_utils.go:60-76`), as a measurement. */
  private lazy val treasures = {
    val s = spark
    import s.implicits._
    Seq(
      (1000000L, "gold", 100.0),
      (2000000L, "silver", 50.0),
      (3000000L, "trash", 0.0)
    ).toDF("ts_us", "type", "value")
  }
  private val meta = TableMeta("treasures", "ts_us",
    tags = Seq("type"), fields = Seq(FieldMeta("value", Some(100L))))

  private def run(q: String): Array[Row] = {
    val sel = Parser.parse(q).asInstanceOf[SelectStmt]
    new Translator(treasures, meta).run(sel).collect()
  }

  test("distributed mean of {100,50,0} is 50 (coordinator_test.go:86-110)") {
    val rows = run("SELECT mean(value) FROM treasures")
    assert(rows.length == 1)
    assert(rows.head.getDouble(0) == 50.0)
  }

  test("mean over filtered tags = 50 for gold+trash (query_handler_test.go:11-16)") {
    val rows = run("SELECT mean(value) FROM treasures WHERE type = 'gold' OR type = 'trash' GROUP BY time(1d) LIMIT 1")
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("mean") == 50.0)
  }

  test("sum/count/spread merge vectors") {
    val r = run("SELECT sum(value), count(value), spread(value) FROM treasures").head
    assert(r.getAs[Double]("sum") == 150.0)
    assert(r.getAs[Long]("count") == 3L)
    assert(r.getAs[Double]("spread") == 100.0)
  }

  test("scalar chain abs(round(mean * -3.55)) (coordinator_test.go merge-math vector)") {
    val r = run("SELECT abs(round(mean(value) * -3)) FROM treasures WHERE type = 'gold'").head
    assert(r.getAs[Double]("abs") == 300.0)
  }

  test("division by zero yields 0, not null/inf (query_merge.go:326-330)") {
    val r = run("SELECT sum(value) / (sum(value) - sum(value)) FROM treasures").head
    assert(r.getAs[Double]("sum") == 0.0)
  }

  test("bare field with GROUP BY time errors like the reference 400 (query_handler_test.go:45-49)") {
    assertThrows[ParseException](run("SELECT value FROM treasures GROUP BY time(1d)"))
  }

  test("mixing aggregate and bare field errors") {
    assertThrows[ParseException](run("SELECT mean(value), value FROM treasures"))
  }

  test("unknown identifiers yield the dialect's empty 200 result, not an error") {
    // InfluxDB 1.x reserves 400 for syntax errors; a SELECT/WHERE over a
    // field or tag the measurement doesn't declare answers empty with 200
    val sel = Parser.parse("SELECT mean(nope) FROM treasures").asInstanceOf[SelectStmt]
    val out = new Translator(treasures, meta).run(sel)
    assert(out.columns.contains("mean")) // schema survives
    assert(out.count() == 0)
    assert(run("SELECT nope FROM treasures").isEmpty)
    assert(run("SELECT value FROM treasures WHERE nope = 'x'").isEmpty)
    assert(run("SELECT value FROM treasures WHERE nope =~ /x/").isEmpty)
    assert(run("SELECT value FROM treasures WHERE nope > 3").isEmpty)
    // mixed SELECT keeps rows; the unknown column is null
    val mixed = run("SELECT value, nope FROM treasures")
    assert(mixed.length == 3 && mixed.forall(_.isNullAt(mixed.head.fieldIndex("nope"))))
  }

  test("case-variant unknown identifiers don't clobber the real column") {
    // InfluxQL identifiers are case-sensitive, so 'Value' is unknown —
    // but Spark's withColumn resolves case-INsensitively, and the r10
    // null-bind would silently REPLACE the declared 'value' column's
    // data. The real column must keep its rows; the variant binds null
    // under an internal name, output spelling preserved.
    val mixed = run("SELECT value, Value FROM treasures")
    assert(mixed.length == 3)
    val schema = mixed.head.schema.fieldNames.toSeq
    assert(schema.contains("value") && schema.contains("Value"), schema.toString)
    val iReal = mixed.head.schema.fieldNames.indexOf("value")
    val iUnk = mixed.head.schema.fieldNames.indexOf("Value")
    assert(mixed.map(_.getDouble(iReal)).sorted.toSeq == Seq(0.0, 50.0, 100.0))
    assert(mixed.forall(_.isNullAt(iUnk)))
    // aggregate over the case-variant alone: empty by schema, not all-null
    // rows computed from the clobbered real column
    assert(run("SELECT mean(VALUE) FROM treasures").isEmpty)
    // known + case-variant aggregates side by side: the known one keeps
    // its real data
    val both = run("SELECT mean(value), mean(VALUE) FROM treasures")
    assert(both.length == 1 && both.head.getAs[Double]("mean") == 50.0)
  }

  test("unknown-vs-known-identifier predicates compare as null, not ANSI cast errors") {
    // WHERE nope = <known string tag>: the injected null must take the
    // tag's STRING type — a double null would implicitly cast the tag
    // column and fold into a runtime cast error under ANSI
    assert(run("SELECT value FROM treasures WHERE nope = type").isEmpty)
    assert(run("SELECT value FROM treasures WHERE type = nope").isEmpty)
    assert(run("SELECT value FROM treasures WHERE nope = value").isEmpty)
    // KNOWN numeric field vs KNOWN string tag type-conflict: also the
    // dialect's empty result, not a cast error
    assert(run("SELECT value FROM treasures WHERE value != type").isEmpty)
    // same-class comparison still evaluates normally
    assert(run("SELECT value FROM treasures WHERE type = type").length == 3)
  }

  test("strict-identifier mode restores the hard 400") {
    spark.conf.set("spark.graft.strictIdentifiers", "true")
    try assertThrows[ParseException](run("SELECT mean(nope) FROM treasures"))
    finally spark.conf.unset("spark.graft.strictIdentifiers")
  }

  test("aggregate aliased to a group-by tag name renames instead of dying") {
    val rows = run("SELECT mean(value) AS type FROM treasures GROUP BY type")
    assert(rows.length == 3)
    assert(rows.head.schema.fieldNames.count(_.startsWith("type")) == 2) // type, type_1
  }

  test("GROUP BY * expands to the measurement's tags") {
    val rows = run("SELECT mean(value) FROM treasures GROUP BY *")
    assert(rows.length == 3) // one per type
  }

  test("top returns rows with timestamps") {
    val rows = run("SELECT top(value, 2) FROM treasures")
    assert(rows.map(_.getAs[Double]("top")).toSet == Set(100.0, 50.0))
    assert(rows.forall(r => r.getAs[Long]("time") > 0))
  }

  test("unscaled FLOAT fields aggregate as doubles, not truncated longs (regression)") {
    val s = spark
    import s.implicits._
    // meta WITHOUT a fixed-point scale — the inferred-schema path
    val df = Seq((1L, "a", 22.5), (2L, "a", 24.5)).toDF("ts_us", "t", "v")
    val m = TableMeta("m", "ts_us", Seq("t"), Seq(FieldMeta("v", None)))
    def run(q: String) = new Translator(df, m)
      .run(Parser.parse(q).asInstanceOf[SelectStmt]).collect()
    assert(run("SELECT mean(v) FROM m").head.getDouble(0) == 23.5)
    assert(run("SELECT sum(v) FROM m").head.getDouble(0) == 47.0)
    assert(run("SELECT difference(v) FROM m GROUP BY t").head.getAs[Double]("difference") == 2.0)
    assert(run("SELECT median(v) FROM m").head.getDouble(0) == 23.5)
    assert(math.abs(run("SELECT stddev(v) FROM m").head.getDouble(0)
      - math.sqrt(2.0)) < 1e-12)
  }

  test("SHOW MEASUREMENTS / TAG KEYS shapes") {
    val m = Meta.show(spark, sfDir, "MEASUREMENTS").collect()
    assert(m.map(_.getString(0)).contains("events"))
    val tk = Meta.show(spark, sfDir, "TAG KEYS").collect()
    assert(tk.exists(r => r.getString(0) == "events" && r.getString(1) == "event_type"))
  }

  test("time-range filters reach the parquet scan as pushed bounds") {
    // The pushed literal shape tracks the file's physical ts encoding
    // (Tables): ns-LONG files push ns integers on ts, µs-TIMESTAMP files
    // push TIMESTAMP literals on ts. Either way BOTH bounds must reach
    // PushedFilters or time-axis row-group pruning is silently lost.
    val df = Translator.query(spark, sfDir,
      "SELECT count(value) FROM events WHERE time >= '2024-01-10' AND time < '2024-01-17' GROUP BY event_type")
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    val nsShape = pushed.contains("GreaterThanOrEqual(ts,1704844800000000000)") &&
      pushed.contains("LessThan(ts,1705449600000000000)")
    val usShape = pushed.contains("GreaterThanOrEqual(ts,2024-01-10 00:00:00") &&
      pushed.contains("LessThan(ts,2024-01-17 00:00:00")
    assert(nsShape || usShape, pushed)
  }

  test("full front-end runs against the events measurement (sf0.001)") {
    val df = Translator.query(spark, sfDir, "SELECT mean(value) FROM events GROUP BY time(1d), event_type")
    assert(df.columns.toSeq == Seq("time", "event_type", "mean"))
    assert(df.count() > 0)
  }

  test("tz buckets honor the DST transition: local midnights shift EST→EDT") {
    // America/New_York springs forward 2024-03-10: local midnight is
    // 05:00 UTC before, 04:00 UTC after; the 1d bucket for Mar 10 itself
    // is a 23-hour day. A point at 12:00 UTC each day lands in that
    // local day's bucket, whose reported time is the UTC instant of the
    // LOCAL midnight — not a fixed offset.
    val e = new graft.Engine(spark, sfDir)
    val meta = graft.ql.TableMeta("dst", "ts_us",
      tags = Seq("t"), fields = Seq(graft.ql.FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    def noonUtcNs(day: Int): Long = // 2024-03-<day> 12:00 UTC, ns
      (java.time.LocalDate.of(2024, 3, day).atTime(12, 0)
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond) * 1000000000L
    e.writeLineProtocol(Seq(
      s"dst,t=a v=1 ${noonUtcNs(9)}",
      s"dst,t=a v=2 ${noonUtcNs(10)}",
      s"dst,t=a v=3 ${noonUtcNs(11)}"), "dst")
    val rows = e.execute(
      "SELECT mean(v) FROM dst GROUP BY time(1d) tz('America/New_York')")
      .collect().map(r => (r.getAs[Long]("time"), r.getAs[Double]("mean"))).toMap
    def localMidnightUs(day: Int): Long =
      java.time.LocalDate.of(2024, 3, day).atStartOfDay(
        java.time.ZoneId.of("America/New_York")).toInstant.getEpochSecond * 1000000L
    assert(rows == Map(
      localMidnightUs(9)  -> 1.0,  // 05:00 UTC (EST)
      localMidnightUs(10) -> 2.0,  // 05:00 UTC — the 23-hour day
      localMidnightUs(11) -> 3.0)) // 04:00 UTC (EDT)
    // and the boundaries really differ: EST vs EDT midnight
    assert(localMidnightUs(11) - localMidnightUs(10) == 23L * 3600 * 1000000)
  }

  test("tag-qualified top pushes rank limits: one exchange, WindowGroupLimit") {
    val df = Translator.query(spark, sfDir, "SELECT top(value, event_type, 3) FROM events")
    val plan = df.queryExecution.executedPlan.toString
    // per-tag extreme runs as partial+final rank pushdown before the only
    // data shuffle; the global top-N then sees one row per tag
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1, plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("analytics-over-aggregate shuffles aggregated rows only (≤3 exchanges)") {
    val df = Translator.query(spark, sfDir,
      "SELECT exponential_moving_average(mean(value), 4) FROM events GROUP BY time(1d), event_type")
    val plan = df.queryExecution.executedPlan.toString
    // 1: raw→(bucket, tag) agg shuffle; 2: bucket rows→tag series for the
    // fold (tiny: buckets × tags rows); 3: final ORDER BY range partition.
    // A 4th exchange would mean the fold started re-shuffling raw data.
    assert(plan.linesIterator.count(_.contains("Exchange")) <= 3, plan)
    assert(plan.contains("MapGroups"), plan)
  }

  test("tz string literal inside the DST gap resolves by shifting forward") {
    // 2024-03-10 02:30 does not exist in America/New_York (clocks jump
    // 02:00→03:00). Java zone rules resolve gap times by shifting forward
    // by the gap length — '02:30' ≡ 03:30 EDT = 07:30 UTC. Pin that so the
    // WHERE bound is deterministic and documented, not accidental.
    val e = new graft.Engine(spark, sfDir)
    val meta = graft.ql.TableMeta("dstgap", "ts_us",
      tags = Seq("t"), fields = Seq(graft.ql.FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    def utcNs(h: Int, m: Int): Long = // 2024-03-10 <h>:<m> UTC, ns
      java.time.LocalDate.of(2024, 3, 10).atTime(h, m)
        .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L
    e.writeLineProtocol(Seq(
      s"dstgap,t=a v=1 ${utcNs(7, 0)}",   // 03:00 EDT
      s"dstgap,t=a v=2 ${utcNs(7, 45)}",  // 03:45 EDT
      s"dstgap,t=a v=3 ${utcNs(8, 30)}"), "dstgap")
    val got = e.execute(
      "SELECT v FROM dstgap WHERE time >= '2024-03-10 02:30:00' AND time < '2024-03-10 04:00:00' tz('America/New_York')")
      .collect().map(_.getAs[Double]("v")).toSet
    // '02:30' gap → 03:30 EDT = 07:30 UTC; '04:00' = 08:00 UTC.
    // 07:00 (before), 07:45 (inside), 08:30 (after) → only v=2 qualifies.
    assert(got == Set(2.0))
  }
}
