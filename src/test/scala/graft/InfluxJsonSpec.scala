package graft

/** Result-shape parity with the reference's JSON serializer
  * (`service/query_utils.go:22-87`, SURVEY §7.0 compat quirks). */
class InfluxJsonSpec extends SparkSpec {

  test("empty result serializes as {\"results\":[{}]} (query_utils.go:76-81)") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("time", "mean")
    assert(InfluxJson.serialize("treasures", empty) == """{"results":[{}]}""")
  }

  test("per-series blocks grouped by tags, time first, function-named columns") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (86400000000L, "gold", 100.0),
      (86400000000L, "trash", 0.0)
    ).toDF("time", "type", "mean")
    val json = InfluxJson.serialize("treasures", df, tagCols = Seq("type"))
    assert(json.startsWith("""{"results":[{"statement_id":0,"series":["""))
    assert(json.contains(""""name":"treasures""""))
    assert(json.contains(""""tags":{"type":"gold"}"""))
    assert(json.contains(""""tags":{"type":"trash"}"""))
    assert(json.contains(""""columns":["time","mean"]"""))
    assert(json.contains("""[86400000000,100.0]"""))
  }

  test("epoch param formats time: RFC3339 default-off, ns/u/ms/s integers (coordinator.go:32-46)") {
    val s = spark
    import s.implicits._
    val df = Seq((1704067200000000L, 1.5)).toDF("time", "v")
    assert(InfluxJson.serialize("m", df, epoch = None)
      .contains("\"2024-01-01T00:00:00Z\""))
    assert(InfluxJson.serialize("m", df, epoch = Some("ns")).contains("[1704067200000000000,"))
    assert(InfluxJson.serialize("m", df, epoch = Some("u")).contains("[1704067200000000,"))
    assert(InfluxJson.serialize("m", df, epoch = Some("ms")).contains("[1704067200000,"))
    assert(InfluxJson.serialize("m", df, epoch = Some("s")).contains("[1704067200,"))
  }

  test("strings and control characters escape into valid JSON") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a\"b\n\t")).toDF("time", "note")
    val json = InfluxJson.serialize("m", df)
    assert(json.contains("""a\"b\n\t"""))
  }

  test("serializeStream emits byte-identical JSON without collect() (driver O(1) path)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1000000L, "gold", 100.0),
      (2000000L, "gold", 50.0),
      (1000000L, "trash", 0.0)
    ).toDF("time", "type", "mean").orderBy("type", "time")
    val buffered = InfluxJson.serialize("treasures", df, tagCols = Seq("type"))
    val w = new java.io.StringWriter
    InfluxJson.serializeStream("treasures", df, w, tagCols = Seq("type"))
    assert(w.toString == buffered)

    // empty-result quirk preserved on the streamed path too
    val w2 = new java.io.StringWriter
    InfluxJson.serializeStream("m", Seq.empty[(Long, Double)].toDF("time", "v"), w2)
    assert(w2.toString == """{"results":[{}]}""")
  }

  test("serializeStream honors ORDER BY time DESC (round-4 defect)") {
    val s = spark
    import s.implicits._
    // translator output order for `GROUP BY type ORDER BY time DESC`
    val df = Seq(
      (2000000L, "gold", 50.0),
      (1000000L, "gold", 100.0),
      (2000000L, "trash", 1.0),
      (1000000L, "trash", 0.0)
    ).toDF("time", "type", "mean").orderBy(org.apache.spark.sql.functions.col("time").desc)
    val buffered = InfluxJson.serialize("treasures",
      df.orderBy($"type".asc, $"time".desc), tagCols = Seq("type"))
    val w = new java.io.StringWriter
    InfluxJson.serializeStream("treasures", df, w, tagCols = Seq("type"), timeDesc = true)
    assert(w.toString == buffered) // byte-for-byte, each series newest-first
    assert(w.toString.indexOf("2000000") < w.toString.indexOf("1000000"))
  }

  test("engine queryJsonStream streams DESC within each series") {
    val e = new Engine(spark, sfDir)
    val meta = graft.ql.TableMeta("djs", "ts_us",
      tags = Seq("t"), fields = Seq(graft.ql.FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq(
      "djs,t=a v=1 1000000000",
      "djs,t=a v=2 2000000000"), "djs")
    val w = new java.io.StringWriter
    e.queryJsonStream("SELECT v FROM djs GROUP BY t ORDER BY time DESC", w)
    val vals = """\[(\d+),""".r.findAllMatchIn(w.toString).map(_.group(1).toLong).toList
    assert(vals == List(2000000L, 1000000L)) // newest first (epoch µs)
  }

  test("chunked responses: newline-delimited, partial flags, lossless merge") {
    val e = new Engine(spark, sfDir)
    val meta = graft.ql.TableMeta("djc", "ts_us",
      tags = Seq("t"), fields = Seq(graft.ql.FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq(
      "djc,t=a v=1 1000000000", "djc,t=a v=2 2000000000",
      "djc,t=a v=3 3000000000", "djc,t=b v=4 4000000000"), "djc")
    val w = new java.io.StringWriter
    e.queryJsonChunked("SELECT v FROM djc GROUP BY t", w, chunkSize = 2)
    val lines = w.toString.split("\n").toSeq
    // series a (3 rows) → one partial chunk of 2 + one final chunk of 1;
    // series b (1 row) → one final chunk
    assert(lines.length == 3)
    assert(lines(0).contains("\"partial\":true") && lines(0).contains("\"t\":\"a\""))
    assert(!lines(1).contains("partial") && lines(1).contains("\"t\":\"a\""))
    assert(!lines(2).contains("partial") && lines(2).contains("\"t\":\"b\""))
    // every line is a complete results envelope (the reference's parseResp
    // unmarshals each line independently and concatenates Results)
    lines.foreach(l => assert(
      l.startsWith("""{"results":[{"statement_id":0,"series":[""") && l.endsWith("}]}")))
    // lossless: values across chunks == the unchunked stream's values
    val all = """\[(\d+),([\d.]+)\]""".r.findAllIn(w.toString).toList
    val wu = new java.io.StringWriter
    e.queryJsonStream("SELECT v FROM djc GROUP BY t", wu)
    assert(all == """\[(\d+),([\d.]+)\]""".r.findAllIn(wu.toString).toList)
    // empty result → the canonical empty envelope, one line
    val we = new java.io.StringWriter
    e.queryJsonChunked("SELECT v FROM djc WHERE t = 'zzz'", we, chunkSize = 2)
    assert(we.toString == "{\"results\":[{}]}\n")
  }

  test("queryJson is stream-backed and byte-identical to the buffered serializer") {
    val s = spark
    import s.implicits._
    val e = new Engine(spark, sfDir)
    // a raw multi-series SELECT — the shape that would have buffered the
    // whole result on the driver before the stream-first change
    val q = "SELECT count(value) FROM events GROUP BY event_type"
    val json = e.queryJson(q)
    val w = new java.io.StringWriter
    e.queryJsonStream(q, w)
    assert(json == w.toString) // queryJson IS the streamed path
    assert(json.startsWith("""{"results":[{"statement_id":0,"series":["""))
    assert(json.contains(""""tags":{"event_type":"""))
  }
}
