package graft

import graft.ql.{FieldMeta, ParseException, TableMeta}

/** Full proxy-replacement lifecycle through the Engine facade: DDL, admin
  * DSL, line-protocol writes, InfluxQL reads over the written points, CQ
  * backfill INTO a new measurement, JSON responses — the end-to-end path a
  * reference user migrates onto (cmd/handle/main.go → Engine). */
class EngineSpec extends SparkSpec {

  private def newEngine = new Engine(spark, sfDir)

  test("database / retention-policy DDL lifecycle (importer.go:305-321 semantics)") {
    val e = newEngine
    e.execute("CREATE DATABASE mydb")
    e.execute("CREATE DATABASE mydb") // idempotent like InfluxDB
    assert(e.execute("SHOW DATABASES").collect().map(_.getString(0)).toSet == Set("default", "mydb"))

    e.execute("CREATE RETENTION POLICY oneweek ON mydb DURATION 1w REPLICATION 2 DEFAULT")
    val rps = e.execute("SHOW RETENTION POLICIES ON mydb").collect()
      .map(r => (r.getString(0), r.getBoolean(3))).toMap
    assert(rps("oneweek"))       // new default
    assert(!rps("autogen"))      // demoted
    assertThrows[e.databases.DuplicateException](
      e.execute("CREATE RETENTION POLICY oneweek ON mydb DURATION 1d REPLICATION 1"))
    assertThrows[e.databases.UnknownDatabaseException](
      e.execute("CREATE RETENTION POLICY x ON nodb DURATION 1d REPLICATION 1"))
    e.execute("DROP RETENTION POLICY oneweek ON mydb")
    assert(!e.execute("SHOW RETENTION POLICIES ON mydb").collect().map(_.getString(0)).contains("oneweek"))
    e.execute("DROP DATABASE mydb")
    assert(!e.execute("SHOW DATABASES").collect().map(_.getString(0)).contains("mydb"))
  }

  test("CREATE DATABASE WITH creates the initial default RP; ALTER RETENTION POLICY updates it") {
    val e = newEngine
    e.execute("CREATE DATABASE wdb WITH DURATION 3d REPLICATION 2 NAME keep3d")
    val rps = e.execute("SHOW RETENTION POLICIES ON wdb").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2), r.getBoolean(3))).toMap
    assert(rps("keep3d") == ((s"${3L * 86400000000L}us", 2, true)), rps)
    assert(!rps("autogen")._3) // demoted by the WITH default

    e.execute("ALTER RETENTION POLICY keep3d ON wdb DURATION 1d")
    val d2 = e.execute("SHOW RETENTION POLICIES ON wdb").collect()
      .find(_.getString(0) == "keep3d").get.getString(1)
    assert(d2 == s"${86400000000L}us")
    // promote autogen back via ALTER ... DEFAULT
    e.execute("ALTER RETENTION POLICY autogen ON wdb DEFAULT")
    val d3 = e.execute("SHOW RETENTION POLICIES ON wdb").collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(d3("autogen") && !d3("keep3d"))
    assertThrows[ql.ParseException](
      e.execute("ALTER RETENTION POLICY nope ON wdb DURATION 1d"))
  }

  test("write line protocol, read back with InfluxQL, respond as JSON") {
    val e = newEngine
    val meta = TableMeta("treasures", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("value", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    // the reference's test fixture, as wire-format writes (test_utils.go:60-76)
    val (n, bad) = e.writeLineProtocol(Seq(
      "treasures,type=gold value=100 1000000000",
      "treasures,type=silver value=50 2000000000",
      "treasures,type=trash value=0 3000000000",
      "this is not line protocol"), "treasures")
    assert(n == 3 && bad == 1) // malformed line dead-lettered, batch survives

    val rows = e.execute(
      "SELECT mean(value) FROM treasures WHERE type = 'gold' OR type = 'trash'").collect()
    assert(rows.head.getAs[Double]("mean") == 50.0) // query_handler_test.go:11-16

    val json = e.queryJson("SELECT mean(value) FROM treasures GROUP BY type")
    assert(json.contains(""""tags":{"type":"gold"}"""))
    assert(json.contains(""""columns":["mean"]""") || json.contains("100.0"))
  }

  test("continuous query: CREATE backfills INTO the target measurement") {
    val e = newEngine
    e.execute(
      """CREATE CONTINUOUS QUERY daily_mean ON default BEGIN
        |SELECT mean(value) INTO mean_events FROM events GROUP BY time(1d), event_type
        |END""".stripMargin)
    assert(e.execute("SHOW CONTINUOUS QUERIES").collect()
      .map(r => (r.getString(0), r.getString(1))).contains(("default", "daily_mean")))
    // the target measurement is immediately queryable (syncing/importer_test.go:64-67 analog)
    val out = e.execute("SELECT mean FROM mean_events").collect()
    assert(out.nonEmpty)
    e.execute("DROP CONTINUOUS QUERY daily_mean ON default")
    assert(e.execute("SHOW CONTINUOUS QUERIES").collect().isEmpty)
  }

  test("continuous query stays live: ingest into the source refreshes the target") {
    val e = newEngine
    val meta = TableMeta("cqsrc", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("value", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq("cqsrc,type=gold value=100 1000000000"), "cqsrc")
    e.execute(
      """CREATE CONTINUOUS QUERY live_sum ON default BEGIN
        |SELECT sum(value) INTO cq_target FROM cqsrc GROUP BY time(1d), type
        |END""".stripMargin)
    assert(e.execute("SELECT sum FROM cq_target").collect()
      .map(_.getAs[Double]("sum")).toSet == Set(100.0))
    // a new micro-batch into the SOURCE must show up in the TARGET
    // (the reference keeps CQs running on every node, importer.go:323-333)
    e.writeLineProtocol(Seq(
      "cqsrc,type=gold value=50 2000000000",
      "cqsrc,type=silver value=25 3000000000"), "cqsrc")
    val refreshed = e.execute("SELECT sum FROM cq_target").collect()
      .map(_.getAs[Double]("sum")).toSet
    assert(refreshed == Set(150.0, 25.0))
    // dropping the CQ stops the continuation
    e.execute("DROP CONTINUOUS QUERY live_sum ON default")
    e.writeLineProtocol(Seq("cqsrc,type=gold value=1 4000000000"), "cqsrc")
    assert(e.execute("SELECT sum FROM cq_target").collect()
      .map(_.getAs[Double]("sum")).toSet == Set(150.0, 25.0))
  }

  test("startCqStream: a registered CQ runs as a standing streaming job feeding its target") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val e = newEngine
    val meta = TableMeta("str_src", "ts_us", Seq("type"), Seq(FieldMeta("value", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq("str_src,type=gold value=1 1000000000"), "str_src")
    e.execute(
      """CREATE CONTINUOUS QUERY live5m ON default BEGIN
        |SELECT sum(value) INTO str_tgt FROM str_src GROUP BY time(5m), type
        |END""".stripMargin)
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = e.startCqStream("live5m", input.toDF().toDF("ts", "type", "value"))
    input.addData(
      (Timestamp.valueOf("2024-01-01 10:01:00"), "gold", 2.0),
      (Timestamp.valueOf("2024-01-01 10:02:00"), "gold", 3.0))
    q.processAllAvailable()
    // the INTO target reads the live sink through the normal InfluxQL path
    val out = e.execute("SELECT sum FROM str_tgt").collect()
    assert(out.map(_.getAs[Double]("sum")).contains(5.0))
    // lifecycle: close() stops the engine's standing streams
    assert(q.isActive)
    e.close()
    assert(!q.isActive)
    // unknown CQ name and unsupported shapes error cleanly
    assertThrows[ParseException](e.startCqStream("ghost", input.toDF()))
  }

  test("sustained ingest keeps a bounded plan (lineage compaction every 8 writes)") {
    val e = newEngine
    val meta = TableMeta("firehose", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("value", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    for (i <- 1 to 20)
      e.writeLineProtocol(Seq(s"firehose,type=a value=$i ${i}000000000"), "firehose")
    // all 20 points survive the compactions
    assert(e.execute("SELECT count(value) FROM firehose").head.getLong(0) == 20)
    // plan depth is bounded by writes-since-last-checkpoint, not total
    // writes: unions accumulated since the last localCheckpoint < 8
    val plan = e.execute("SELECT value FROM firehose").queryExecution.optimizedPlan
    val unions = plan.collect { case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
      .map(_.children.size).sum
    assert(unions < 8, s"expected < 8 accumulated union branches, got $unions")
  }

  test("SHOW GRANTS FOR user / SHOW QUERIES route (routing.go:43-58)") {
    val e = newEngine
    e.execute("CREATE USER root WITH PASSWORD 'pw' WITH ALL PRIVILEGES")
    e.execute("CREATE USER peon WITH PASSWORD 'pw'")
    e.execute("GRANT READ ON db1 TO peon")
    e.execute("GRANT ALL ON db2 TO peon")
    val grants = e.execute("SHOW GRANTS FOR peon").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(grants == Seq(("db1", "READ"), ("db2", "ALL")))
    assertThrows[e.users.AuthException](e.execute("SHOW GRANTS FOR ghost").collect())

    e.execute("SELECT mean(value) FROM events")
    val queries = e.execute("SHOW QUERIES").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(queries.map(_._2).contains("SELECT mean(value) FROM events"))

    // KILL QUERY removes the entry from the ring; unknown ids 400
    val id = queries.find(_._2 == "SELECT mean(value) FROM events").get._1
    e.execute(s"KILL QUERY $id")
    assert(!e.execute("SHOW QUERIES").collect().map(_.getLong(0)).contains(id))
    assertThrows[ParseException](e.execute("KILL QUERY 999999"))
  }

  test("multi-measurement FROM unions scans; SHOW meta includes registered measurements") {
    val e = newEngine
    val meta1 = TableMeta("vault_a", "ts_us", Seq("type"), Seq(FieldMeta("value", Some(100L))))
    val meta2 = TableMeta("vault_b", "ts_us", Seq("type"), Seq(FieldMeta("value", Some(100L))))
    e.registerMeasurement(meta1, spark.emptyDataFrame)
    e.registerMeasurement(meta2, spark.emptyDataFrame)
    e.writeLineProtocol(Seq("vault_a,type=gold value=100 1000000000"), "vault_a")
    e.writeLineProtocol(Seq("vault_b,type=gold value=50 2000000000"), "vault_b")
    // FROM m1, m2 scans both (the reference's merge layer reads only the first)
    assert(e.execute("SELECT sum(value) FROM vault_a, vault_b")
      .head.getAs[Double]("sum") == 150.0)
    // registered measurements are discoverable through the meta surface
    val shown = e.execute("SHOW MEASUREMENTS").collect().map(_.getString(0)).toSet
    assert(Set("events", "vault_a", "vault_b").subsetOf(shown))
    val tagKeys = e.execute("SHOW TAG KEYS").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(tagKeys.contains(("vault_a", "type")) && tagKeys.contains(("events", "event_type")))
    val fieldKeys = e.execute("SHOW FIELD KEYS").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(fieldKeys.contains(("vault_b", "value")))
    // FROM m restricts the meta scan; unknown measurement errors
    assert(e.execute("SHOW TAG KEYS FROM vault_a").collect()
      .map(_.getString(0)).toSet == Set("vault_a"))
    assertThrows[ParseException](e.execute("SHOW FIELD KEYS FROM ghost"))
  }

  test("subscription lifecycle: CREATE / SHOW / duplicate 409 / DROP") {
    val e = newEngine
    e.execute("CREATE DATABASE subs")
    e.execute("CREATE SUBSCRIPTION s0 ON subs.autogen DESTINATIONS ALL 'http://h1:9092'")
    e.execute("CREATE SUBSCRIPTION s1 ON subs.autogen DESTINATIONS ANY 'udp://h:8089'")
    val shown = e.execute("SHOW SUBSCRIPTIONS").collect()
      .map(r => (r.getString(2), r.getString(3), r.getString(4))).toSet
    assert(shown == Set(("s0", "ALL", "http://h1:9092"), ("s1", "ANY", "udp://h:8089")))
    assertThrows[e.databases.DuplicateException](
      e.execute("CREATE SUBSCRIPTION s0 ON subs.autogen DESTINATIONS ALL 'x'"))
    assertThrows[e.databases.UnknownDatabaseException](
      e.execute("CREATE SUBSCRIPTION s9 ON nodb.autogen DESTINATIONS ALL 'x'"))
    e.execute("DROP SUBSCRIPTION s0 ON subs.autogen")
    assert(e.execute("SHOW SUBSCRIPTIONS").collect().length == 1)
    assertThrows[ParseException](e.execute("DROP SUBSCRIPTION s0 ON subs.autogen"))
  }

  test("subscriptions fire: writes forward to destinations, DROP stops it, ANY round-robins") {
    val e = newEngine
    def tmp() = graft.TempDirs.scratch("graft_sub").toString
    def lp(d: String) = new java.io.File(d).listFiles().filter(_.getName.endsWith(".lp"))
    val meta = TableMeta("sm", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)

    val (d1, d2) = (tmp(), tmp())
    e.execute(s"CREATE SUBSCRIPTION fwd ON default.autogen DESTINATIONS ALL '$d1', '$d2'")
    val lines = Seq("sm,type=a v=1 1000000000", "sm,type=b v=2 2000000000")
    e.writeLineProtocol(lines, "sm")
    // ALL fans the batch out to every destination, body = the raw write
    assert(lp(d1).length == 1 && lp(d2).length == 1)
    assert(new String(java.nio.file.Files.readAllBytes(lp(d1).head.toPath), "UTF-8")
      == lines.mkString("\n"))

    e.execute("DROP SUBSCRIPTION fwd ON default.autogen")
    e.writeLineProtocol(Seq("sm,type=c v=3 3000000000"), "sm")
    assert(lp(d1).length == 1 && lp(d2).length == 1) // no new forwards

    val (d3, d4) = (tmp(), tmp())
    e.execute(s"CREATE SUBSCRIPTION lb ON default.autogen DESTINATIONS ANY '$d3', '$d4'")
    e.writeLineProtocol(Seq("sm,type=d v=4 4000000000"), "sm")
    e.writeLineProtocol(Seq("sm,type=e v=5 5000000000"), "sm")
    // ANY: each batch goes to exactly one destination, round-robin
    assert(lp(d3).length == 1 && lp(d4).length == 1)

    // a measurement bound to a different db.rp does not match default.autogen
    val meta2 = TableMeta("so", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta2, spark.emptyDataFrame)
    e.execute("CREATE DATABASE otherdb")
    e.setRetentionPolicy("so", "otherdb", "autogen")
    e.writeLineProtocol(Seq("so,type=a v=1 1000000000"), "so")
    assert(lp(d3).length + lp(d4).length == 2) // unchanged
  }

  test("typed line-protocol fields: int/bool/string land typed, survive restart, filter") {
    val dir = graft.TempDirs.scratch("graft_typed").toString
    val e = new Engine(spark, sfDir, Some(dir))
    // no registerMeasurement: schema (incl. field TYPES) is inferred
    val (n, bad) = e.writeLineProtocol(Seq(
      "sensor,loc=a temp=21.5,hits=3i,ok=true,note=\"fine\" 1000000000",
      "sensor,loc=b temp=19.0,hits=7i,ok=false,note=\"chill factor\" 2000000000"), "sensor")
    assert(n == 2 && bad == 0)
    val df = e.execute("SELECT * FROM sensor")
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("temp") == "double" && types("hits") == "long")
    assert(types("ok") == "boolean" && types("note") == "string")
    assert(e.execute("SELECT temp FROM sensor WHERE ok = true")
      .collect().map(_.getAs[Double]("temp")).toSeq == Seq(21.5))
    assert(e.execute("SELECT temp FROM sensor WHERE note = 'fine'")
      .collect().map(_.getAs[Double]("temp")).toSeq == Seq(21.5))
    assert(e.execute("SELECT sum(hits) FROM sensor").collect().head.getLong(0) == 10L)

    // restart: the meta file round-trips the field types, appends stay typed
    val e2 = new Engine(spark, sfDir, Some(dir))
    e2.writeLineProtocol(Seq(
      "sensor,loc=c temp=25.0,hits=1i,ok=true,note=\"warm\" 3000000000"), "sensor")
    val rows = e2.execute("SELECT * FROM sensor WHERE ok = true").collect()
    assert(rows.length == 2)
    val types2 = e2.execute("SELECT * FROM sensor").schema.fields
      .map(f => f.name -> f.dataType.typeName).toMap
    assert(types2("hits") == "long" && types2("ok") == "boolean" && types2("note") == "string")
  }

  test("declared-type conflicts null the field, not the batch (ANSI-safe)") {
    val e = newEngine
    e.writeLineProtocol(Seq(
      "tc,loc=a temp=21.5,hits=3i,ok=true,note=\"x\" 1000000000"), "tc")
    // float→integer, int→boolean conflicts null out; the widened string
    // column keeps the numeric literal; the batch itself succeeds
    val (n, bad) = e.writeLineProtocol(Seq(
      "tc,loc=b temp=19.0,hits=2.5,ok=3i,note=7 2000000000"), "tc")
    assert(n == 1 && bad == 0)
    val r = e.execute("SELECT * FROM tc WHERE loc = 'b'").collect().head
    assert(r.getAs[Double]("temp") == 19.0)
    assert(r.isNullAt(r.fieldIndex("hits")) && r.isNullAt(r.fieldIndex("ok")))
    assert(r.getAs[String]("note") == "7.0")
  }

  test("cardinality family counts written measurements, not just the catalog") {
    val e = newEngine
    e.writeLineProtocol(Seq(
      "cm,loc=a v=1 1000000000", "cm,loc=b v=2 2000000000"), "cm")
    assert(e.execute("SHOW MEASUREMENT CARDINALITY")
      .collect().head.getLong(0) >= 2) // events + cm
    val tv = e.execute("SHOW TAG VALUES EXACT CARDINALITY WITH KEY = loc")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(tv("cm") == 2L)
    val sc = e.execute("SHOW SERIES CARDINALITY FROM cm").collect().head.getLong(0)
    assert(sc == 2L)
  }

  test("qualified INTO db.rp.m binds the target to that retention policy") {
    val e = newEngine
    e.registerMeasurement(TableMeta("qi", "ts_us",
      tags = Seq("t"), fields = Seq(FieldMeta("v", Some(100L)))), spark.emptyDataFrame)
    e.writeLineProtocol(Seq("qi,t=a v=1 1000000000"), "qi")
    e.execute("CREATE DATABASE qdb")
    e.execute("CREATE RETENTION POLICY keep1h ON qdb DURATION 1h REPLICATION 1")
    e.nowUs = () => 2000000L // pin the clock just past the 1s point
    e.execute("SELECT mean(v) INTO qdb.keep1h.qi_agg FROM qi GROUP BY time(1m)")
    assert(e.execute("SELECT * FROM qi_agg").collect().length == 1)
    // the binding is live: advancing the clock past the RP expires the rows
    e.nowUs = () => 1000000L + 2L * 3600L * 1000000L // 2h past the point
    assert(e.execute("SELECT * FROM qi_agg").collect().isEmpty)
    // unqualified sibling stays on default.autogen (infinite retention)
    assert(e.execute("SELECT v FROM qi").collect().length == 1)
    // unknown db → the reference's 404-shaped error
    assertThrows[e.databases.UnknownDatabaseException](
      e.execute("SELECT mean(v) INTO nodb.rp.x FROM qi GROUP BY time(1m)"))
    // the qualified INTO round-trips through render∘parse (catalog text)
    val sel = graft.ql.Parser
      .parse("SELECT mean(v) INTO qdb.keep1h.qi_agg FROM qi GROUP BY time(1m)")
      .asInstanceOf[graft.ql.SelectStmt]
    assert(graft.ql.Parser.parse(graft.ql.Render.select(sel)) == sel)
  }

  test("CQ RESAMPLE: EVERY throttles on event time, FOR widens the window, survives restart") {
    val dir = graft.TempDirs.scratch("graft_resample").toString
    val e = new Engine(spark, sfDir, Some(dir))
    e.registerMeasurement(TableMeta("rs", "ts_us",
      tags = Seq("t"), fields = Seq(FieldMeta("v", Some(100L)))), spark.emptyDataFrame)
    e.writeLineProtocol(Seq("rs,t=a v=1 60000000000"), "rs") // t = 1m
    e.execute("CREATE CONTINUOUS QUERY rcq ON default RESAMPLE EVERY 2m FOR 10m BEGIN " +
      "SELECT mean(v) INTO rs_1m FROM rs GROUP BY time(1m) END")
    def tgt() = e.execute("SELECT * FROM rs_1m").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("mean"))).toMap
    assert(tgt() == Map(60000000L -> 1.0)) // creation backfill

    // first continuation write: no last-run mark → recomputes immediately
    e.writeLineProtocol(Seq("rs,t=a v=2 120000000000"), "rs") // t = 2m
    assert(tgt() == Map(60000000L -> 1.0, 120000000L -> 2.0))

    // only 1m past the last run → deferred into the dirty span
    e.writeLineProtocol(Seq("rs,t=a v=3 180000000000"), "rs") // t = 3m
    assert(tgt() == Map(60000000L -> 1.0, 120000000L -> 2.0)) // EVERY not elapsed

    // crosses EVERY → recompute covers the dirty span + the FOR window
    e.writeLineProtocol(Seq("rs,t=a v=4 240000000000"), "rs") // t = 4m
    assert(tgt() == Map(60000000L -> 1.0, 120000000L -> 2.0,
      180000000L -> 3.0, 240000000L -> 4.0))

    // the schedule is durable: a restarted engine shows the full clause
    val e2 = new Engine(spark, sfDir, Some(dir))
    val shown = e2.execute("SHOW CONTINUOUS QUERIES").collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    assert(shown("rcq").contains("RESAMPLE EVERY 2m FOR 10m"))
    assert(shown("rcq").contains("BEGIN SELECT mean(v) INTO rs_1m FROM rs GROUP BY time(1m) END"))
  }

  test("http subscriptions POST to the /write endpoint; failures spool and replay") {
    import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
    val received = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    def serve(): HttpServer = {
      val s = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
      s.createContext("/write", new HttpHandler {
        def handle(x: HttpExchange): Unit = {
          val body = new String(x.getRequestBody.readAllBytes(), "UTF-8")
          received.add((x.getRequestURI.toString, body))
          x.sendResponseHeaders(204, -1); x.close()
        }
      })
      s.start(); s
    }
    val srv = serve()
    val dir = graft.TempDirs.scratch("graft_subhttp").toString
    val e = new Engine(spark, sfDir, Some(dir))
    e.registerMeasurement(TableMeta("hm", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L)))), spark.emptyDataFrame)
    val port = srv.getAddress.getPort
    e.execute(s"CREATE SUBSCRIPTION web ON default.autogen DESTINATIONS ALL 'http://127.0.0.1:$port'")

    val lines = Seq("hm,type=a v=1 1000000000", "hm,type=b v=2 2000000000")
    e.writeLineProtocol(lines, "hm")
    val got = received.poll()
    assert(got != null && received.isEmpty)
    assert(got._1 == "/write?db=default&rp=autogen&precision=ns")
    assert(got._2 == lines.mkString("\n"))

    // server down: the batch spools under dataDir/_subs/pending instead
    srv.stop(0)
    e.writeLineProtocol(Seq("hm,type=c v=3 3000000000"), "hm")
    val pending = new java.io.File(s"$dir/_subs/pending")
    def spooled() = pending.listFiles().filter(_.getName.endsWith(".lp"))
    assert(spooled().length == 1)

    // server back (same port): replay delivers and clears the spool
    val srv2 = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    srv2.createContext("/write", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        received.add((x.getRequestURI.toString, new String(x.getRequestBody.readAllBytes(), "UTF-8")))
        x.sendResponseHeaders(204, -1); x.close()
      }
    })
    srv2.start()
    try {
      assert(e.retrySubscriptionBacklog() == 1)
      assert(spooled().isEmpty)
      val replayed = received.poll()
      assert(replayed._2 == "hm,type=c v=3 3000000000")
      assert(e.retrySubscriptionBacklog() == 0) // idempotent when empty
    } finally srv2.stop(0)
  }

  test("concurrent writes and DDL do not corrupt state (TrieMap + tmp-rename catalog)") {
    val dir = graft.TempDirs.scratch("graft_conc").toString
    val e = new Engine(spark, sfDir, Some(dir))
    val ms = (0 until 4).map(i => s"cm$i")
    ms.foreach { m =>
      e.registerMeasurement(TableMeta(m, "ts_us",
        tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L)))), spark.emptyDataFrame)
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val work = ms.zipWithIndex.map { case (m, i) => Future {
      (1 to 5).foreach { k =>
        e.writeLineProtocol(Seq(s"$m,type=t$k v=$k ${(i * 100 + k).toLong * 1000000000}"), m)
      }
      e.execute(s"CREATE RETENTION POLICY rp_$m ON default DURATION 30d REPLICATION 1")
    }}
    Await.result(Future.sequence(work), 5.minutes)
    ms.foreach(m => assert(e.execute(s"SELECT v FROM $m").collect().length == 5))
    val rps = e.execute("SHOW RETENTION POLICIES ON default").collect().map(_.getString(0)).toSet
    ms.foreach(m => assert(rps.contains(s"rp_$m")))
    // the concurrently-written catalog restores complete on a fresh engine
    val e2 = new Engine(spark, sfDir, Some(dir))
    val rps2 = e2.execute("SHOW RETENTION POLICIES ON default").collect().map(_.getString(0)).toSet
    ms.foreach(m => assert(rps2.contains(s"rp_$m")))
    ms.foreach(m => assert(e2.execute(s"SELECT v FROM $m").collect().length == 5))
  }

  test("gzip write bodies decompress to the identical write path") {
    val e = newEngine
    val meta = TableMeta("gz", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    val body = "gz,type=a v=1.5 1000000000\ngz,type=b v=2.25 2000000000\nnot a line"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.GZIPOutputStream(bos)
    z.write(body.getBytes("UTF-8")); z.close()
    val (ok, bad) = e.writeLineProtocolGzip(bos.toByteArray, "gz")
    assert(ok == 2 && bad == 1) // dead-letter channel works through gzip too
    assert(e.execute("SELECT v FROM gz").collect()
      .map(_.getAs[Double]("v")).toSet == Set(1.5, 2.25))
  }

  test("credentialed writes: 401 on bad password, 403 without WRITE, open pre-bootstrap") {
    val e = newEngine
    val meta = TableMeta("wa", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    // no users yet → open, like the reference before the first admin
    assert(e.writeLineProtocolAs("anon", "x", Seq("wa,type=a v=1 1000000000"), "wa")._1 == 1L)
    e.execute("CREATE USER root WITH PASSWORD 'pw' WITH ALL PRIVILEGES")
    e.execute("CREATE USER scribe WITH PASSWORD 's3'")
    // bad password → the 401
    val e401 = intercept[RuntimeException](
      e.writeLineProtocolAs("root", "wrong", Seq("wa,type=a v=2 2000000000"), "wa"))
    assert(e401.getMessage.contains("authentication failed"))
    // authenticated but no WRITE grant → the 403
    val e403 = intercept[RuntimeException](
      e.writeLineProtocolAs("scribe", "s3", Seq("wa,type=a v=2 2000000000"), "wa"))
    assert(e403.getMessage.contains("forbidden to write"))
    e.execute("GRANT WRITE ON default TO scribe")
    assert(e.writeLineProtocolAs("scribe", "s3", Seq("wa,type=a v=2 2000000000"), "wa")._1 == 1L)
    assert(e.execute("SELECT v FROM wa").collect().length == 2)
  }

  test("CQ without INTO is rejected at parse time") {
    val e = newEngine
    assertThrows[ParseException](e.execute(
      "CREATE CONTINUOUS QUERY bad ON default BEGIN SELECT mean(value) FROM events GROUP BY time(1h) END"))
  }

  test("admin DSL routes through the same entry point") {
    val e = newEngine
    e.execute("CREATE PARTITION KEY event_type ON default.events")
    val keys = e.execute("SHOW PARTITION KEYS").collect()
    assert(keys.length == 1 && keys.head.getString(2) == "event_type")
    e.execute("SET REPLICATION FACTOR 3 ON default.events")
    assert(e.replication.get(Some("default"), Some("events")) == 3)
  }

  test("DELETE FROM / DROP SERIES / DROP MEASUREMENT (routing.go RouteToAll)") {
    val e = newEngine
    val meta = TableMeta("treasures", "ts_us",
      tags = Seq("type"), fields = Seq(FieldMeta("value", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq(
      "treasures,type=gold value=100 1000000000",
      "treasures,type=silver value=50 2000000000",
      "treasures,type=trash value=0 3000000000"), "treasures")

    e.execute("DROP SERIES FROM treasures WHERE type = 'trash'")
    assert(e.execute("SELECT count(value) FROM treasures").head.getLong(0) == 2)

    e.execute("DELETE FROM treasures WHERE time < '1970-01-01 00:00:02'")
    assert(e.execute("SELECT count(value) FROM treasures").head.getLong(0) == 1)

    e.execute("DELETE FROM treasures") // full truncate
    assert(e.execute("SELECT count(value) FROM treasures").head.getLong(0) == 0)

    e.execute("DROP MEASUREMENT treasures")
    assertThrows[graft.ql.ParseException](e.execute("SELECT count(value) FROM treasures"))
  }

  test("line-protocol writes into a rawTimeNs measurement stay time-queryable (regression)") {
    val e = newEngine
    val meta = TableMeta("rt", "ts_us", Seq("type"),
      Seq(FieldMeta("value", Some(100L))), rawTimeNs = Some("ts_ns"))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq(
      "rt,type=a value=1 1000000000000",
      "rt,type=b value=2 2000000000000"), "rt")
    // time predicate forces resolution of the raw ns pushdown column
    // (points are at epoch 1000s and 2000s; split at 1500s)
    val out = e.execute("SELECT value FROM rt WHERE time >= '1970-01-01 00:25:00'").collect()
    assert(out.length == 1 && out.head.getAs[Double]("value") == 2.0)
  }

  test("KILL QUERY cancels the running Spark jobs of a proxied query") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val e = newEngine
    // a deliberately huge scan: 50B-row range sum takes tens of seconds,
    // cancellation lands mid-flight
    import org.apache.spark.sql.functions.{col => c}
    val big = spark.range(50000000000L)
      .select(c("id").as("ts_us"), (c("id") % 100).cast("double").as("v"))
    e.registerMeasurement(TableMeta("big_kill", "ts_us", Seq(), Seq(FieldMeta("v", None))), big)

    val fut = Future(e.queryJson("SELECT sum(v) FROM big_kill"))
    // wait until the query registers in the ring, then kill it by qid
    val deadline = System.currentTimeMillis() + 30000
    var qid = -1L
    while (qid < 0 && System.currentTimeMillis() < deadline) {
      val rows = e.execute("SHOW QUERIES").collect()
      rows.find(_.getString(1).contains("big_kill")).foreach(r => qid = r.getLong(0))
      if (qid < 0) Thread.sleep(100)
    }
    assert(qid > 0, "query never appeared in SHOW QUERIES")
    e.execute(s"KILL QUERY $qid")
    val err = intercept[Exception](Await.result(fut, 90.seconds))
    val msg = err.toString + Option(err.getCause).map(_.toString).getOrElse("")
    assert(msg.toLowerCase.contains("cancel"), msg)
    // the ring no longer lists it
    assert(!e.execute("SHOW QUERIES").collect().exists(_.getLong(0) == qid))
  }

  test("multi-statement request: results accumulate per statement") {
    val e = newEngine
    val out = e.executeAll(
      "CREATE DATABASE multi; SHOW DATABASES; SELECT mean(value) FROM events")
    assert(out.length == 3)
    assert(out(1).collect().map(_.getString(0)).contains("multi"))
    assert(out(2).columns.contains("mean"))
  }

  test("write precision scales incoming timestamps (/write?precision= analog)") {
    val e = newEngine
    val meta = TableMeta("prec", "ts_us",
      tags = Seq("t"), fields = Seq(FieldMeta("v", Some(100L))))
    e.registerMeasurement(meta, spark.emptyDataFrame)
    e.writeLineProtocol(Seq("prec,t=a v=1 5"), "prec", precision = "s")
    e.writeLineProtocol(Seq("prec,t=b v=2 7"), "prec", precision = "ms")
    e.writeLineProtocol(Seq("prec,t=c v=3 9"), "prec", precision = "u")
    e.writeLineProtocol(Seq("prec,t=d v=4 11000"), "prec") // ns default
    val rows = e.execute("SELECT v FROM prec").collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("v"))).toSet
    assert(rows == Set((5000000L, 1.0), (7000L, 2.0), (9L, 3.0), (11L, 4.0)))
  }

  test("SELECT INTO registers every output column as a field") {
    val e = newEngine
    e.execute("SELECT mean(value), max(value) INTO mm_target FROM events GROUP BY time(1d), event_type")
    val fk = e.execute("SHOW FIELD KEYS FROM mm_target").collect()
      .map(_.getString(1)).toSet
    assert(fk == Set("mean", "max")) // round-4 defect: only `max` survived
    val out = e.execute("SELECT mean, max FROM mm_target").collect()
    assert(out.nonEmpty && out.forall(r => !r.isNullAt(r.fieldIndex("mean"))))
  }

  test("proxy-path queries are visible to SHOW QUERIES") {
    val e = newEngine
    e.queryJson("SELECT count(value) FROM events GROUP BY event_type")
    val sw = new java.io.StringWriter
    e.queryJsonStream("SELECT sum(value) FROM events GROUP BY event_type", sw)
    val qs = e.execute("SHOW QUERIES").collect().map(_.getString(1))
    assert(qs.exists(_.contains("count(value)")))
    assert(qs.exists(_.contains("sum(value)")))
  }

  test("retention cutoff arithmetic (RP expiry maintenance)") {
    val e = newEngine
    e.execute("CREATE DATABASE ttl")
    e.execute("CREATE RETENTION POLICY short ON ttl DURATION 1h REPLICATION 1")
    val nowUs = 10000000000L
    assert(e.databases.retentionCutoffUs("ttl", "short", nowUs).contains(nowUs - 3600000000L))
    assert(e.databases.retentionCutoffUs("ttl", "autogen", nowUs).isEmpty) // infinite
  }
}
