package graft.ql

import org.scalatest.funsuite.AnyFunSuite

/** Parser golden ASTs + error semantics (reference behaviors:
  * `service/query_handler_test.go`, `service/clusterql/parser_test.go`,
  * `service/admin_test.go`). */
class ParserSpec extends AnyFunSuite {

  private def sel(q: String): SelectStmt =
    Parser.parse(q).asInstanceOf[SelectStmt]

  test("minimal slice query parses (SURVEY §7.2 shape)") {
    val s = sel("SELECT mean(value) FROM treasures WHERE time <= now() AND (type = 'gold' OR type = 'trash') GROUP BY time(1d) LIMIT 1")
    assert(s.from == FromMeasurement("treasures"))
    assert(s.fields == List(Field(Call("mean", List(Ident("value"))), None)))
    assert(s.groupByTime.contains(86400000000L))
    assert(s.limit.contains(1))
    assert(s.where.isDefined)
  }

  test("durations convert to µs") {
    assert(Lexer.durationUs("5m") == 300000000L)
    assert(Lexer.durationUs("1h") == 3600000000L)
    assert(Lexer.durationUs("90s") == 90000000L)
    assert(Lexer.durationUs("1w") == 604800000000L)
    assert(Lexer.durationUs("10ms") == 10000L)
    assert(Lexer.durationUs("1500ns") == 1L)
  }

  test("fill variants, with and without comma separation") {
    assert(sel("SELECT sum(v) FROM m GROUP BY time(1h) fill(0)").fill == FillValue(0))
    assert(sel("SELECT sum(v) FROM m GROUP BY time(1h), fill(previous)").fill == FillPrevious)
    assert(sel("SELECT sum(v) FROM m GROUP BY time(1h), t fill(linear)").fill == FillLinear)
    assert(sel("SELECT sum(v) FROM m GROUP BY time(1h) fill(none)").fill == FillNone)
    assert(sel("SELECT sum(v) FROM m GROUP BY time(1h) fill(null)").fill == FillNull)
  }

  test("subquery FROM source and bucket offsets") {
    val s = sel("SELECT mean(cnt) FROM (SELECT count(v) AS cnt FROM m GROUP BY time(1h)) GROUP BY t")
    s.from match {
      case FromSubquery(sub) =>
        assert(sub.groupByTime.contains(3600000000L))
        assert(sub.fields.head.alias.contains("cnt"))
      case other => fail(s"expected subquery, got $other")
    }
    val o = sel("SELECT count(v) FROM m GROUP BY time(1d, 6h)")
    assert(o.groupByTime.contains(86400000000L))
    assert(o.groupByTimeOffset == 21600000000L)
  }

  test("GROUP BY * and tag lists") {
    assert(sel("SELECT mean(v) FROM m GROUP BY *").groupByAllTags)
    assert(sel("SELECT mean(v) FROM m GROUP BY time(5m), a, b").groupByTags == List("a", "b"))
  }

  test("LIMIT/OFFSET/SLIMIT/SOFFSET") {
    val s = sel("SELECT v FROM m LIMIT 10 OFFSET 5 SLIMIT 2 SOFFSET 1")
    assert(s.limit.contains(10) && s.offset.contains(5) &&
      s.slimit.contains(2) && s.soffset.contains(1))
  }

  test("operator precedence: a + b * c parses as a + (b * c)") {
    val s = sel("SELECT a + b * c FROM m")
    assert(s.fields.head.expr == Bin("+", Ident("a"), Bin("*", Ident("b"), Ident("c"))))
  }

  test("ORDER BY only supports time (influxql restriction)") {
    assert(sel("SELECT v FROM m ORDER BY time DESC").orderDesc)
    assertThrows[ParseException](Parser.parse("SELECT v FROM m ORDER BY v"))
  }

  test("quoted identifiers and string literals") {
    val s = sel("SELECT \"weird name\" FROM m WHERE tag = 'va lue'")
    assert(s.fields.head.expr == Ident("weird name"))
  }

  test("trailing garbage is rejected") {
    assertThrows[ParseException](Parser.parse("SELECT v FROM m garbage here"))
  }

  // ---- admin DSL (clusterql grammar, language.go:7-63; parse-error
  //      behavior asserted like parser_test.go:10-25)
  test("CREATE PARTITION KEY, both argument orders") {
    assert(Parser.parse("CREATE PARTITION KEY type,loc ON mydb") ==
      CreatePartitionKey(List("type", "loc"), "mydb", None))
    assert(Parser.parse("CREATE PARTITION KEY type ON mydb.treasures") ==
      CreatePartitionKey(List("type"), "mydb", Some("treasures")))
    assert(Parser.parse("CREATE PARTITION KEY ON mydb.treasures WITH type,loc") ==
      CreatePartitionKey(List("type", "loc"), "mydb", Some("treasures")))
  }

  test("SHOW/DROP PARTITION KEY, SHOW/REMOVE NODES") {
    assert(Parser.parse("SHOW PARTITION KEYS") == ShowPartitionKeys(None))
    assert(Parser.parse("SHOW PARTITION KEYS ON mydb") == ShowPartitionKeys(Some("mydb")))
    assert(Parser.parse("DROP PARTITION KEY ON mydb") == DropPartitionKey("mydb", None))
    assert(Parser.parse("SHOW NODES") == ShowNodes)
    assert(Parser.parse("REMOVE NODE node1") == RemoveNode("node1"))
  }

  test("SET REPLICATION FACTOR (statements.go:28-32, not in reference grammar — supported here)") {
    assert(Parser.parse("SET REPLICATION FACTOR 2") == SetReplicationFactor(2, None, None))
    assert(Parser.parse("SET REPLICATION FACTOR 3 ON db.m") ==
      SetReplicationFactor(3, Some("db"), Some("m")))
  }

  test("SHOW statements") {
    assert(Parser.parse("SHOW MEASUREMENTS") == ShowStmt("MEASUREMENTS", None))
    assert(Parser.parse("SHOW TAG KEYS") == ShowStmt("TAG KEYS", None))
    assert(Parser.parse("SHOW RETENTION POLICIES ON mydb") ==
      ShowStmt("RETENTION POLICIES", Some("mydb")))
    assert(Parser.parse("SHOW SERIES") == ShowStmt("SERIES", None))
  }

  test("auth statements parse (RouteAuthService grammar, routing.go:78-87)") {
    assert(Parser.parse("CREATE USER root WITH PASSWORD 'secret' WITH ALL PRIVILEGES") ==
      CreateUser("root", "secret", admin = true))
    assert(Parser.parse("CREATE USER peon WITH PASSWORD 'pw'") ==
      CreateUser("peon", "pw", admin = false))
    assert(Parser.parse("DROP USER peon") == DropUser("peon"))
    assert(Parser.parse("SET PASSWORD FOR root = 'new'") == SetPassword("root", "new"))
    assert(Parser.parse("GRANT READ ON db1 TO peon") == Grant("READ", "db1", "peon"))
    assert(Parser.parse("GRANT ALL PRIVILEGES ON db1 TO peon") == Grant("ALL", "db1", "peon"))
    assert(Parser.parse("REVOKE WRITE ON db1 FROM peon") == Revoke("WRITE", "db1", "peon"))
    assert(Parser.parse("SHOW USERS") == ShowStmt("USERS", None))
    assertThrows[ParseException](Parser.parse("GRANT SUDO ON db TO x"))
    assertThrows[ParseException](Parser.parse("CREATE USER x WITH PASSWORD unquoted"))
  }

  test("DELETE and DROP SERIES/MEASUREMENT parse (RouteToAll grammar)") {
    assert(Parser.parse("DELETE FROM m") == DeleteSeries("m", None))
    assert(Parser.parse("DROP MEASUREMENT m") == DropMeasurement("m"))
    Parser.parse("DROP SERIES FROM m WHERE t = 'v'") match {
      case DeleteSeries("m", Some(_)) => ()
      case other => fail(s"unexpected: $other")
    }
  }

  test("SHOW GRANTS FOR user / SHOW QUERIES / KILL QUERY (routing.go:110-133)") {
    assert(Parser.parse("SHOW GRANTS FOR peon") == ShowGrantsStmt("peon"))
    assert(Parser.parse("SHOW QUERIES") == ShowQueriesStmt)
    assert(Parser.parse("KILL QUERY 42") == KillQuery(42L))
    assertThrows[ParseException](Parser.parse("SHOW GRANTS")) // FOR required
    assertThrows[ParseException](Parser.parse("KILL QUERY abc"))
  }

  test("subscription DDL parses (routing.go:101-126 replication surface)") {
    assert(Parser.parse(
      """CREATE SUBSCRIPTION "sub0" ON "db"."autogen" DESTINATIONS ALL 'http://h1:9092', 'http://h2:9092'""") ==
      CreateSubscription("sub0", "db", "autogen", "ALL",
        List("http://h1:9092", "http://h2:9092")))
    assert(Parser.parse("CREATE SUBSCRIPTION s ON db.rp DESTINATIONS ANY 'udp://h:8089'") ==
      CreateSubscription("s", "db", "rp", "ANY", List("udp://h:8089")))
    assert(Parser.parse("""DROP SUBSCRIPTION "sub0" ON "db"."autogen"""") ==
      DropSubscription("sub0", "db", "autogen"))
    assert(Parser.parse("SHOW SUBSCRIPTIONS") == ShowStmt("SUBSCRIPTIONS", None))
    assertThrows[ParseException](Parser.parse("CREATE SUBSCRIPTION s ON db DESTINATIONS ALL 'u'"))
    assertThrows[ParseException](Parser.parse("CREATE SUBSCRIPTION s ON db.rp DESTINATIONS SOME 'u'"))
  }

  test("SHOW TAG VALUES WITH KEY = k") {
    assert(Parser.parse("SHOW TAG VALUES WITH KEY = event_type") ==
      ShowStmt("TAG VALUES", None, Some("event_type")))
    assert(Parser.parse("""SHOW TAG VALUES ON db WITH KEY = "type"""") ==
      ShowStmt("TAG VALUES", Some("db"), Some("type")))
    assert(Parser.parse("SHOW TAG VALUES") == ShowStmt("TAG VALUES", None, None))
  }

  test("SHOW ... FROM m restricts the meta scan") {
    assert(Parser.parse("SHOW TAG KEYS FROM events") ==
      ShowStmt("TAG KEYS", None, None, Some("events")))
    assert(Parser.parse("SHOW SERIES ON db FROM events") ==
      ShowStmt("SERIES", Some("db"), None, Some("events")))
    assert(Parser.parse("""SHOW TAG VALUES FROM events WITH KEY = "event_type"""") ==
      ShowStmt("TAG VALUES", None, Some("event_type"), Some("events")))
  }

  test("FROM m1, m2 parses to a multi-measurement source (query_merge.go:44-47 takes first only)") {
    assert(sel("SELECT count(v) FROM m1, m2, m3 GROUP BY t").from ==
      FromMulti(List("m1", "m2", "m3")))
    assert(sel("SELECT v FROM m1 WHERE x = 1").from == FromMeasurement("m1"))
  }

  test("regex field selection and regex measurement FROM (query_merge.go:128 TODO)") {
    val f = sel("SELECT /^val/ FROM events")
    assert(f.fields == List(Field(RegexLit("^val"), None)))
    assert(sel("SELECT mean(v) FROM /^ev/ GROUP BY t").from == FromMeasurementRegex("^ev"))
    // '/' after a complete operand is still division, not a regex
    val div = sel("SELECT sum(v) / 100 FROM m")
    assert(div.fields.head.expr == Bin("/", Call("sum", List(Ident("v"))), IntLit(100)))
  }

  test("parse errors carry a message naming the problem") {
    val e = intercept[ParseException](Parser.parse("SELECT FROM m"))
    assert(e.getMessage.nonEmpty)
    assertThrows[ParseException](Parser.parse("CREATE PARTITION KEY"))
    assertThrows[ParseException](Parser.parse("SELECT sum(v) FROM m GROUP BY time(xyz)"))
  }
}
