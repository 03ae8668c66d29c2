package graft.ql

import org.scalatest.funsuite.AnyFunSuite

/** Render is the inverse of Parser for parser-produced ASTs — the property
  * the durable metadata catalog relies on to persist CQ definitions as text
  * (the reference stores CQ statements in InfluxDB meta and replays them,
  * syncing/importer.go:310-333). */
class RenderSpec extends AnyFunSuite {

  private def roundTrip(q: String): Unit = {
    val ast = Parser.parse(q)
    val rendered = ast match {
      case s: SelectStmt => Render.select(s)
      case other         => fail(s"not a SELECT: $other")
    }
    assert(Parser.parse(rendered) == ast, s"\n  in:  $q\n  out: $rendered")
  }

  test("render∘parse is identity across the SELECT surface") {
    Seq(
      "SELECT value FROM cpu",
      "SELECT mean(value) FROM cpu WHERE time >= 1000000 AND time < 2000000 GROUP BY time(5m)",
      "SELECT mean(value) AS m, max(value) FROM cpu GROUP BY time(1h), host fill(0)",
      "SELECT percentile(value, 90) FROM cpu GROUP BY time(30m, 5m) fill(previous)",
      "SELECT derivative(mean(value), 10s) FROM cpu GROUP BY time(10s)",
      "SELECT value FROM cpu WHERE host = 'a' OR (host = 'b' AND value > 1.5)",
      "SELECT value FROM cpu WHERE host =~ /web[0-9]+/ AND time > now() - 1h",
      "SELECT * FROM cpu GROUP BY * ORDER BY time DESC LIMIT 10 OFFSET 2 SLIMIT 3 SOFFSET 1",
      "SELECT value * 2 + 1 FROM cpu",
      "SELECT (value + 1) * 2 FROM cpu",
      "SELECT value FROM cpu, mem",
      "SELECT value FROM /cpu.*/",
      "SELECT mean(v) FROM (SELECT value AS v FROM cpu WHERE value > 0) GROUP BY time(1m) fill(linear)",
      "SELECT mean(value) INTO cpu_1h FROM cpu GROUP BY time(1h), host fill(null)",
      "SELECT count(distinct(value)) FROM cpu GROUP BY time(12m)",
      "SELECT value FROM cpu WHERE time >= '2019' AND value != 3.25",
      "SELECT top(value, 3), host FROM cpu",
      "SELECT value FROM cpu WHERE v % 2 = 0 AND v / 2 > 1",
      "SELECT mean(value) FROM cpu GROUP BY time(1d), host tz('America/New_York')",
      "SELECT value::field, host::tag, value::integer FROM cpu WHERE host::tag = 'a'",
      "SELECT *::field FROM cpu",
      "SELECT *::tag FROM cpu"
    ).foreach(roundTrip)
  }

  test("rendered durations pick the largest even unit") {
    assert(Render.duration(3600000000L) == "1h")
    assert(Render.duration(90000000L) == "90s") // 1.5m isn't a duration token
    assert(Render.duration(1000L) == "1ms")
    assert(Render.duration(0L) == "0s")
  }

  test("quoted identifiers survive the round trip") {
    roundTrip("SELECT \"weird name\" FROM cpu WHERE \"tag-x\" = 'v'")
  }
}
