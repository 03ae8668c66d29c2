package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import LineProtocol._

/** Line-protocol vectors incl. escaping (public InfluxDB line-protocol
  * spec; usage at reference `service/write_handler.go:54-77`). */
class LineProtocolSpec extends AnyFunSuite {

  private def ok(l: String): Point = parseLine(l).toOption.get

  test("basic point with tags, fields, timestamp") {
    val p = ok("weather,location=us-midwest temperature=82 1465839830100400200")
    assert(p.measurement == "weather")
    assert(p.tags == Map("location" -> "us-midwest"))
    assert(p.fields == Map("temperature" -> FFloat(82.0)))
    assert(p.timeNs.contains(1465839830100400200L))
  }

  test("field types: float, int, bool, string") {
    val p = ok("""m f1=1.5,f2=42i,f3=true,f4="hello world"""")
    assert(p.fields("f1") == FFloat(1.5))
    assert(p.fields("f2") == FInt(42))
    assert(p.fields("f3") == FBool(true))
    assert(p.fields("f4") == FStr("hello world"))
  }

  test("escaped comma, space, equals in identifiers and tag values") {
    val p = ok("""wea\,ther,loc\ ation=us\=midwest temp=82""")
    assert(p.measurement == "wea,ther")
    assert(p.tags == Map("loc ation" -> "us=midwest"))
  }

  test("escaped quotes in string fields; commas inside quotes") {
    val p = ok("""m note="say \"hi\", friend" 1""")
    assert(p.fields("note") == FStr("""say "hi", friend"""))
  }

  test("no timestamp is allowed") {
    assert(ok("m v=1").timeNs.isEmpty)
  }

  test("malformed lines go to the error channel, not exceptions") {
    assert(parseLine("").isLeft)
    assert(parseLine("m").isLeft)                 // no fields
    assert(parseLine("m v=notanumber").isLeft)
    assert(parseLine("m v=1 2 3 4").isLeft)       // too many sections
    assert(parseLine(",=bad v=1").isLeft)
  }

  test("precision param scales timestamps to ns (/write?precision=)") {
    assert(precisionToNs("ns") == 1L)
    assert(precisionToNs("u") == 1000L)
    assert(precisionToNs("us") == 1000L)
    assert(precisionToNs("ms") == 1000000L)
    assert(precisionToNs("s") == 1000000000L)
    // the reference's /write accepts minute and hour precision too
    assert(precisionToNs("m") == 60000000000L)
    assert(precisionToNs("h") == 3600000000000L)
    assertThrows[IllegalArgumentException](precisionToNs("fortnight"))
  }

  test("serialize ∘ parse = identity (export path, importer.go:369-404)") {
    val p = Point("events", Map("event_type" -> "click"),
      Map("value" -> FFloat(55.75), "user_id" -> FInt(42)), Some(1704067200000000000L))
    assert(ok(serialize(p)) == p)
    val tricky = Point("m,1", Map("a b" -> "c=d"),
      Map("s" -> FStr("q\"uote"), "n" -> FFloat(1.0)), None)
    assert(ok(serialize(tricky)) == tricky)
  }
}
