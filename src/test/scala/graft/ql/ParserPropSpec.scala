package graft.ql

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: parse ∘ render ∘ parse = parse over GENERATED InfluxQL
  * SELECTs — the fixed RenderSpec corpus plus randomized composition of
  * the whole front-end surface (aggregates, transforms, arithmetic,
  * WHERE shapes, GROUP BY time with offset/tz, fill, sort/limits). The
  * durable metadata catalog persists CQ/INTO statements as rendered
  * text, so any AST a parse can produce must survive the round trip.
  * Raw scalacheck (the scalatest bridge isn't in the offline cache). */
class ParserPropSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val meas = Gen.oneOf("cpu", "mem", "disk_io", "m1")
  private val field = Gen.oneOf("value", "v", "usage_idle")
  private val tag = Gen.oneOf("host", "region")
  private val agg = Gen.oneOf("mean", "sum", "count", "min", "max",
    "stddev", "median", "mode", "spread", "first", "last")
  private val transform = Gen.oneOf("derivative", "difference",
    "cumulative_sum", "non_negative_derivative")
  private val dur = Gen.oneOf("10s", "5m", "1h", "12m", "1d")
  private val num = Gen.oneOf("1", "2.5", "0", "100", "3.25")

  private val fieldExpr: Gen[String] = Gen.frequency(
    3 -> field,
    3 -> (for { a <- agg; f <- field } yield s"$a($f)"),
    1 -> (for { f <- field; n <- num } yield s"$f * $n + 1"),
    1 -> (for { t <- transform; a <- agg; f <- field } yield s"$t($a($f))"),
    1 -> (for { f <- field; p <- Gen.oneOf("90", "50", "99.9") }
      yield s"percentile($f, $p)"))

  private val wherePred: Gen[String] = Gen.frequency(
    3 -> (for { t <- tag; v <- Gen.alphaStr.map(_.take(4)) } yield s"$t = '$v'"),
    2 -> (for { f <- field; op <- Gen.oneOf(">", "<", ">=", "!="); n <- num }
      yield s"$f $op $n"),
    2 -> (for { d <- dur } yield s"time > now() - $d"),
    1 -> (for { t <- tag } yield s"$t =~ /web[0-9]+/"))

  private val whereClause: Gen[String] = Gen.frequency(
    1 -> Gen.const(""),
    2 -> wherePred.map(p => s" WHERE $p"),
    1 -> (for { a <- wherePred; b <- wherePred; c <- Gen.oneOf("AND", "OR") }
      yield s" WHERE $a $c $b"))

  private val groupClause: Gen[String] = Gen.frequency(
    2 -> Gen.const(""),
    2 -> dur.map(d => s" GROUP BY time($d)"),
    1 -> (for { d <- dur; o <- dur } yield s" GROUP BY time($d, $o)"),
    1 -> (for { d <- dur; t <- tag } yield s" GROUP BY time($d), $t"),
    1 -> tag.map(t => s" GROUP BY $t"))

  private val fillClause: Gen[String] = Gen.frequency(
    3 -> Gen.const(""),
    1 -> Gen.oneOf(" fill(0)", " fill(null)", " fill(previous)",
      " fill(linear)", " fill(none)"))

  private val tailClause: Gen[String] = Gen.frequency(
    3 -> Gen.const(""),
    1 -> Gen.const(" ORDER BY time DESC"),
    1 -> (for { l <- Gen.choose(1, 20); o <- Gen.choose(0, 5) }
      yield s" LIMIT $l OFFSET $o"),
    1 -> (for { l <- Gen.choose(1, 5) } yield s" SLIMIT $l"))

  private val selectGen: Gen[String] = for {
    fs <- Gen.nonEmptyListOf(fieldExpr).map(_.take(3).distinct)
    m <- meas
    w <- whereClause
    g <- groupClause
    f <- fillClause
    t <- tailClause
    // fill only legal with GROUP BY time in our dialect when rendered
    fill = if (g.contains("time(")) f else ""
  } yield s"SELECT ${fs.mkString(", ")} FROM $m$w$g$fill$t"

  test("parse ∘ render ∘ parse = parse on generated SELECTs") {
    check("roundtrip", Prop.forAll(selectGen) { q =>
      Parser.parse(q) match {
        case s: SelectStmt =>
          val rendered = Render.select(s)
          val again = Parser.parse(rendered)
          if (again != s) {
            println(s"MISMATCH\n  in:  $q\n  out: $rendered")
            false
          } else true
        case other => println(s"not a SELECT for: $q -> $other"); false
      }
    })
  }
}
