package graft.ql

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: every generated SELECT either EXECUTES through the full
  * parse→translate→Catalyst pipeline or fails with the dialect's
  * defined user error (`ParseException` — the HTTP 400 class). Any
  * other throwable (MatchError, AnalysisException, NPE) is a
  * translator binding bug this property exists to catch: the fixed
  * specs cover known shapes, the generator walks the combinatorial
  * space between them. */
class TranslatorPropSpec extends SparkSpec {

  private def check(name: String, prop: Prop, n: Int = 120): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private lazy val engine = {
    val e = new graft.Engine(spark, "/root/testdata/sf0.001")
    e.registerMeasurement(
      TableMeta("cpu", "ts_us", tags = Seq("host", "region"),
        fields = Seq(FieldMeta("value", None), FieldMeta("v", None),
          FieldMeta("usage_idle", None))),
      spark.emptyDataFrame)
    e.writeLineProtocol((0 until 40).map { i =>
      s"cpu,host=h${i % 3},region=r${i % 2} value=${i}.5,v=${i},usage_idle=0.$i ${1700000000L * 1000000000L + i * 60000000000L}"
    }, "cpu")
    e
  }

  private val field = Gen.oneOf("value", "v", "usage_idle")
  private val tag = Gen.oneOf("host", "region")
  private val agg = Gen.oneOf("mean", "sum", "count", "min", "max",
    "stddev", "median", "mode", "spread", "first", "last")
  private val transform = Gen.oneOf("derivative", "difference",
    "cumulative_sum", "non_negative_derivative")
  private val dur = Gen.oneOf("10s", "5m", "1h", "12m", "1d")
  private val num = Gen.oneOf("1", "2.5", "0", "100")

  // "bogus"/"ghost" are names the measurement does NOT declare: the
  // dialect answers those with an empty 200 result, so the generated
  // space must include them (the lenient-identifier path is translator
  // code like any other and crashes there are real bugs)
  private val anyName = Gen.frequency(6 -> field, 1 -> Gen.oneOf("bogus", "ghost"))

  // aliases deliberately include the group-by tag names and declared
  // field names — `mean(v) AS host … GROUP BY host` must rename, not die
  private val aliasClause: Gen[String] = Gen.frequency(
    5 -> Gen.const(""),
    1 -> Gen.oneOf(" AS x", " AS host", " AS region", " AS value", " AS mean"))

  private val fieldExpr: Gen[String] = for {
    e <- Gen.frequency(
      3 -> anyName,
      4 -> (for { a <- agg; f <- anyName } yield s"$a($f)"),
      1 -> (for { a <- agg; f <- field; n <- num } yield s"$a($f) * $n + 1"),
      1 -> (for { t <- transform; a <- agg; f <- field } yield s"$t($a($f))"),
      1 -> (for { f <- field; p <- Gen.oneOf("90", "50") } yield s"percentile($f, $p)"),
      1 -> (for { f <- field; k <- Gen.choose(1, 3) } yield s"top($f, $k)"))
    al <- aliasClause
  } yield s"$e$al"

  private val wherePred: Gen[String] = Gen.frequency(
    3 -> (for { t <- Gen.frequency(4 -> tag, 1 -> Gen.const("bogus"))
                v <- Gen.oneOf("h0", "h1", "r0", "nope") } yield s"$t = '$v'"),
    2 -> (for { f <- anyName; op <- Gen.oneOf(">", "<", ">=", "!="); n <- num }
      yield s"$f $op $n"),
    // ident-vs-ident, either side possibly unknown and possibly a
    // case-variant of a declared name (Value/HOST): the null bind must
    // type from the known side's declared type and must never clobber
    // the real column through case-insensitive resolution
    1 -> (for {
      l <- Gen.frequency(3 -> anyName, 2 -> tag,
        1 -> Gen.oneOf("Value", "HOST"))
      r <- Gen.frequency(3 -> anyName, 2 -> tag,
        1 -> Gen.oneOf("Value", "HOST"))
      op <- Gen.oneOf("=", "!=")
    } yield s"$l $op $r"),
    2 -> dur.map(d => s"time > now() - $d"),
    1 -> Gen.frequency(4 -> tag, 1 -> Gen.const("ghost")).map(t => s"$t =~ /h[0-9]+/"))

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
    1 -> (for { l <- Gen.choose(1, 10); o <- Gen.choose(0, 3) }
      yield s" LIMIT $l OFFSET $o"),
    1 -> Gen.choose(1, 3).map(l => s" SLIMIT $l"))

  private val tzClause: Gen[String] = Gen.frequency(
    5 -> Gen.const(""),
    1 -> Gen.oneOf(" tz('America/New_York')", " tz('UTC')"))

  private val flatQuery: Gen[String] = for {
    fs <- Gen.nonEmptyListOf(fieldExpr).map(_.take(2).distinct)
    w <- whereClause
    g <- groupClause
    f <- fillClause
    t <- tailClause
    z <- tzClause
    fill = if (g.contains("time(")) f else ""
    tz = if (g.contains("time(")) z else ""
  } yield s"SELECT ${fs.mkString(", ")} FROM cpu$w$g$fill$tz$t"

  // subquery shape: outer aggregates over an inner projection alias —
  // inner field sometimes unknown, inner alias sometimes a tag name
  private val subQuery: Gen[String] = for {
    a <- agg
    f <- Gen.frequency(5 -> Gen.const("value"), 1 -> Gen.const("bogus"))
    al <- Gen.frequency(4 -> Gen.const("vv"), 1 -> Gen.const("host"))
    inner <- wherePred
    g <- Gen.frequency(1 -> Gen.const(""), 2 -> dur.map(d => s" GROUP BY time($d)"))
  } yield s"SELECT $a($al) FROM (SELECT $f AS $al FROM cpu WHERE $inner)$g"

  private val queryGen: Gen[String] =
    Gen.frequency(5 -> flatQuery, 1 -> subQuery)

  test("generated SELECTs execute or fail with the defined user error") {
    engine // force registration before the prop loop
    check("translate-or-400", Prop.forAll(queryGen) { q =>
      try { engine.execute(q).collect(); true }
      catch {
        case _: ParseException => true // the 400 class (bare field + interval, mixes, ...)
        case e: Throwable =>
          println(s"CRASH CLASS ${e.getClass.getName} for: $q\n  ${e.getMessage}")
          false
      }
    })
  }
}
