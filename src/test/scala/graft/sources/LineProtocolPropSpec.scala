package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import LineProtocol._

/** Property: serialize ∘ parse = identity for arbitrary points, including
  * hostile identifiers (the escaping rules are the line-protocol contract —
  * a single missed escape corrupts ingested data silently). Runs raw
  * scalacheck (the scalatest bridge artifact isn't in the offline cache). */
class LineProtocolPropSpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // identifiers/tag values: non-empty printable ASCII incl. the chars that
  // need escaping (space, comma, equals) but not backslash/quotes (matches
  // the line-protocol accepted charset)
  private val identChar = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', '=', '-', '_', '.'))
  private val identGen = for {
    n <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, identChar)
  } yield cs.mkString.trim match { case "" => "x"; case s => s }

  private val fieldValueGen: Gen[FieldValue] = Gen.oneOf(
    Gen.choose(-1e6, 1e6).map(d => FFloat(math.rint(d * 100) / 100)),
    Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(FInt(_)),
    Gen.oneOf(true, false).map(FBool(_)),
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', '"')))
      .map(cs => FStr(cs.mkString)))

  private val pointGen: Gen[Point] = for {
    m <- identGen
    nTags <- Gen.choose(0, 3)
    tagKs <- Gen.listOfN(nTags, identGen)
    tagVs <- Gen.listOfN(nTags, identGen)
    nFields <- Gen.choose(1, 4)
    fieldKs <- Gen.listOfN(nFields, identGen)
    fieldVs <- Gen.listOfN(nFields, fieldValueGen)
    ts <- Gen.option(Gen.choose(0L, 2000000000000000000L))
  } yield Point(m, tagKs.zip(tagVs).toMap, fieldKs.zip(fieldVs).toMap, ts)

  test("serialize ∘ parse = identity for arbitrary points") {
    check("roundtrip", Prop.forAll(pointGen) { p =>
      parseLine(serialize(p)) == Right(p)
    })
  }

  test("parse never throws on arbitrary garbage — errors go Left") {
    check("no-throw", Prop.forAll(Gen.asciiPrintableStr) { s =>
      parseLine(s); true
    })
  }
}
