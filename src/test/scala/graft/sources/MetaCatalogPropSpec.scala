package graft.sources

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: MetaCatalog write ∘ read = identity for arbitrary records with
  * hostile field content — the durable metadata catalog must round-trip
  * whatever identifiers, password hashes, rendered queries, and destination
  * strings the engine throws at it; one mis-escaped separator silently
  * corrupts restored auth or retention state. */
class MetaCatalogPropSpec extends SparkSpec {

  // field content including everything the escaper must handle: the field
  // separator U+001F, the list separators U+001E/U+001D, backslashes,
  // newlines, CR, unicode
  private val hostileChar = Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('\u001f', '\u001e', '\u001d', '\\', '\n', '\r',
      ' ', ':', '/', '\'', '"', 'µ', '→'))
  private val fieldGen = for {
    n <- Gen.choose(0, 20)
    cs <- Gen.listOfN(n, hostileChar)
  } yield cs.mkString
  // records carry a nonempty kind tag first (the Engine invariant)
  private val recordGen = for {
    kind <- Gen.identifier.map(_.take(8)).suchThat(_.nonEmpty)
    n <- Gen.choose(0, 5)
    fs <- Gen.listOfN(n, fieldGen)
  } yield kind +: fs
  private val recordsGen = Gen.choose(0, 30).flatMap(Gen.listOfN(_, recordGen))

  test("write ∘ read = identity under hostile field content") {
    val dir = graft.TempDirs.scratch("graft_catprop").toString
    val prop = Prop.forAll(recordsGen) { recs =>
      MetaCatalog.write(spark, dir, recs.map(_.toSeq))
      MetaCatalog.read(spark, dir).contains(recs.map(_.toSeq))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"round-trip: ${res.status}")
  }
}
