package graft

/** The driver contract's smoke surface: `entry` returns rows on
  * sf0.001, every registered gate has a unique name, and every oracle
  * key references a registered gate — catching a contract regression
  * locally instead of at the driver's post-round check. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique and oracle keys all resolve") {
    val names = SparkEntry.queries.keySet
    assert(names.size == Registry.validated.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    // every gate carries an oracle since r15: the two approx sketches
    // gained alternate-exact bound oracles (checked against the exact
    // sibling gates' values) instead of rows-only status
    assert((names -- SparkEntry.oracleSql.keySet) == Set.empty[String])
  }

  test("SURVEY §8's stated gate count matches the registry") {
    // VERDICT r16 #5: the coverage-map header drifted twice (claimed 215
    // while the registry held 219); pin the documented count to
    // Registry.validated.size so any new gate forces the doc edit.
    // anchor on user.dir rather than a bare relative path (ADVICE r17):
    // sbt forks test JVMs at the repo root, but the anchored form keeps
    // working (and fails with a path, not a bare FileNotFound) if a
    // runner ever sets a different cwd
    val surveyPath = java.nio.file.Paths.get(sys.props("user.dir"), "SURVEY.md")
    assert(java.nio.file.Files.exists(surveyPath),
      s"SURVEY.md not found at $surveyPath — is the test JVM's working dir the repo root?")
    val header = scala.io.Source.fromFile(surveyPath.toFile, "UTF-8")
    val stated = try {
      val sect = header.getLines().dropWhile(!_.startsWith("## 8. "))
        .take(5).mkString(" ")
      "(\\d+) registered gates".r.findFirstMatchIn(sect)
        .getOrElse(fail("SURVEY §8 header lacks an 'N registered gates' count"))
        .group(1).toInt
    } finally header.close()
    assert(stated == Registry.validated.size,
      s"SURVEY §8 says $stated gates but the registry has ${Registry.validated.size}")
  }
}
