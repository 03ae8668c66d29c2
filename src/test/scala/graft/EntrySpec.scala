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
}
