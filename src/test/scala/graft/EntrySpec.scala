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
    // the two approx sketches are the only gates without an oracle
    assert((names -- SparkEntry.oracleSql.keySet) ==
      Set("e_approx_count_distinct", "e_approx_percentile"))
  }
}
