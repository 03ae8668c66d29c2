package graft

/** Central registry of every verifiable operator suite. SparkEntry derives
  * its `queries`/`oracleSql` maps from here, so a suite added here is
  * automatically part of the driver's correctness gate and bench run.
  */
object Registry {
  def suites: Seq[Q] =
    graft.queries.EventAggs.all ++
    graft.queries.Relational.all ++
    graft.queries.DocText.all ++
    graft.queries.TrainPrep.all ++
    graft.queries.EmbedOps.all ++
    graft.queries.InfluxQLSuite.all ++
    graft.queries.IngestSuite.all

  /** Duplicate names would silently shadow each other in the maps — fail fast. */
  def validated: Seq[Q] = {
    val dups = suites.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    suites
  }
}
