package graft.queries

import graft.{Registry, SparkSpec}

/** Plan-shape pins for the document-pipeline additions — the 100 TB claims
  * as assertions, not comments: the per-doc hygiene stages must stay
  * map-only (zero shuffles at any corpus size), and the corpus-wide
  * heavy-hitter top-k must plan as TakeOrderedAndProject (per-partition
  * heaps), never a full global sort. */
class DocPlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val q = Registry.suites.find(_.name == name)
      .getOrElse(fail(s"no such query: $name"))
    q.fn(spark, sfDir).queryExecution.executedPlan.toString
  }

  private def countExchanges(p: String): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(p).size

  test("per-doc hygiene stages are map-only: zero shuffle Exchanges") {
    for (name <- Seq("d_repetition_stats", "d_pii_scrub", "d_chunk_windows")) {
      val p = plan(name)
      assert(countExchanges(p) == 0, s"$name shuffles:\n$p")
    }
  }

  test("heavy-hitter top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("d_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("stratified sampling is map-only; the curation ledger shuffles only for canonicalization") {
    assert(countExchanges(plan("d_stratified_sample")) == 0)
    // one hash-aggregate exchange (text-hash canonical) + the join back:
    // anything beyond 2 means a gate stopped being map-only
    assert(countExchanges(plan("d_curation_ledger")) <= 2,
      plan("d_curation_ledger"))
  }
}
