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
  *   - unpartitioned `WindowExec`: NONE since r16 (VERDICT r15 #8). Since
  *     r17 the bounded single-task ranks state their bound as an ACTUAL
  *     in-plan limit (VERDICT r16 #4): `PlanLint.boundedBelow` accepts a
  *     window only when a TakeOrderedAndProject or a ≤ WINDOW_BOUND limit
  *     node sits below it — SLIMIT's post-TakeOrdered series rank,
  *     e_slimit's post-limit(3) rank, Ranks.globalRank's exact-count
  *     `limit(n)` small path and `limit(p)` offset window all carry one.
  *     The former derived-constant partition key (`pmod(xxhash64, 1)`)
  *     satisfied the lint's emptiness check without bounding anything
  *     and is gone.
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
    "em_hybrid_rrf_persisted",
    // the persisted RAG deployment: BOTH at-rest scans (chunk codes +
    // chunk postings) must carry partition filters
    "em_rag_persisted")

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
