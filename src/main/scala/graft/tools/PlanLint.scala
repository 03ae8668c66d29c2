package graft.tools

import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec,
  GlobalLimitExec, LocalLimitExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Registry-wide plan lint (VERDICT r14 #1): the plan-shape discipline
  * that was previously manual (`Explain` + BENCH_NOTES audits, one-off
  * `*PlanSpec`s) as a single assertion pass over EVERY registered gate,
  * so a future edit can't silently ship a cartesian product or an
  * unpartitioned global window into one of the 200 gates.
  *
  * The checks (each with a per-gate whitelist owned by `PlanLintSpec`,
  * where every exemption is documented):
  *   - `cartesian`: a `CartesianProductExec` anywhere in the plan. The
  *     only legitimate ones are bounded-by-construction oracle baselines.
  *   - `unpartitioned-window(n)`: a `WindowExec` with an empty partition
  *     spec — single-task at any scale — UNLESS its child subtree carries
  *     an actual in-plan row bound: a `TakeOrderedAndProject` or a
  *     limit node with limit ≤ `WINDOW_BOUND` (VERDICT r16 #4). The bound
  *     must be IN THE PLAN — a derived-constant partition key (the old
  *     `pmod(xxhash64, 1)` idiom) satisfies the emptiness check without
  *     bounding anything, so it is no longer used anywhere.
  *   - `unpruned-index-scan`: a gate that searches a `list_id=`-
  *     partitioned at-rest index (IVF / IVFPQ family) whose plan shows
  *     NO file scan with partition filters — i.e. the probe list stopped
  *     pruning the compressed scan and the search reads the whole index.
  *
  * "No broadcast where one fits" is deliberately NOT linted: at sf0.001
  *  every side fits in a broadcast, so any size-based assertion here
  *  would either be vacuous or pin planner thresholds rather than our
  *  code. The per-suite `*PlanSpec`s pin those shapes where they matter.
  */
object PlanLint {

  /** Every physical node: children, AQE initial plans, and subqueries. */
  def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case other                    => other.children
    }
    p +: (kids ++ p.subqueries).flatMap(nodes)
  }

  /** The largest in-plan limit accepted as a bound for a single-task
    * window: generous enough for the exact-count small path of
    * `Ranks.globalRank` (its byte gate admits ≲ 1M ranked keys), far
    * below anything corpus-shaped. */
  val WINDOW_BOUND: Int = 4 << 20

  /** An unpartitioned window is single-task; it is legitimate ONLY when
    * the plan itself bounds its input — a `TakeOrderedAndProject` or a
    * limit node (≤ WINDOW_BOUND) somewhere below the window. This is the
    * honest form of the bound (VERDICT r16 #4): "someone slapped a
    * constant partition key on an unbounded window" can no longer pass,
    * because the acceptance condition is the bound itself, not the
    * partition-spec shape. */
  private def boundedBelow(w: WindowExec): Boolean =
    nodes(w.child).exists {
      case t: TakeOrderedAndProjectExec => t.limit <= WINDOW_BOUND
      case g: GlobalLimitExec           => g.limit <= WINDOW_BOUND
      case l: LocalLimitExec            => l.limit <= WINDOW_BOUND
      case c: CollectLimitExec          => c.limit <= WINDOW_BOUND
      case _                            => false
    }

  /** Violation tags for one gate's physical plan. `expectPruned` = the
    * gate reads a partitioned at-rest index, so at least one scan must
    * carry partition filters. */
  def violations(plan: SparkPlan, expectPruned: Boolean): Seq[String] = {
    val ns = nodes(plan)
    val cart = ns.collect { case _: CartesianProductExec => "cartesian" }.distinct
    val win = ns.collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !boundedBelow(w) => w
    } match {
      case Seq() => Nil
      case ws    => Seq(s"unpartitioned-window(${ws.size})")
    }
    val pruned = ns.exists {
      case f: FileSourceScanExec => f.partitionFilters.nonEmpty
      case _                     => false
    }
    val unpruned = if (expectPruned && !pruned) Seq("unpruned-index-scan") else Nil
    cart ++ win ++ unpruned
  }

  /** Probe main: print each gate's violations at the given sf dir (AQE
    * off so `executedPlan` is the static physical plan). */
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-planlint")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    graft.Registry.validated.foreach { q =>
      val line =
        try {
          val vs = violations(q.fn(spark, sfDir).queryExecution.executedPlan,
            expectPruned = false)
          if (vs.isEmpty) "clean" else vs.mkString("; ")
        } catch { case e: Throwable => s"ERROR ${e.getMessage}" }
      println(s"[planlint] ${q.name}: $line")
    }
    spark.stop()
  }
}
