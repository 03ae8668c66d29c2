package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Execution-scoped persist() release (VERDICT r20 #4): the
  * search-shaped gates that train in-gate pin their corpus via
  * `trainPre` — the returned DataFrame still needs the pin, so the gate
  * body cannot unpersist it, and under a long-lived session repeated
  * calls would accumulate pinned corpora (Bench/Verify never see this:
  * both clear the cache per run / exit the JVM).
  *
  * `releaseAfterExecution(result, pins)` registers the pins against the
  * result's analyzed plan; a per-session QueryExecutionListener
  * unpersists them as soon as any action whose plan CONTAINS that exact
  * plan instance completes (success or failure) — i.e. when the gate's
  * returned frame has executed. Containment is by reference (`eq`):
  * Spark's analyzer leaves already-analyzed subtrees in place, so the
  * noop-sink write, Verify's `repartition(1).write`, and a plain
  * `collect()` all carry the registered instance as a subtree
  * (PinsSpec pins this). A release is only ever an unpersist — if the
  * match never fired (a caller that re-analyzes from scratch), behavior
  * degrades to the pre-r21 caller-must-clear contract, never to a
  * semantics change.
  *
  * The pending queue is capped: entries whose plan never executes (a
  * constructed-then-dropped frame) would otherwise accumulate; past the
  * cap the oldest entry's pins are released eagerly — stale by then
  * (their gate's frame was abandoned), so an eager unpersist is the
  * correct disposal, not a risk. */
private[graft] object Pins {
  private val MaxPending = 64
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[(LogicalPlan, Seq[DataFrame])]
  private val sessions = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean])

  def releaseAfterExecution(result: DataFrame, pins: Seq[DataFrame]): DataFrame = {
    if (sessions.add(result.sparkSession))
      result.sparkSession.listenerManager.register(listener)
    pending.add((result.queryExecution.analyzed, pins))
    while (pending.size > MaxPending) {
      val old = pending.poll()
      if (old != null) old._2.foreach(_.unpersist(false))
    }
    result
  }

  /** Test hook: pins still awaiting their plan's execution. */
  private[graft] def pendingCount: Int = pending.size

  private val listener = new QueryExecutionListener {
    private def sweep(qe: QueryExecution): Unit = {
      val it = pending.iterator()
      while (it.hasNext) {
        val (plan, pins) = it.next()
        if (qe.analyzed.exists(_ eq plan)) {
          pins.foreach(_.unpersist(false))
          it.remove()
        }
      }
    }
    override def onSuccess(funcName: String, qe: QueryExecution,
        durationNs: Long): Unit = sweep(qe)
    override def onFailure(funcName: String, qe: QueryExecution,
        exception: Exception): Unit = sweep(qe)
  }
}
