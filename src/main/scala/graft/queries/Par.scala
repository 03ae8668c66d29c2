package graft.queries

/** Run independent Spark actions concurrently from the driver (guide
  * §2.6 "overlap independent jobs"): an index build that writes several
  * artifacts from one (cached) frame otherwise serializes jobs whose
  * task tails leave most of the cluster idle — Spark's scheduler happily
  * runs concurrent jobs, actions are only sequential because driver code
  * calls them sequentially. Plain threads, not a shared pool: callers
  * pass 2-4 thunks, thread cost is negligible next to a Spark job, and a
  * global pool shared across concurrently-running builds would serialize
  * unrelated maintenance.
  *
  * Failure contract: every branch runs to completion (no branch is left
  * running behind the caller's back — the swap/marker crash discipline
  * assumes maintenance steps don't overlap their caller's next step),
  * then the first failure rethrows on the caller. */
private[graft] object Par {
  def run(thunks: (() => Unit)*): Unit = {
    if (thunks.size == 1) return thunks.head()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ts = thunks.map { f =>
      val t = new Thread(() => try f() catch { case e: Throwable => errs.add(e); () })
      t.setDaemon(true)
      t.start()
      t
    }
    ts.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }
}
