package graft

/** Per-gate phase wall-times (VERDICT r18 #5).
  *
  * The heaviest correctness gates front-load in-gate index BUILD work by
  * design (`d_neardup_takedown` builds the 64-bucket index before the
  * takedown it actually measures; `em_rag_persisted` trains both at-rest
  * artifacts before one retrieve), so their single per-gate number reads
  * as "the operation is slow" when the build dominates. Gates that want
  * an honest artifact wrap their segments in `Phases.time("build") {…}`;
  * `graft.Bench` drains the buffer after each timed run and records a
  * `query_phases` block in `BENCH_SELF.json` — any future regression
  * localizes to a phase without a side profile.
  *
  * Scope: the buffer is process-global and drained per gate run by the
  * single bench driver thread (gate closures execute their actions
  * synchronously on the caller). The map is concurrent only so a stray
  * executor-thread caller can't corrupt it; phase accounting is not a
  * cross-thread protocol. Anything the gate does NOT wrap (typically the
  * final returned plan's evaluation under the noop sink) shows up as the
  * difference between the gate total and the summed phases.
  */
object Phases {
  private val buf =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Time `body` under `phase`, accumulating across calls (a lifecycle
    * loop's 4 appends sum into one "append" entry). */
  def time[T](phase: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally {
      buf.merge(phase, Double.box((System.nanoTime() - t0) / 1e9),
        (a, b) => Double.box(a + b))
      ()
    }
  }

  /** Snapshot and clear — one call per gate run from the bench driver. */
  def drain(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val out = buf.asScala.map { case (k, v) => (k, v.doubleValue) }.toMap
    buf.clear()
    out
  }
}
