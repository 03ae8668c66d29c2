package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.concurrent.Eventually.{eventually, interval, timeout}
import org.scalatest.time.{Seconds, Span, Millis}

/** Execution-scoped persist release (VERDICT r20 #4): the in-gate-training
  * search entries pin their corpus via `trainPre`; the pin must not
  * survive the returned frame's execution in a long-lived session. The
  * release rides a QueryExecutionListener (async bus), so assertions use
  * `eventually`. */
class PinsSpec extends SparkSpec {

  private def pinnedRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("releaseAfterExecution unpersists pins once the result plan runs") {
    import spark.implicits._
    val pin = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pin.count() // materialize
    val result = Pins.releaseAfterExecution(
      pin.groupBy("v").agg(sum("k").as("s")), Seq(pin))
    assert(pin.storageLevel.useMemory) // still pinned pre-execution
    result.write.mode("overwrite").format("noop").save()
    eventually(timeout(Span(20, Seconds)), interval(Span(100, Millis))) {
      assert(!pin.storageLevel.useMemory,
        "pin must be released after the registered plan executed")
    }
  }

  test("a gate's trainPre corpus pin does not survive the gate's execution") {
    spark.catalog.clearCache()
    val before = pinnedRddCount
    // other suites may have CONSTRUCTED gates without executing them
    // (PlanLint builds all 220 plans) — those registrations legitimately
    // stay pending until the cap disposes them, so every assertion here
    // is a DELTA against this suite's own two executions
    val pendingBefore = Pins.pendingCount
    // em_ivfpq_adc trains in-gate (trainPre pins the corpus) — the
    // serving-shaped repeated-call pattern must not accumulate pins
    val byName = graft.Registry.validated.map(q => q.name -> q).toMap
    val gate = byName("em_ivfpq_adc")
    (1 to 2).foreach { _ =>
      gate.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    }
    // the two executed registrations must drain (release is async)
    eventually(timeout(Span(30, Seconds)), interval(Span(200, Millis))) {
      assert(Pins.pendingCount <= pendingBefore,
        "this test's executed registrations must be released")
    }
    val after = pinnedRddCount
    // 2 calls × (1 corpus pin + ≤2 globalRank internals): without the
    // execution-scoped release `after - before` includes both corpus
    // pins; with it only globalRank's small internals may remain
    assert(after - before <= 4,
      s"pinned RDDs grew from $before to $after across repeated gate calls")
    spark.catalog.clearCache()
  }
}
