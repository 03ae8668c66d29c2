package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The r20 overlapped-writes helper: every branch runs, failures
  * propagate only after all branches finish (the marker-window crash
  * discipline assumes maintenance steps never overlap their caller's
  * next step), and the single-thunk form stays inline. */
class ParSpec extends AnyFunSuite {

  test("all branches run; caller returns only after every branch finished") {
    val ran = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    val gate = new java.util.concurrent.CountDownLatch(1)
    Par.run(
      () => { gate.await(); ran.add(1); () },
      () => { ran.add(2); gate.countDown() },
      () => { ran.add(3); () })
    assert(ran.size == 3, s"expected 3 branches to run, got $ran")
    assert(Set(1, 2, 3).subsetOf(ran.toArray.map(_.asInstanceOf[Int]).toSet))
  }

  test("a failing branch rethrows on the caller AFTER the others complete") {
    val survivorDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[RuntimeException] {
      Par.run(
        () => sys.error("branch boom"),
        () => { Thread.sleep(150); survivorDone.set(true) })
    }
    assert(e.getMessage.contains("branch boom"))
    assert(survivorDone.get,
      "the surviving branch must have completed before the rethrow — " +
        "no writes may be left running behind the caller")
  }

  test("single thunk runs inline on the calling thread") {
    val caller = Thread.currentThread()
    var seen: Thread = null
    Par.run(() => { seen = Thread.currentThread() })
    assert(seen eq caller)
  }
}
