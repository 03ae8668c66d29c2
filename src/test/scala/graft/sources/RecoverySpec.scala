package graft.sources

import graft.SparkSpec

/** Dead-letter quarantine + replay cycle (the hinted-handoff analog,
  * cluster/recovery.go:89-229). */
class RecoverySpec extends SparkSpec {

  test("failed lines quarantine to disk and replay through the parser") {
    val s = spark
    import s.implicits._
    val dir = graft.TempDirs.scratch("deadletter").toString

    // batch 1: two good lines, two bad — bad ones quarantined
    val (ok1, errs1) = LineProtocol.parse(s,
      Seq("m,t=a v=1 1", "m,t=b v=2 2", "m,t=c v=oops 3", "garbage").toDS(),
      "m", Seq("t"), Seq("v"))
    assert(ok1.count() == 2)
    Recovery.quarantine(errs1, dir)

    // batch 2: one more failure accumulates (append semantics)
    val (_, errs2) = LineProtocol.parse(s,
      Seq("m,t=d v=also_bad 4").toDS(), "m", Seq("t"), Seq("v"))
    Recovery.quarantine(errs2, dir)

    // replay: still-bad lines fail again (and would re-quarantine)
    val (replayed, stillBad) = Recovery.replay(s, dir, "m", Seq("t"), Seq("v"))
    assert(replayed.count() == 0) // none became parseable
    assert(stillBad.count() == 3)

    // a "fixed upstream" line replays successfully through the same path
    val fixedDir = graft.TempDirs.scratch("deadletter2").toString
    Recovery.quarantine(Seq("bad field: m,t=c v=3.5 3").toDS(), fixedDir)
    val (ok, bad) = Recovery.replay(s, fixedDir, "m", Seq("t"), Seq("v"))
    assert(ok.count() == 1 && bad.count() == 0)
    assert(ok.select("v").head.getDouble(0) == 3.5)
  }
}
