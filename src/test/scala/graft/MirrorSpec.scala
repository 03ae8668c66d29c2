package graft

import graft.ql.{FieldMeta, TableMeta}

/** Full-mirror analog of the reference's cmd/mirror tool: metadata first,
  * then per-measurement line-protocol export with a resume bookmark;
  * import replays the catalog and distributed-parses the data. */
class MirrorSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    graft.TempDirs.scratch(prefix).toString

  private def meta(m: String) = TableMeta(m, "ts_us",
    tags = Seq("type"), fields = Seq(FieldMeta("v", Some(100L))))

  test("mirrorTo/mirrorFrom copies measurements AND metadata; import is idempotent") {
    val mirror = tmpDir("graft_mirror")
    val e1 = new Engine(spark, sfDir)
    e1.execute("CREATE RETENTION POLICY keep30 ON default DURATION 30d REPLICATION 1")
    e1.execute("CREATE USER boss WITH PASSWORD 'pw' WITH ALL PRIVILEGES")
    e1.registerMeasurement(meta("ma"), spark.emptyDataFrame)
    e1.registerMeasurement(meta("mb"), spark.emptyDataFrame)
    e1.writeLineProtocol(Seq(
      "ma,type=a v=1.5 1000000000", "ma,type=b v=2.25 2000000000"), "ma")
    e1.writeLineProtocol(Seq("mb,type=c v=3 3000000000"), "mb")
    e1.mirrorTo(mirror)

    val dst = tmpDir("graft_mirror_dst")
    val e2 = new Engine(spark, sfDir, Some(dst)) // durable target deployment
    e2.mirrorFrom(mirror)
    def rows(e: Engine, q: String) = e.execute(q).collect()
      .map(r => (r.getAs[Long]("time"), r.getAs[Double]("v"))).toSet
    assert(rows(e2, "SELECT v FROM ma") == rows(e1, "SELECT v FROM ma"))
    assert(rows(e2, "SELECT v FROM mb") == rows(e1, "SELECT v FROM mb"))
    // metadata replicated before data, like the reference importer
    assert(e2.execute("SHOW RETENTION POLICIES ON default").collect()
      .map(_.getString(0)).contains("keep30"))
    assert(e2.execute("SHOW USERS").collect().map(_.getString(0)).contains("boss"))
    // idempotent: a second import does not duplicate rows
    e2.mirrorFrom(mirror)
    assert(rows(e2, "SELECT v FROM ma").size == 2)
    // and the imported data is DURABLE on the target: restart keeps it
    val e3 = new Engine(spark, sfDir, Some(dst))
    assert(rows(e3, "SELECT v FROM ma") == rows(e1, "SELECT v FROM ma"))
  }

  test("resume bookmark: unbookmarked (incomplete) measurements are not imported") {
    val mirror = tmpDir("graft_mirror2")
    val e1 = new Engine(spark, sfDir)
    e1.registerMeasurement(meta("mc"), spark.emptyDataFrame)
    e1.writeLineProtocol(Seq("mc,type=a v=1 1000000000"), "mc")
    e1.mirrorTo(mirror)
    // simulate an interrupted export: the bookmark is missing
    assert(new java.io.File(s"$mirror/mc/_done").delete())
    val e2 = new Engine(spark, sfDir)
    e2.mirrorFrom(mirror)
    assertThrows[graft.ql.ParseException](e2.execute("SELECT v FROM mc").collect())
    // a re-run of the export completes the bookmark, then import succeeds
    e1.mirrorTo(mirror)
    e2.mirrorFrom(mirror)
    assert(e2.execute("SELECT v FROM mc").collect().length == 1)
  }
}
