package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resident RAG serving handle (VERDICT r18 #1): `EmbedOps.ragOpen`
  * resolves the frozen quantizers, probes, LUTs, stats, vocabulary and
  * df ONCE; `query(qid)` must then be byte-identical to the per-request
  * reload path `ragPersistedQ` for EVERY query doc — the parity that
  * lets a deployment hold the artifacts resident without changing a
  * single result. */
class RagHandleSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getInt(4))).toSet

  test("handle.query is byte-identical to ragPersistedQ for every qid, " +
      "including zero-result columns and schema") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_vec").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_txt").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      (0L until 10L).foreach { qid =>
        val warm = h.query(qid)
        val cold = EmbedOps.ragPersistedQ(s, sfDir, vecIdx, txtIdx, qid)
        assert(warm.columns.toSeq == cold.columns.toSeq,
          s"qid $qid: column drift between handle and per-request path")
        val (w, c) = (rows(warm), rows(cold))
        assert(w == c, s"qid $qid: handle serving diverges from " +
          s"ragPersistedQ (handle-only: ${w -- c}, reload-only: ${c -- w})")
        assert(w.nonEmpty, s"qid $qid returned no passages")
      }
    } finally h.close()
  }

  test("handle refuses out-of-range qids loudly (same contract as " +
      "ragPersistedQ — no silent text-only fusion)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_oor_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_oor_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      intercept[IllegalArgumentException](h.query(10L))
      intercept[IllegalArgumentException](h.query(-1L))
      intercept[IllegalArgumentException](
        EmbedOps.ragPersistedQ(s, sfDir, vecIdx, txtIdx, 10L))
    } finally h.close()
  }

  test("concurrent queries through one handle return the same results " +
      "as sequential ones (the serving shape: N threads, one handle)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_conc_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_conc_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      val expected = (0L until 10L).map(q => q -> rows(h.query(q))).toMap
      import java.util.concurrent.{Executors, TimeUnit}
      val pool = Executors.newFixedThreadPool(4)
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      try {
        (0 until 40).foreach { i =>
          pool.execute(() => {
            val qid = (i % 10).toLong
            try {
              if (rows(h.query(qid)) != expected(qid))
                failures.add(s"qid $qid diverged on thread ${Thread.currentThread.getName}")
            } catch {
              case e: Throwable => failures.add(s"qid $qid threw: ${e.getMessage}")
            }
          })
        }
        pool.shutdown()
        assert(pool.awaitTermination(300, TimeUnit.SECONDS), "pool timed out")
      } finally { pool.shutdownNow(); () }
      assert(failures.isEmpty, s"concurrent serving failures: " +
        failures.toArray.take(3).mkString("; "))
    } finally h.close()
  }

  test("handle results are stable across repeated queries (resident " +
      "artifacts are read-only, no per-request state)") {
    val s = spark
    val vecIdx = graft.TempDirs.scratch("rag_handle_rep_v").toString
    val txtIdx = graft.TempDirs.scratch("rag_handle_rep_t").toString
    EmbedOps.ragBuildPersisted(s, sfDir, vecIdx, txtIdx)
    val h = EmbedOps.ragOpen(s, sfDir, vecIdx, txtIdx)
    try {
      val first = rows(h.query(3L))
      (1 to 3).foreach { i =>
        assert(rows(h.query(3L)) == first, s"repeat $i drifted")
      }
    } finally h.close()
  }
}
