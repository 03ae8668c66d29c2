package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPQ index lifecycle: the learned allocation persists beside the
  * codebook + codes, searches byte-identically from disk, appends with
  * the frozen artifacts, deletes via the shared flat-table takedown, and
  * the `pq-opq` / `pq-flat` markers fence the two coordinate spaces from
  * each other's readers. */
class OpqIndexSpec extends SparkSpec {

  private def vecs = {
    val s = spark
    s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  test("persisted OPQ search is byte-identical to the in-memory rung") {
    val idx = graft.TempDirs.scratch("opq_idx").toString
    EmbedOps.opqBuild(spark, sfDir, idx)
    val mem = EmbedOps.opqAdc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro", "rn").collect().toSet
    val disk = EmbedOps.opqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro", "rn").collect().toSet
    assert(mem == disk && mem.nonEmpty)
  }

  test("append with frozen perm+books searches identically to encoding the " +
      "batch in the original build; existing code files untouched") {
    val v = vecs
    val build = v.where(col("vec_id") % 10 =!= 0)
    val fresh = v.where(col("vec_id") % 10 === 0)

    // A: build on 90%, append 10% with the frozen artifacts
    val idxA = graft.TempDirs.scratch("opq_app_a").toString
    EmbedOps.opqBuildV(build, idxA)
    def files(i: String): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(i, "codes.parquet"))
        .iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
    }
    val before = files(idxA)
    val appended = EmbedOps.opqAppend(spark, fresh, idxA)
    assert(appended == fresh.count())
    before.foreach { case (p, sz) =>
      assert(files(idxA).get(p).contains(sz), s"existing code file rewritten: $p") }

    // B: same artifacts (copied), the FULL corpus encoded in one append
    val idxB = graft.TempDirs.scratch("opq_app_b").toString
    Seq("perm.parquet", "codebook.parquet").foreach(t =>
      spark.read.parquet(s"$idxA/$t").write.parquet(s"$idxB/$t"))
    java.nio.file.Files.write(java.nio.file.Paths.get(idxB, "_encoding"),
      "pq-opq".getBytes("UTF-8"))
    EmbedOps.opqAppend(spark, v, idxB)
    val a = EmbedOps.opqIndexed(spark, sfDir, idxA)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val b = EmbedOps.opqIndexed(spark, sfDir, idxB)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("deletion drops the vectors from searches (shared flat takedown)") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("opq_del").toString
    EmbedOps.opqBuildV(vecs, idx)
    val pre = EmbedOps.opqIndexed(spark, sfDir, idx)
      .select("vec_id").as[Long].collect().toSet
    val victim = pre.max
    assert(EmbedOps.pqDelete(spark, idx, Seq(victim).toDF("vec_id")) == 1L)
    val post = EmbedOps.opqIndexed(spark, sfDir, idx)
      .select("vec_id").as[Long].collect().toSet
    assert(!post.contains(victim))
    assert(post.nonEmpty)
  }

  test("full-OPQ rung persists (VERDICT r19 #7): at-rest search is " +
      "byte-identical to the in-memory alternation, frozen-R append " +
      "matches encoding the batch in the original build, takedown works, " +
      "and the pq-opq-full marker fences both neighbor encodings") {
    val s = spark
    import s.implicits._
    // A: persisted == in-memory (same deterministic alternation, R and
    // books round-trip parquet exactly)
    val idx = graft.TempDirs.scratch("opqf_idx").toString
    EmbedOps.opqFullBuild(s, sfDir, idx)
    val mem = EmbedOps.opqFullAdc(s, sfDir, 150)
      .select("qid", "vec_id", "d2_micro", "rn").collect().toSet
    val disk = EmbedOps.opqFullIndexed(s, sfDir, idx)
      .select("qid", "vec_id", "d2_micro", "rn").collect().toSet
    assert(mem == disk && mem.nonEmpty,
      s"at-rest full-OPQ diverges from the in-memory rung " +
        s"(disk-only: ${disk -- mem}, mem-only: ${mem -- disk})")

    // B: frozen-R append parity — build on 90%, append 10%; vs the same
    // frozen artifacts encoding the full corpus in one append
    val v = vecs
    val idxA = graft.TempDirs.scratch("opqf_app_a").toString
    EmbedOps.opqFullBuildV(v.where(col("vec_id") % 10 =!= 0), idxA)
    assert(EmbedOps.opqFullAppend(s, v.where(col("vec_id") % 10 === 0), idxA)
      == v.where(col("vec_id") % 10 === 0).count())
    val idxB = graft.TempDirs.scratch("opqf_app_b").toString
    Seq("rotation.parquet", "codebook.parquet").foreach(t =>
      s.read.parquet(s"$idxA/$t").write.parquet(s"$idxB/$t"))
    java.nio.file.Files.write(java.nio.file.Paths.get(idxB, "_encoding"),
      "pq-opq-full".getBytes("UTF-8"))
    EmbedOps.opqFullAppend(s, v, idxB)
    val a = EmbedOps.opqFullIndexed(s, sfDir, idxA)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val b = EmbedOps.opqFullIndexed(s, sfDir, idxB)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(a == b && a.nonEmpty, "frozen-R append diverges from build-time encode")

    // C: flat takedown applies verbatim
    val pre = EmbedOps.opqFullIndexed(s, sfDir, idx)
      .select("vec_id").as[Long].collect().toSet
    val victim = pre.max
    assert(EmbedOps.pqDelete(s, idx, Seq(victim).toDF("vec_id")) == 1L)
    assert(!EmbedOps.opqFullIndexed(s, sfDir, idx)
      .select("vec_id").as[Long].collect().toSet.contains(victim))

    // D: the marker fences both neighbor encodings
    val e1 = intercept[IllegalArgumentException](
      EmbedOps.opqIndexed(s, sfDir, idx))
    assert(e1.getMessage.contains("pq-opq"))
    val idxOpq = graft.TempDirs.scratch("opqf_fence").toString
    EmbedOps.opqBuildV(vecs, idxOpq)
    val e2 = intercept[IllegalArgumentException](
      EmbedOps.opqFullIndexed(s, sfDir, idxOpq))
    assert(e2.getMessage.contains("pq-opq-full"))
  }

  test("encoding markers fence raw-PQ and OPQ dirs from each other") {
    val idxOpq = graft.TempDirs.scratch("opq_fence_a").toString
    EmbedOps.opqBuildV(vecs, idxOpq)
    val e1 = intercept[IllegalArgumentException] {
      EmbedOps.pqAdcIndexed(spark, sfDir, idxOpq) }
    assert(e1.getMessage.contains("pq-flat"))

    val idxPq = graft.TempDirs.scratch("opq_fence_b").toString
    EmbedOps.pqBuildV(vecs, idxPq)
    val e2 = intercept[IllegalArgumentException] {
      EmbedOps.opqIndexed(spark, sfDir, idxPq) }
    assert(e2.getMessage.contains("pq-opq"))
  }
}
