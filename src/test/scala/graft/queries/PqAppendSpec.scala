package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental PQ maintenance: appending encoded codes must search
  * byte-identically to a one-shot encode-everything layout, never
  * rewrite existing code files, and depend only on the new rows plus
  * the persisted codebook. */
class PqAppendSpec extends SparkSpec {

  private def vecs = {
    val s = spark
    s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  private def codeFiles(idx: String): Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(idx, "codes.parquet")
    java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
  }

  test("append searches identically to one-shot encode-all, append-only file layout") {
    val v = vecs
    val build = v.where(col("vec_id") % 10 =!= 0)
    val fresh = v.where(col("vec_id") % 10 === 0)

    val idxA = graft.TempDirs.scratch("pq_app_a").toString
    EmbedOps.pqBuildV(build, idxA)
    val before = codeFiles(idxA)
    val appended = EmbedOps.pqAppend(spark, fresh, idxA)
    val after = codeFiles(idxA)
    assert(appended == fresh.count())
    before.foreach { case (p, sz) =>
      assert(after.get(p).contains(sz), s"existing code file rewritten: $p")
    }
    assert(after.size > before.size)

    // one-shot comparator: same trained codebook, encode the FULL corpus
    // into a fresh codes dir in one append
    val idxB = graft.TempDirs.scratch("pq_app_b").toString
    spark.read.parquet(s"$idxA/codebook.parquet")
      .write.parquet(s"$idxB/codebook.parquet")
    EmbedOps.pqAppend(spark, v, idxB)
    val a = EmbedOps.pqAdcIndexed(spark, sfDir, idxA)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val b = EmbedOps.pqAdcIndexed(spark, sfDir, idxB)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("deletion drops the vectors from the codes table and from ADC searches") {
    val s = spark
    import s.implicits._
    val idx = graft.TempDirs.scratch("pq_del").toString
    EmbedOps.pqBuildV(vecs, idx)
    val pre = EmbedOps.pqAdcIndexed(spark, sfDir, idx)
      .select("vec_id").distinct().as[Long].collect().toSeq.sorted.take(5)
    assert(pre.nonEmpty)
    val nDel = EmbedOps.pqDelete(spark, idx, pre.toDF("vec_id"))
    assert(nDel == pre.size)
    assert(spark.read.parquet(s"$idx/codes.parquet")
      .where(col("vec_id").isin(pre: _*)).count() == 0L)
    val post = EmbedOps.pqAdcIndexed(spark, sfDir, idx)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(pre.forall(!post.contains(_)))
    // absent ids: clean no-op
    assert(EmbedOps.pqDelete(spark, idx, Seq(99999999L).toDF("vec_id")) == 0L)
  }

  test("append works with the stored codes deleted (reads only new rows + codebook)") {
    val idx = graft.TempDirs.scratch("pq_app_del").toString
    val v = vecs
    EmbedOps.pqBuildV(v.where(col("vec_id") % 10 =!= 0), idx)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(idx, "codes.parquet"))
      .iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    val fresh = v.where(col("vec_id") % 10 === 0)
    val appended = EmbedOps.pqAppend(spark, fresh, idx)
    assert(appended == fresh.count())
    assert(spark.read.parquet(s"$idx/codes.parquet")
      .select("vec_id").distinct().count() == appended)
  }
}
