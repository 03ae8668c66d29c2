package graft.streaming

import graft.SparkSpec
import graft.queries.{EmbedOps, IvfAppendStats}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming IVF maintenance: micro-batches append to a persisted index
  * with per-batch drift stats; the maintained index must search exactly
  * like appending the same vectors in one shot, and a drifted batch
  * must surface a retrain advisory through the callback. */
class IndexStreamSpec extends SparkSpec {

  private def vecs = {
    val s = spark
    s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
  }

  test("streamed batches maintain the index; drift surfaces per batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val v = vecs
    val idx = java.nio.file.Files.createTempDirectory("ivf_stream").toString
    EmbedOps.ivfBuildV(v.where(col("vec_id") % 10 =!= 0), idx, None)

    val seen = new java.util.concurrent.ConcurrentHashMap[Long, IvfAppendStats]()
    val input = MemoryStream[(Long, Seq[Double])]
    val q = IndexStream.start(
      input.toDS().map { case (id, e) => IndexStream.Vec(id, e) }, idx) {
      (batchId, stats) => seen.put(batchId, stats)
    }
    try {
      val fresh = v.where(col("vec_id") % 10 === 0)
        .as[(Long, Seq[Double])].collect().toSeq
      // two in-distribution micro-batches, then one shifted batch
      val (b1, b2) = fresh.splitAt(fresh.size / 2)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val shifted = b1.take(20).map { case (id, e) =>
        (id + 5000000L, e.map(_ + 10.0)) }
      input.addData(shifted: _*); q.processAllAvailable()

      import scala.jdk.CollectionConverters._
      val stats = seen.asScala.toSeq.sortBy(_._1).map(_._2)
      assert(stats.size == 3)
      assert(!stats(0).retrainAdvised && !stats(1).retrainAdvised,
        s"in-distribution batches flagged: $stats")
      assert(stats(2).retrainAdvised, s"shifted batch not flagged: $stats")
      assert(stats.map(_.appended).sum == fresh.size + 20)
    } finally q.stop()

    // the maintained index stays fully searchable: every query returns
    // its exact TOPK ranked candidates (one-shot equivalence of appended
    // layouts is IvfAppendSpec's theorem; this pins the streamed path
    // lands in the same layout)
    val counts = EmbedOps.ivfKnnIndexed(spark, sfDir, idx)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 5L))
  }
}
