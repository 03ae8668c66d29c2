package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming exact dedup (dropDuplicatesWithinWatermark on the content
  * fingerprint): duplicates inside the watermark horizon collapse —
  * within a batch, across batches, and under at-least-once redelivery —
  * while a duplicate arriving after the horizon re-admits (bounded
  * state, the documented streaming/batch dedup split). */
class DedupStreamSpec extends SparkSpec {

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("in-batch, cross-batch, and post-horizon dedup semantics") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDS().map { case (ts, id, tx) => DedupStream.Doc(ts, id, tx) }
    val q = DedupStream.plan(docs, watermark = "10 minutes")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    def texts(): Seq[String] =
      s.sql("SELECT text FROM dedup_out").as[String].collect().toSeq

    try {
      // in-batch duplicate collapses; distinct text survives
      input.addData((t("10:00"), 1L, "hello world"), (t("10:01"), 2L, "hello world"),
        (t("10:02"), 3L, "something else"))
      q.processAllAvailable()
      assert(texts().sorted == Seq("hello world", "something else"))

      // cross-batch duplicate inside the horizon collapses (at-least-once
      // redelivery of doc 1 included)
      input.addData((t("10:03"), 4L, "hello world"), (t("10:00"), 1L, "hello world"),
        (t("10:04"), 5L, "fresh text"))
      q.processAllAvailable()
      assert(texts().count(_ == "hello world") == 1)
      assert(texts().contains("fresh text"))

      // advance event time far past the horizon (evicts the fingerprints),
      // then the same content re-admits
      input.addData((t("12:00"), 6L, "watermark pusher"))
      q.processAllAvailable()
      input.addData((t("12:01"), 7L, "hello world"))
      q.processAllAvailable()
      assert(texts().count(_ == "hello world") == 2,
        s"post-horizon duplicate should re-admit: ${texts()}")
    } finally q.stop()
  }
}
