package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream attribution join: purchases attach to clicks of the same
  * user within the window; outside-window and cross-user purchases do
  * not. Both sides are unbounded MemoryStreams — this exercises Spark's
  * watermark-bounded join state, not a static join. */
class StreamJoinSpec extends SparkSpec {

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  test("purchases within the window attribute to the click; others drop") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val clicks = MemoryStream[(Timestamp, Long, String)]
    val buys = MemoryStream[(Timestamp, Long, Double)]
    val joined = StreamJoin.attribution(
      clicks.toDF().toDF("ts", "user_id", "click_id"),
      buys.toDF().toDF("ts", "user_id", "amount"),
      window = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()

    try {
      clicks.addData((t("10:00"), 1L, "c1"), (t("10:00"), 2L, "c2"))
      buys.addData(
        (t("10:10"), 1L, 9.99),  // within 30 min of c1 → attributed
        (t("11:00"), 1L, 5.00),  // 60 min after c1 → outside window
        (t("10:10"), 3L, 7.00))  // no click from user 3
      q.processAllAvailable()

      val rows = s.sql("SELECT user_id, click_id, amount FROM attrib").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, "c1", 9.99)), rows.mkString(", "))

      // a second click by user 2 catches a later purchase
      clicks.addData((t("10:50"), 2L, "c3"))
      buys.addData((t("11:05"), 2L, 3.50)) // within 30 min of c3, not c2
      q.processAllAvailable()
      val rows2 = s.sql("SELECT click_id, amount FROM attrib WHERE user_id = 2").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(rows2 == Set(("c3", 3.50)), rows2.mkString(", "))
    } finally q.stop()
  }
}
