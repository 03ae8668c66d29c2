package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming sessionization (flatMapGroupsWithState + event-time timeout):
  * sessions close on a gap within the stream AND on watermark passage for
  * the tail session — and the emitted rows carry exactly the batch
  * e_sessionize measures (id, count, start, duration, value). */
class SessionStreamSpec extends SparkSpec {

  private def t(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")
  private def usOf(hhmm: String): Long = t(hhmm).getTime * 1000L

  test("gap closes a session mid-stream; watermark timeout closes the tail session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Timestamp, Long, Long)]
    val evs = input.toDS().map { case (ts, u, c) => SessionStream.Ev(ts, u, c) }
    // 30-minute gap, tight watermark so the tail closes quickly
    val out = SessionStream.plan(evs, gapUs = 1800000000L, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    try {
      // user 1: two events 10 min apart (one session), then a 50-min gap
      // opens session 2; user 2: one lone event
      input.addData((t("10:00"), 1L, 100L), (t("10:10"), 1L, 200L),
        (t("10:05"), 2L, 50L))
      q.processAllAvailable()
      input.addData((t("11:00"), 1L, 300L))
      q.processAllAvailable()
      // session 1 of user 1 closed by the GAP (emitted with the 11:00 batch)
      val afterGap = s.sql("SELECT * FROM sess_out").as[SessionStream.Out].collect()
      assert(afterGap.contains(SessionStream.Out(1L, 1L, 2L, usOf("10:00"),
        600000000L, 3.0)), afterGap.mkString("\n"))

      // advance the watermark far past 11:00+gap with sentinel batches →
      // the open sessions (u1 s2, u2 s1) hit their event-time timeouts
      input.addData((t("13:00"), 99L, 1L))
      q.processAllAvailable()
      input.addData((t("13:30"), 99L, 1L))
      q.processAllAvailable()

      val all = s.sql("SELECT * FROM sess_out").as[SessionStream.Out].collect().toSet
      assert(all.contains(SessionStream.Out(1L, 2L, 1L, usOf("11:00"), 0L, 3.0)),
        all.mkString("\n"))
      assert(all.contains(SessionStream.Out(2L, 1L, 1L, usOf("10:05"), 0L, 0.5)),
        all.mkString("\n"))
    } finally q.stop()
  }

  test("cross-batch straggler inside the watermark extends the open session") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Timestamp, Long, Long)]
    val evs = input.toDS().map { case (ts, u, c) => SessionStream.Ev(ts, u, c) }
    val out = SessionStream.plan(evs, gapUs = 1800000000L, watermark = "2 hours")
    val q = out.writeStream.format("memory").queryName("sess_straggle")
      .outputMode("append").start()

    try {
      input.addData((t("10:20"), 7L, 100L))
      q.processAllAvailable()
      // an EARLIER event arrives late (inside the generous watermark): it
      // must fold into the same session, not start a new one
      input.addData((t("10:10"), 7L, 50L))
      q.processAllAvailable()
      // close via gap: next event 40 min after 10:20
      input.addData((t("11:00"), 7L, 10L))
      q.processAllAvailable()

      val rows = s.sql("SELECT * FROM sess_straggle").as[SessionStream.Out]
        .collect().toSet
      assert(rows.contains(SessionStream.Out(7L, 1L, 2L, usOf("10:10"),
        600000000L, 1.5)), rows.mkString("\n"))
    } finally q.stop()
  }

  test("session_id keeps counting across a timeout close (no restart at 1)") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    val input = MemoryStream[(Timestamp, Long, Long)]
    val evs = input.toDS().map { case (ts, u, c) => SessionStream.Ev(ts, u, c) }
    val out = SessionStream.plan(evs, gapUs = 1800000000L, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_counter")
      .outputMode("append").start()

    try {
      input.addData((t("10:00"), 5L, 100L))
      q.processAllAvailable()
      // sentinels push the watermark past 10:00+gap → session 1 closes by
      // EVENT-TIME TIMEOUT (the state.remove() path before the fix)
      input.addData((t("12:00"), 99L, 1L))
      q.processAllAvailable()
      input.addData((t("12:30"), 99L, 1L))
      q.processAllAvailable()
      // a later event for the same user: must open session 2, not session 1
      input.addData((t("13:00"), 5L, 200L))
      q.processAllAvailable()
      input.addData((t("15:00"), 99L, 1L))
      q.processAllAvailable()
      input.addData((t("15:30"), 99L, 1L))
      q.processAllAvailable()

      val ids = s.sql("SELECT * FROM sess_counter").as[SessionStream.Out]
        .collect().filter(_.user_id == 5L).map(_.session_id).toSet
      assert(ids == Set(1L, 2L), s"expected sessions 1 and 2, got $ids")
    } finally q.stop()
  }
}
