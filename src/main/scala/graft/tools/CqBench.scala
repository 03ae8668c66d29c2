package graft.tools

import org.apache.spark.sql.functions._
import graft.streaming.ContinuousQuery

/** Standing-CQ throughput probe at scale (VERDICT r7 item 8): replay the
  * sf1 events corpus as a time-ordered micro-batch ingest through one
  * standing CQ (`mean(value) GROUP BY time(1h), event_type`, 1 h
  * watermark, update mode) and record sustained micro-batch latency and
  * state size from the StreamingQueryProgress feed.
  *
  * The replay is REAL structured streaming: the corpus is re-chunked into
  * `chunks` time-contiguous parquet files, a FileStreamSource drains them
  * one per trigger (so each micro-batch is one ingest slice and event
  * time advances monotonically, as live ingest does), and the watermark
  * evicts window + dedup state as it moves — the "no unbounded state"
  * claim is the measured plateau of `numRowsTotal`, not an assertion.
  *
  * Usage: CqBench [srcDir] [chunks]   (defaults target/sf1, 48)
  */
object CqBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-cqbench")
    val src = a.lift(0).getOrElse("target/sf1")
    val chunks = a.lift(1).map(_.toInt).getOrElse(48)
    val work = graft.TempDirs.scratch("cqbench").toString
    val replay = s"$work/replay"

    // Tables normalizes ts to TimestampType µs whatever the file encoding
    val ev = graft.Tables(spark, src, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val b = ev.agg(min(col("ts")), max(col("ts")), count(lit(1))).head()
    // getTimestamp, not getInstant: the session keeps the default
    // java.sql datetime API, so Row timestamps are java.sql.Timestamp
    val (t0, t1, total) = (b.getTimestamp(0).getTime, b.getTimestamp(1).getTime, b.getLong(2))
    val sliceMs = math.max(1L, (t1 - t0) / chunks + 1L)
    // sequential slice writes: file modification order == event-time order,
    // so the FileStreamSource replays ingest the way a live feed arrives
    for (i <- 0 until chunks) {
      val lo = t0 + i * sliceMs
      val hi = lo + sliceMs
      ev.where(col("ts") >= timestamp_millis(lit(lo)) &&
          col("ts") < timestamp_millis(lit(hi)))
        .coalesce(1).write.mode("append").parquet(replay)
    }

    val cq = ContinuousQuery.CQ("cqbench", "events", "value", "mean",
      "1 hour", Seq("event_type"), watermark = "1 hour")
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(replay)
    val q = ContinuousQuery.plan(stream, cq).writeStream
      .queryName("cqbench")
      .outputMode("update")
      .option("checkpointLocation", s"$work/ckpt")
      .format("memory")
      .start()
    val wall0 = System.nanoTime()
    q.processAllAvailable()
    val wallSec = (System.nanoTime() - wall0) / 1e9
    val prog = q.recentProgress.toSeq.filter(_.numInputRows > 0)
    q.stop()

    def pct(xs: Seq[Double], p: Double) =
      xs.sorted.apply(math.min(xs.size - 1, (p * xs.size).toInt))
    val durs = prog.map(_.durationMs.get("triggerExecution").toDouble)
    val state = prog.flatMap(_.stateOperators.toSeq.headOption.map(_.numRowsTotal))
    val inRows = prog.map(_.numInputRows).sum
    println(f"CQBENCH batches=${prog.size} rows=$inRows/$total wall=${wallSec}%.1f s " +
      f"sustained=${inRows / wallSec}%.0f rows/s")
    println(f"CQBENCH batch_ms p50=${pct(durs, 0.5)}%.0f p95=${pct(durs, 0.95)}%.0f " +
      f"max=${durs.max}%.0f")
    println(s"CQBENCH state_rows first=${state.headOption.getOrElse(-1L)} " +
      s"max=${state.max} last=${state.lastOption.getOrElse(-1L)}")
    val out = spark.sql("SELECT count(*) FROM cqbench").head.getLong(0)
    println(s"CQBENCH sink_rows=$out")
    spark.stop()
  }
}
