package graft.tools

import org.apache.spark.sql.functions._
import graft.ql.{FieldMeta, Parser, SelectStmt, TableMeta, Translator}

/** Reproduces the BENCH_NOTES chunked-series-fold measurement: a 20M-row
  * synthetic series folded through the Translator with chunking disabled
  * (sequential unpartitioned window) vs enabled. Run with
  * SPARK_GRAFT_CPUS=32 for the recorded numbers — at 4 threads the
  * single-task sort is not yet the bottleneck and the two paths tie. */
object FoldBench {
  def main(a: Array[String]): Unit = {
    val spark = graft.Sessions.build("foldbench")
    val n = a.lift(0).map(_.toLong).getOrElse(20000000L)
    val df = spark.range(n).select(
      (col("id") * 1000L + 1000000L).as("ts_us"),
      (sin(col("id") * 0.37) * 100.0).as("value"))
      .repartition(32).cache()
    df.count() // materialize the input outside the timed region
    val meta = TableMeta("m", "ts_us", tags = Seq(), fields = Seq(FieldMeta("value", None)))
    def run(q: String): Double = {
      val t0 = System.nanoTime()
      new Translator(df, meta).run(Parser.parse(q).asInstanceOf[SelectStmt])
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (q <- Seq("SELECT moving_average(value, 10) FROM m",
                  "SELECT derivative(value, 1s) FROM m")) {
      spark.conf.set("graft.seriesFold.chunks", "1")
      run(q); val tSeq = run(q) // warm-up, then timed
      spark.conf.set("graft.seriesFold.chunks", "32")
      spark.conf.set("graft.seriesFold.minBytes", "0")
      run(q); val tChunked = run(q)
      spark.conf.unset("graft.seriesFold.minBytes")
      println(f"RESULT $q%-45s sequential=$tSeq%.2f s chunked=$tChunked%.2f s speedup=${tSeq / tChunked}%.1f x")
    }
    spark.stop()
  }
}
