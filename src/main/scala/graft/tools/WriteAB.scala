package graft.tools

import org.apache.spark.sql.functions._
import graft.ql.{FieldMeta, TableMeta}

/** Reproduces the BENCH_NOTES bucketed-append A/B: the identical 100k-row
  * batch landed through MeasurementStore.append without and with the
  * time-bucket layout (`_tb` dynamic-partition write), median of 3 —
  * isolates the layout's structural ingest cost from window noise. */
object WriteAB {
  def main(a: Array[String]): Unit = {
    val spark = graft.Sessions.build("writeab")
    val n = 100000
    val batch = spark.range(n).select(
      (col("id") * 1000L + 1000000000L).as("ts_us"),
      concat(lit("h"), pmod(col("id"), lit(32))).as("host"),
      (col("id") % 997).cast("double").as("v")).cache()
    batch.count()
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    for (bucket <- Seq(None, Some(3600L * 1000000L))) {
      def once(): Double = {
        val dir = java.nio.file.Files.createTempDirectory("wab").toString
        val meta = TableMeta("wb", "ts_us", tags = Seq("host"),
          fields = Seq(FieldMeta("v", None)), bucketUs = bucket)
        val t0 = System.nanoTime()
        graft.sources.MeasurementStore.append(spark, dir, meta, batch)
        n / ((System.nanoTime() - t0) / 1e9)
      }
      once()
      println(f"RESULT bucketUs=$bucket%-20s pps=${med(Seq.fill(3)(once()))}%.0f")
    }
    spark.stop()
  }
}
