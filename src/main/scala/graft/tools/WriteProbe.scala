package graft.tools

import org.apache.spark.sql.functions._

/** Component-level probe behind the r8 append changes (BENCH_NOTES):
  * isolates the raw parquet write cost of each layout/clustering choice
  * from the full append path, and sweeps the pre-write repartition count
  * for tag-partitioned dynamic writes. Medians of 5 in one JVM. */
object WriteProbe {
  def main(a: Array[String]): Unit = {
    val spark = graft.Sessions.build("writeprobe")
    val n = 100000
    val batch = spark.range(n).select(
      (col("id") * 1000L + 1000000000L).as("ts_us"),
      concat(lit("h"), pmod(col("id"), lit(32))).as("host"),
      (col("id") % 997).cast("double").as("v")).cache()
    batch.count()
    def files(d: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try s.filter(_.toString.endsWith(".parquet")).count() finally s.close()
    }
    def time(label: String)(body: String => Unit): Unit = {
      var nf = 0L
      val ts = Seq.fill(5) {
        val d = graft.TempDirs.scratch("wp").toString
        val t0 = System.nanoTime(); body(d); val dt = (System.nanoTime() - t0) / 1e6
        nf = files(d); dt
      }
      println(f"PROBE $label%-26s median=${ts.sorted.apply(2)}%.1f ms files=$nf")
    }
    val wtb = batch.withColumn("_tb", expr("ts_us div 3600000000"))
    time("flat")          { d => batch.write.parquet(s"$d/data") }
    time("static-tb")     { d => batch.write.parquet(s"$d/data/_tb=0") }
    time("dyn-tb")        { d => wtb.write.partitionBy("_tb").parquet(s"$d/data") }
    time("dyn-tb-host")   { d => wtb.write.partitionBy("_tb", "host").parquet(s"$d/data") }
    for (p <- Seq(1, 2, 4, 8, 16, 32))
      time(s"repart$p-dyn-tb-host") { d =>
        wtb.repartition(p, col("_tb"), col("host"))
          .write.partitionBy("_tb", "host").parquet(s"$d/data") }
    spark.stop()
  }
}
