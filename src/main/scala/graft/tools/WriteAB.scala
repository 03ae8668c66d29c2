package graft.tools

import org.apache.spark.sql.functions._
import graft.ql.{FieldMeta, TableMeta}

/** Reproduces the BENCH_NOTES bucketed-append A/B at the store level.
  * Arms are INTERLEAVED (a full round of all arms per iteration, medians
  * per arm) so host co-tenancy drift — which moves absolute pps 1.3-1.7×
  * within a day — cancels out of the ratios, which are the claim:
  *
  *   flat       no bucket, no tags      (the raw parquet floor)
  *   tb         `_tb` bucket only       (the r7 retention layout)
  *   tb+tags    bucket + tag partition  (exercises the r8 pre-write
  *                                       clustering exchange)
  *
  * Also reports parquet file counts — the clustering win is file-count
  * as much as time (unclustered: input_splits × tag_values files/batch).
  */
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
    def files(d: String): Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
      try s.filter(_.toString.endsWith(".parquet")).count() finally s.close()
    }
    case class Arm(name: String, bucket: Option[Long], tags: Seq[String],
        cluster: Boolean = true)
    val arms = Seq(
      Arm("flat", None, Nil),
      Arm("tb", Some(3600L * 1000000L), Nil),
      Arm("tb+tags", Some(3600L * 1000000L), Seq("host")),
      Arm("tb+tags-nocluster", Some(3600L * 1000000L), Seq("host"), cluster = false))
    val results = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val fileCounts = scala.collection.mutable.Map.empty[String, Long]
    for (_ <- 0 until 4; arm <- arms) {
      val dir = graft.TempDirs.scratch("wab").toString
      val meta = TableMeta("wb", "ts_us", tags = Seq("host"),
        fields = Seq(FieldMeta("v", None)), bucketUs = arm.bucket)
      spark.conf.set("graft.store.clusterAppend", arm.cluster.toString)
      val t0 = System.nanoTime()
      // bounds as the Engine ingest path passes them (free with its count
      // aggregation): this batch spans 100 s — one 1 h bucket
      graft.sources.MeasurementStore.append(spark, dir, meta, batch,
        keyTags = arm.tags,
        timeBounds = Some((1000000000L, 1000000000L + (n - 1) * 1000L)))
      results(arm.name) ::= n / ((System.nanoTime() - t0) / 1e9)
      spark.conf.unset("graft.store.clusterAppend")
      fileCounts(arm.name) = files(dir)
    }
    // first round is warm-up; medians over the rest
    val meds = arms.map(a => a.name -> med(results(a.name).dropRight(1))).toMap
    arms.foreach { a =>
      println(f"RESULT arm=${a.name}%-8s pps=${meds(a.name)}%.0f files=${fileCounts(a.name)} ratio_vs_flat=${meds("flat") / meds(a.name)}%.2f")
    }
    spark.stop()
  }
}
