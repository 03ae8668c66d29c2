package graft
import org.apache.spark.sql.SparkSession

/** Throwaway probe main (deleted before final). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(3, false)
    } catch { case e: Throwable => println("PLAIN READ FAILED: " + e.getMessage) }
    try {
      val ev2 = spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema()
      df.show(3, false)
    } catch { case e: Throwable => println("NANOS-AS-LONG READ FAILED: " + e.getMessage) }
    spark.stop()
  }
}
