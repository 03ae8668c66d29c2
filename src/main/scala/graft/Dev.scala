package graft

/** Scratch runner: `runMain graft.Dev <sfDir> <queryName>...` — runs the
  * named SparkEntry queries, shows rows + schema. Iteration tool only;
  * the correctness gate is Verify + the DuckDB compare. */
object Dev {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.build("graft-dev")
    args.tail.foreach { name =>
      println(s"==== $name")
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        if (sys.env.contains("GRAFT_DEV_EXPLAIN")) df.explain("formatted")
        else { df.show(20, false); df.printSchema() }
      } catch { case e: Throwable =>
        println(s"FAILED: ${e}"); e.printStackTrace()
      }
    }
    spark.stop()
  }
}
