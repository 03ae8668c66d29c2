package graft.tools

/** Plan-audit helper: print the formatted physical plan of one or more
  * registered gates without executing them — the `.explain("formatted")`
  * review loop the round methodology calls for, runnable against any sf
  * dir.
  *
  * Usage: Explain <sfDir> <gate>[,<gate>...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-explain")
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(Seq(graft.Registry.validated.head.name))
    val byName = graft.Registry.validated.map(q => q.name -> q).toMap
    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown gate: $n"))
      println(s"==== $n ====")
      println(q.fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
