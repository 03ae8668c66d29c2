package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.execution.ui.{SparkListenerSQLExecutionStart}
import scala.collection.mutable

/** Per-gate Spark-job census (optimization-round measurement harness):
  * runs each named gate once un-timed (warm-up) and once timed with a
  * listener recording every job's wall time and its SQL-execution
  * attribution. At sf0.1 the corpora are MBs, so gate seconds are
  * dominated by fixed per-job/per-stage overhead — this tool answers
  * "how many jobs/actions does this gate launch and where do its seconds
  * sit", which `Bench`'s single median number cannot.
  *
  * Attribution: AQE materializes query stages as separate jobs from a
  * thread pool (short site = CompletableFuture), so jobs are keyed by
  * their `spark.sql.execution.id` and mapped to the root action's call
  * site from SparkListenerSQLExecutionStart.
  *
  * Usage: ProfileGate <sfDir> <gate>[,<gate>...]
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-profile")
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: ProfileGate <sfDir> <gate>[,...]"))
    val byName = graft.Registry.validated.map(q => q.name -> q).toMap

    val execSite = mutable.Map.empty[Long, String]
    case class JobRow(id: Int, execId: Long, ms: Long, stages: Int)
    val rows = mutable.ArrayBuffer.empty[JobRow]
    val starts = mutable.Map.empty[Int, (Long, Long, Int)]
    var record = false
    val listener = new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          execSite(e.executionId) = e.description.linesIterator.toSeq.headOption.getOrElse("")
        case _ =>
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val execId = Option(e.properties.getProperty("spark.sql.execution.id"))
          .map(_.toLong).getOrElse(-1L)
        starts(e.jobId) = (e.time, execId, e.stageInfos.size)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (record) {
        starts.remove(e.jobId).foreach { case (t0, execId, ns) =>
          rows += JobRow(e.jobId, execId, e.time - t0, ns)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val q = byName.getOrElse(n, sys.error(s"unknown gate: $n"))
      def once(): Double = {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        q.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      rows.clear(); starts.clear()
      record = true
      val sec = once()
      record = false
      // listener bus is async (and its drain API is private[spark]) —
      // give it a beat before reading
      Thread.sleep(800)
      println(f"==== $n%s total=$sec%.2fs jobs=${rows.size}%d jobsum=${rows.map(_.ms).sum / 1000.0}%.2fs")
      // per-action rollup: all jobs of one SQL execution under its site
      val byExec = rows.groupBy(_.execId).toSeq
        .map { case (eid, rs) =>
          (eid, rs.map(_.ms).sum, rs.size, execSite.getOrElse(eid, "<no-sql-exec>"))
        }.sortBy(-_._2)
      byExec.foreach { case (eid, ms, nj, site) =>
        println(f"  exec=$eid%4d ${ms}%6dms jobs=$nj%2d  ${site.take(110)}%s")
      }
    }
    spark.stop()
  }
}
