package graft.tools

/** Standalone write-path throughput probe — EXACTLY `Bench.writeBench`'s
  * shape (100k-point line-protocol batches through the full ingest path,
  * warm-up + median of 3), runnable on its own so interleaved A/B arms
  * (old classes vs new) can alternate inside one window without paying a
  * 220-gate sweep per sample. Args: [free|durable] [rounds].
  * Prints one line per round: `pps=<points/s>`.
  */
object WriteBench {
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val durable = args.lift(0).forall(_ == "durable")
    val rounds = args.lift(1).map(_.toInt).getOrElse(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.build("graft-writebench")
    val points = 100000
    val batch = (0 until points).map(i =>
      s"wbench,host=h${i % 32} v=${i % 997},u=${i}i ${1000000000L + i.toLong * 1000}")
    def once(): Double = {
      val dir = if (durable)
        Some(graft.TempDirs.scratch("graft_wbench").toString)
      else None
      val e = new graft.Engine(spark, sfDir, dir)
      val t0 = System.nanoTime()
      val (ok, bad) = e.writeLineProtocol(batch, "wbench")
      require(ok == points && bad == 0, s"write bench: ok=$ok bad=$bad")
      points / ((System.nanoTime() - t0) / 1e9)
    }
    (1 to rounds).foreach { _ =>
      once() // warm-up
      println(f"pps=${median(Seq.fill(3)(once()))}%.1f")
    }
    spark.stop()
  }
}
