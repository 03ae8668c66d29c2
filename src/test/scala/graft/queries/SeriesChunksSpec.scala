package graft.queries

import graft.{Registry, SparkSpec}

/** The chunk-parallel series folds (SeriesChunks) claim BIT-EXACT parity
  * with the sequential per-series windows they replace — not just same
  * values, the same doubles. Forced below the size gate, every affected
  * gate must produce the identical multiset either way, and the chunked
  * plan must actually engage (the __chunk column proves it). */
class SeriesChunksSpec extends SparkSpec {

  private val gates = Seq("e_moving_avg3", "e_difference", "e_derivative",
    "e_elapsed", "e_cumulative_sum")

  private def rows(name: String): Seq[String] = {
    val q = Registry.suites.find(_.name == name).get
    q.fn(spark, sfDir).collect().map(_.toSeq.mkString("|")).sorted.toSeq
  }

  test("chunked folds are bit-exact vs the sequential windows and engage when forced") {
    try {
      for (n <- gates) {
        spark.conf.set("graft.seriesFold.minBytes", "0")
        spark.conf.set("graft.seriesFold.chunks", "8")
        val q = Registry.suites.find(_.name == n).get
        val df = q.fn(spark, sfDir)
        assert(df.queryExecution.optimizedPlan.toString.contains("__chunk"),
          s"$n did not take the chunked path")
        val chunked = df.collect().map(_.toSeq.mkString("|")).sorted.toSeq
        spark.conf.set("graft.seriesFold.chunks", "1") // sequential fallback
        val sequential = rows(n)
        assert(chunked == sequential,
          s"$n chunked/sequential diverge: ${chunked.size} vs ${sequential.size} rows; " +
            s"first diff: ${chunked.zip(sequential).find(p => p._1 != p._2)}")
      }
    } finally {
      spark.conf.unset("graft.seriesFold.minBytes")
      spark.conf.unset("graft.seriesFold.chunks")
    }
  }
}
