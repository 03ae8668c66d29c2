package graft.tools

/** Decade probe for the zero-downtime retrain path (VERDICT r16 #2):
  * `ivfRebuild` is maintenance work — O(index) by definition, never on a
  * query path — so its scale evidence is a direct timing of the rebuild
  * itself at two corpus sizes, not a Bench gate. Builds a persisted IVF
  * index from the corpus' embeddings, then times the full
  * train-beside + atomic-cutover cycle (median of 3; each cycle retrains
  * from the index's own live rows, so repeat cost is stationary).
  *
  * Usage: RebuildDecade <sfDir> [workDir]
  * Prints ONE JSON line {n_vecs, build_s, rebuild_s}.
  */
object RebuildDecade {

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val work = args.lift(1).getOrElse(
      graft.TempDirs.scratch("graft_rebuild_decade").toString)
    val idx = s"$work/ivf"
    val spark = graft.Sessions.build("graft-rebuild-decade")
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val buildS = time(graft.queries.EmbedOps.ivfBuild(spark, sfDir, idx, None))
    val runs = Seq.fill(3)(time(graft.queries.EmbedOps.ivfRebuild(spark, idx)))
      .sorted
    println(s"""{"n_vecs":$n,"build_s":$buildS,"rebuild_s":${runs(1)},""" +
      s""""rebuild_runs":[${runs.mkString(",")}]}""")
    spark.stop()
  }
}
