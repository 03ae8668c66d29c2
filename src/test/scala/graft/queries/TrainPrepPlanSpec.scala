package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Plan-shape assertions for the corpus-prep operators — the properties
  * that matter at 100 TB and that a green oracle row can't see:
  * column pruning reaches the parquet scan (a shard/pack assignment that
  * reads all five document columns ships 2× the bytes), and the
  * window-based ops stay at ONE exchange (the self-join formulations
  * they replace would add joins/broadcasts). */
class TrainPrepPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("d_shard_export prunes the scan to (doc_id, text, n_chars)") {
    val p = plan("d_shard_export")
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("n_chars"), read)
    assert(!read.contains("lang") && !read.contains("source"),
      s"shard export reads columns it never uses: $read")
  }

  test("d_pack_sequences and e_asof_attrib run on a single exchange") {
    for (name <- Seq("d_pack_sequences", "e_asof_attrib", "e_range_count")) {
      val p = plan(name)
      val exchanges = p.linesIterator.count(l =>
        l.contains("Exchange") && !l.contains("Broadcast"))
      assert(exchanges == 1, s"$name: expected 1 shuffle, got $exchanges\n$p")
      assert(!p.contains("CartesianProduct"), s"$name grew a cartesian join")
    }
  }

  test("d_bigram_lm / d_repeated_spans never build a cartesian join") {
    for (name <- Seq("d_bigram_lm", "d_repeated_spans", "d_tfidf_topterms")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name grew a cartesian join\n$p")
    }
  }
}
