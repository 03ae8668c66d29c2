package graft.queries

import graft.{SparkSpec, SparkEntry}

/** Partitioning-independence for the corpus-prep operators: the oracle
  * proves one execution correct; this pins that the RESULT doesn't
  * depend on the shuffle width (the thing that changes between
  * local[32] and a 1000-executor cluster). Integer quantize-before-sum,
  * total-ordered windows, and (dist, id) tie-breaks are exactly the
  * mechanisms that make this hold — a float mean or an unordered rank
  * would fail here first. */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("new corpus-prep gates are shuffle-width independent") {
    for (name <- Seq("d_bigram_lm", "d_pack_sequences", "d_repeated_spans",
        "em_semdedup", "em_cluster_reps", "mm_phash", "e_asof_attrib",
        "d_global_shuffle", "d_incr_neardup")) {
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val wide = rows(name)
      spark.conf.set("spark.sql.shuffle.partitions", "5")
      val narrow = try rows(name)
      finally spark.conf.set("spark.sql.shuffle.partitions", "32")
      assert(wide == narrow, s"$name differs across shuffle widths")
      assert(wide.nonEmpty, s"$name produced no rows")
    }
  }

  test("results are input-split independent (tiny maxPartitionBytes)") {
    // a cluster reads the same file in many small splits — per-split
    // folds must re-associate to the same answer
    for (name <- Seq("d_bigram_lm", "d_pack_sequences", "em_cluster_reps",
        "d_global_shuffle")) {
      val coarse = rows(name)
      spark.conf.set("spark.sql.files.maxPartitionBytes", (64 * 1024).toString)
      val fine = try rows(name)
      finally spark.conf.set("spark.sql.files.maxPartitionBytes",
        (128 * 1024 * 1024).toString)
      assert(coarse == fine, s"$name differs across input-split widths")
    }
  }
}
