package graft.tools

import graft.SparkSpec

/** The end-to-end corpus-prep composition: every stage is a registry
  * gate, so this spec checks the COMPOSITION properties the per-gate
  * oracles can't — monotone reduction, planted-duplicate collapse,
  * deterministic re-run, and the sharded layout of the final write. */
class CorpusPipelineSpec extends SparkSpec {

  test("pipeline reduces monotonically, collapses planted dups, writes sharded corpus") {
    val out = graft.TempDirs.scratch("graft_corpus").toString
    val ledger = CorpusPipeline.run(spark, "/root/testdata/sf0.001", out)
    val m = ledger.toMap

    // monotone reduction through the stages, nothing vacuous
    val order = Seq("ingested", "exact_dedup", "near_dedup", "quality", "decontaminated")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(m(a) >= m(b), s"$a=${m(a)} < $b=${m(b)}")
    }
    assert(m("ingested") == 2 * 500L, "universe = base + replicas")
    // every planted exact replica collapses onto its base canonical
    assert(m("exact_dedup") == 500L, s"exact dedup kept ${m("exact_dedup")}")
    assert(m("decontaminated") > 100L, "pipeline dropped nearly everything")

    // survivors contain no replica ids (canonical = min id = base id)
    val corpus = spark.read.parquet(s"$out/corpus")
    assert(corpus.where(org.apache.spark.sql.functions.col("doc_id") >= 1000000L).isEmpty)
    // sharded layout: one directory per shard value
    val shards = new java.io.File(s"$out/corpus").listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shards.nonEmpty && shards.length <= 64, s"${shards.length} shard dirs")
    assert(corpus.count() == m("decontaminated"))

    // deterministic: a re-run produces the identical ledger
    val out2 = graft.TempDirs.scratch("graft_corpus2").toString
    assert(CorpusPipeline.run(spark, "/root/testdata/sf0.001", out2) == ledger)
  }
}
