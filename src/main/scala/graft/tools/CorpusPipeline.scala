package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end corpus-preparation pipeline — the composition a migrating
  * user actually runs, built ENTIRELY from the registry's oracle-gated
  * operators (each stage is a `SparkEntry.queries` entry, so every
  * decision this pipeline makes is independently DuckDB-verified):
  *
  *   raw docs (+ redelivered replicas)
  *     → exact dedup        (d_dedup_exact: canonical = min doc_id)
  *     → near-dup prune     (d_lsh_pairs: drop the higher id of each
  *                           verified pair — banded LSH, sub-quadratic)
  *     → quality gates      (d_curation_ledger: length/quality/
  *                           repetition keep verdicts, auditable)
  *     → decontamination    (d_decontaminate: benchmark n-gram overlap)
  *     → shard + pack       (the d_shard_export / d_pack_sequences
  *                           assignment over the survivors)
  *     → partitioned write  (partitionBy(shard) parquet — the layout a
  *                           trainer's data loader reads)
  *
  * Every stage is a keyed join/aggregation over doc_id — no driver-side
  * loops, no collect of corpus-sized data; the drop DECISIONS flow as
  * DataFrames. Returns the per-stage ledger (stage, n_docs) the run
  * writes alongside the corpus (`_ledger` subdir).
  */
object CorpusPipeline {

  def run(spark: SparkSession, sfDir: String, outDir: String): Seq[(String, Long)] = {
    val q = SparkEntry.queries

    // stage 0: the ingest universe — base corpus + the redelivered
    // replica fixture (same construction as the dedup gates)
    val base = Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "source", "text", "n_chars")
    val universe = base.union(base.withColumn("doc_id", col("doc_id") + 1000000L))
      .persist()

    // stage 1: exact dedup — survivors are the canonical ids
    val exact = q("d_dedup_exact")(spark, sfDir)
      .select(col("canonical_id").as("doc_id"))
    val s1 = universe.join(exact, "doc_id").persist()

    // stage 2: near-dup prune — drop the higher id of every verified pair
    val drops = q("d_lsh_pairs")(spark, sfDir)
      .select(greatest(col("doc_a"), col("doc_b")).as("doc_id")).distinct()
    val s2 = s1.join(drops, Seq("doc_id"), "left_anti")

    // stage 3: quality gates (ledger keep verdicts, base-id domain)
    val keep = q("d_curation_ledger")(spark, sfDir)
      .where(col("keep")).select("doc_id")
    val s3 = s2.join(keep, "doc_id")

    // stage 4: decontamination against the benchmark shingle set
    val clean = q("d_decontaminate")(spark, sfDir)
      .where(!col("contaminated")).select("doc_id")
    val s4 = s3.join(clean, "doc_id").persist()

    // stage 5: shard + pack assignment over the survivors (the
    // d_shard_export / d_pack_sequences construction)
    val h = (p: String) => conv(substring(md5(
      concat(lit(p), col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val packed = s4
      .withColumn("n_toks", size(split(col("text"), " ")).cast("long"))
      .withColumn("shard", h("shard:") % 64)
      .withColumn("start_off", sum("n_toks").over(w) - col("n_toks"))
      .withColumn("pack_id", expr("start_off div 2048"))

    // stage 6: the corpus that ships — one directory per shard
    packed.write.mode("overwrite").partitionBy("shard").parquet(s"$outDir/corpus")

    val ledger = Seq(
      "ingested" -> universe.count(),
      "exact_dedup" -> s1.count(),
      "near_dedup" -> s2.count(),
      "quality" -> s3.count(),
      "decontaminated" -> s4.count())
    import spark.implicits._
    ledger.toDF("stage", "n_docs").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/_ledger")
    universe.unpersist(); s1.unpersist(); s4.unpersist()
    ledger
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-corpus-pipeline")
    val ledger = run(spark,
      args.lift(0).getOrElse("/root/testdata/sf0.01"),
      args.lift(1).getOrElse("target/corpus_out"))
    ledger.foreach { case (s, n) => println(f"$s%-16s $n%8d") }
    spark.stop()
  }
}
