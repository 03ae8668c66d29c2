package graft.queries

import graft.{Registry, SparkSpec}

/** Plan-shape pins for the document-pipeline additions — the 100 TB claims
  * as assertions, not comments: the per-doc hygiene stages must stay
  * map-only (zero shuffles at any corpus size), and the corpus-wide
  * heavy-hitter top-k must plan as TakeOrderedAndProject (per-partition
  * heaps), never a full global sort. */
class DocPlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val q = Registry.suites.find(_.name == name)
      .getOrElse(fail(s"no such query: $name"))
    q.fn(spark, sfDir).queryExecution.executedPlan.toString
  }

  private def countExchanges(p: String): Int =
    "(?<!Broadcast)Exchange".r.findAllIn(p).size

  test("per-doc hygiene stages are map-only: zero shuffle Exchanges") {
    for (name <- Seq("d_repetition_stats", "d_pii_scrub", "d_chunk_windows")) {
      val p = plan(name)
      assert(countExchanges(p) == 0, s"$name shuffles:\n$p")
    }
  }

  test("heavy-hitter top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("d_top_ngrams")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("stratified sampling is map-only; the curation ledger shuffles only for canonicalization") {
    assert(countExchanges(plan("d_stratified_sample")) == 0)
    // one hash-aggregate exchange (text-hash canonical) + the join back:
    // anything beyond 2 means a gate stopped being map-only
    assert(countExchanges(plan("d_curation_ledger")) <= 2,
      plan("d_curation_ledger"))
  }

  test("quadratic Jaccard baseline refuses buckets over the cardinality cap") {
    // the exact all-pairs baseline is quadratic per (lang, source) bucket;
    // above the cap it must fail LOUDLY (pointing at the LSH path), never
    // silently grind — the guard is what makes it safe to keep at scale
    spark.conf.set("graft.shingleJaccard.bucketCap", "10")
    try {
      val q = Registry.suites.find(_.name == "d_shingle_jaccard").get
      val err = intercept[Exception](q.fn(spark, sfDir).collect())
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(err).exists(m => m.contains("quadratic baseline refused")),
        msgs(err).mkString("\n"))
    } finally spark.conf.unset("graft.shingleJaccard.bucketCap")
    // back under the default cap the gate computes normally
    val ok = Registry.suites.find(_.name == "d_shingle_jaccard").get
      .fn(spark, sfDir).limit(1).collect()
    assert(ok.nonEmpty)
  }

  test("incremental near-dup reads the persisted index, never re-shingling the old corpus") {
    // the scale claim of d_incr_neardup: the existing corpus enters the
    // plan ONLY through its at-rest index tables (bands + shingle store);
    // shingling work is O(new batch)
    val p = plan("d_incr_neardup")
    assert(p.contains("bands.parquet"), p)
    assert(p.contains("shingles.parquet"), p)
    // shingling appears ONLY in the new-batch subtree: the fixture union
    // has 2 branches and the cached batch's plan echoes under both its
    // consumers (cand + verify) → 4 word_grams projections. More would
    // mean the OLD corpus is being re-shingled instead of read from the
    // index (the un-indexed formulation shows 8+).
    assert("word_grams".r.findAllIn(p).size <= 4,
      s"old corpus re-shingled:\n$p")
  }

  test("single-token docs don't crash the n-gram builders (sequence(1,0) is " +
      "DESCENDING in Spark — ADVICE r6)") {
    import org.apache.spark.sql.functions.col
    val dir = graft.TempDirs.scratch("doc-short-").toString
    val s = spark
    import s.implicits._
    Seq(
      (1L, "lone", "en", "src0", 4L), // one token: no 2-grams at all
      (2L, "two toks", "en", "src0", 8L), // two tokens: 2-grams, no 3-grams
      (3L, "the quick brown fox jumps over the lazy dog again and again", "en",
        "src0", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def run(name: String) = Registry.suites.find(_.name == name).get.fn(spark, dir)
    // repetition stats: docs without 3-grams are excluded (the oracle's
    // inner joins drop them), everything else computes
    val rep = run("d_repetition_stats").collect()
    assert(rep.map(_.getLong(0)).toSet == Set(3L), rep.mkString("\n"))
    // the ledger must still COVER every doc: short ones are 'too_short'
    val ledger = run("d_curation_ledger").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ledger.keySet == Set(1L, 2L, 3L), ledger)
    assert(ledger(1L) == "too_short" && ledger(2L) == "too_short", ledger)
    // heavy hitters: the lone token contributes no grams, no crash
    val grams = run("d_top_ngrams").collect().map(_.getString(0))
    assert(grams.contains("again and"), grams.mkString(", "))
  }
}
