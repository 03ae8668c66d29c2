package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted, incrementally-maintained BM25 postings index (VERDICT r15
  * #1) — the text analog of the vector ladder's build-once/query-many
  * shape. `EmbedOps.hybridRrf` recomputes postings per query batch, so
  * hybrid retrieval paid a corpus text scan the vector side no longer
  * pays; this index moves the text side at rest.
  *
  * Layout at `indexDir`:
  *   - `postings.parquet/tb=N/` — (term, doc_id, tf, dl) laid out
  *     `partitionBy(tb)` where `tb = pmod(xxhash64(term), TB)`: a query's
  *     term buckets push as PartitionFilters, so the scoring scan reads
  *     ≈ |query-term buckets|/TB of the postings — never the corpus text
  *     (the `d_inverted_index` df-filter discipline, made at-rest).
  *   - `postings.delta.parquet/` — the flat L0 tier (tb as a data
  *     column): each appended batch lands as ONE file, folded into the
  *     partitioned layout every `graft.ivf.deltaMaxFiles` files — the
  *     exact delta/fold/marker machinery the vector tiers use
  *     (EmbedOps.foldDeltaAt, shared, pcol = "tb").
  *   - `doclen.parquet/` — one (doc_id, dl) row per document, flat. The
  *     BM25 corpus constants (N docs, Σ length → avgdl) are an exact
  *     integer aggregate over it: 2 scalars from the index's SMALLEST
  *     artifact (one row per doc — at 100 TB of text this is the
  *     column-pruned metadata scan, not the postings). Kept per-doc
  *     rather than as increment rows so DELETE stays idempotent: a
  *     retried takedown anti-joins the same ids to the same result,
  *     where a (−ddocs, −dtokens) increment row would double-decrement
  *     on replay (the IndexStream scrub re-runs the whole delete).
  *
  * Lifecycle parity with the vector indexes: append is O(batch) (one
  * tokenize/tf pass, one delta file, one doclen append), delete rewrites
  * ONLY the term buckets the doc's terms hash to (partition-pruned
  * anti-join, two-rename swap, `del`/`compact` namespaces shared with
  * `EmbedOps.deleteFromPartitioned`), compact collapses hot buckets'
  * append debris, and every crash window is healed by `reconcile` /
  * refused loudly by the read guard (`requireNoSwapDebris`, pcol "tb").
  *
  * Scoring exactness: `bm25RankIndexed` reproduces
  * `EmbedOps.bm25Rank`'s arithmetic operation-for-operation (rational
  * log-free idf, micro-quantized per-term contributions, BIGINT per-doc
  * sums), sourced from the at-rest postings instead of an in-gate
  * tokenize — `em_hybrid_rrf_persisted` shares `hybridRrfOracleSql`
  * byte-identically on that basis.
  *
  * Reference anchor: the reference's standing-CQ import path
  * (`syncing/importer.go:323-333`) applies new points against existing
  * state rather than recomputing it — this is that discipline for the
  * retrieval index's text half.
  */
object TextIndex {

  /** Term-bucket count. Fixed like the near-dup index's `doc_id%64`
    * layout: the partition count is a layout constant (rewrites are
    * O(affected buckets)), per-bucket VOLUME scales out via file count
    * inside each bucket dir + `bm25Compact`'s target-bytes splitting. */
  private val TB = 64

  // BM25 parameters — the LITERAL constants EmbedOps.bm25Rank uses
  // (k1 = 1.2, b = 0.75; 2.2 = k1+1, 0.25 = 1−b), spelled identically so
  // the scoring doubles are the same bit patterns, not derived values.

  /** One tokenize → tf pass over a (doc_id, text) corpus: the postings
    * rows (term, doc_id, tf, dl) plus their term bucket. Whitespace
    * tokenization — the shared convention of every text gate. */
  private def tfRows(corpus: DataFrame): DataFrame =
    corpus
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      .withColumn("tb", pmod(xxhash64(col("term")), lit(TB.toLong)))

  private def doclenRows(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))

  /** Build the index from a (doc_id, text) corpus: postings partitioned
    * by term bucket (each bucket clustered to one file — the ivfBuildV
    * landing discipline), plus the per-doc length table. */
  def bm25Build(corpus: DataFrame, indexDir: String): Unit = {
    tfRows(corpus)
      .repartition(col("tb"))
      .write.mode("overwrite").partitionBy("tb")
      .parquet(s"$indexDir/postings.parquet")
    doclenRows(corpus)
      .write.mode("overwrite").parquet(s"$indexDir/doclen.parquet")
  }

  /** Incremental maintenance: tokenize ONLY the new docs (map-only +
    * one bounded per-doc groupBy), land the batch as ONE file in the
    * postings delta tier (fold amortized — the LSM L0 landing every
    * vector tier uses) and append the batch's doclen rows. Returns docs
    * appended. Duplicate doc_ids are the caller's contract, exactly as
    * vec_ids are for the vector appends (IndexStream's marker+scrub
    * makes stream replays idempotent). */
  def bm25Append(s: SparkSession, newDocs: DataFrame, indexDir: String): Long = {
    reconcile(s, indexDir)
    val n = newDocs.count()
    if (n > 0) {
      tfRows(newDocs).coalesce(1).write.mode("append")
        .parquet(s"$indexDir/postings.delta.parquet")
      doclenRows(newDocs).coalesce(1).write.mode("append")
        .parquet(s"$indexDir/doclen.parquet")
      val maxFiles = s.conf.get("graft.ivf.deltaMaxFiles", "64").toInt
      val (f, deltaP) = EmbedOps.hfs(s, s"$indexDir/postings.delta.parquet")
      if (EmbedOps.parquetFileCount(f, deltaP) >= maxFiles)
        bm25FoldDelta(s, indexDir)
    }
    n
  }

  /** The postings tier's L0→L1 fold (postings.delta.parquet →
    * postings.parquet), sharing the vector tiers' marker protocol under
    * the text namespace. */
  def bm25FoldDelta(s: SparkSession, indexDir: String): Unit =
    EmbedOps.foldDeltaAt(s, indexDir, "postings.delta.parquet",
      "postings.fold.tmp", "postings.fold.consumed", "postings.parquet", "tb")

  /** Targeted takedown: fold first (a delete around an unfolded delta
    * would resurface the doc's postings at the next fold), then rewrite
    * ONLY the term buckets the doc's terms hash to (column-pruned
    * (doc_id, tb) scan → broadcast-join → partition-pruned anti-join —
    * O(affected buckets), never O(index)), then drop the doclen rows
    * (flat tmp+swap). Idempotent end to end: a crashed-and-retried
    * delete anti-joins the same ids again — both halves converge, so the
    * IndexStream scrub can re-run it blindly. Returns docs deleted. */
  def bm25Delete(s: SparkSession, indexDir: String, ids: DataFrame): Long = {
    reconcile(s, indexDir)
    bm25FoldDelta(s, indexDir)
    EmbedOps.deleteFromPartitioned(s, indexDir, "postings.parquet",
      "postings.del", ids, pcol = "tb", idCol = "doc_id")
    EmbedOps.deleteFlat(s, s"$indexDir/doclen.parquet", ids, idCol = "doc_id")
  }

  /** Hot-bucket compaction: collapse sustained appends' per-bucket file
    * debris (postings.compact namespace, salt on doc_id). */
  def bm25Compact(s: SparkSession, indexDir: String, ifMoreThan: Int = 8,
      targetBytes: Long = 512L << 20): Seq[(Long, Int, Int)] = {
    reconcile(s, indexDir)
    bm25FoldDelta(s, indexDir)
    EmbedOps.compactPartitioned(s, indexDir, "postings.parquet",
      "postings.compact", ifMoreThan, targetBytes, pcol = "tb",
      idCol = "doc_id")
  }

  /** Heal any crash state this index's namespaces can carry — the
    * maintenance-entry reconciliation (every op above runs it first;
    * reads never do — they refuse loudly instead). */
  def reconcile(s: SparkSession, indexDir: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    Seq("postings.del.tmp", "postings.compact.tmp").foreach { ns =>
      val tmpRoot = new org.apache.hadoop.fs.Path(s"$indexDir/$ns")
      val f = tmpRoot.getFileSystem(conf)
      if (f.exists(tmpRoot)) {
        f.listStatus(tmpRoot)
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("tb="))
          .foreach { st =>
            val live = new org.apache.hadoop.fs.Path(
              s"$indexDir/postings.parquet/${st.getPath.getName}")
            if (!f.exists(live) && !f.rename(st.getPath, live))
              sys.error(s"swap heal failed: ${st.getPath} -> $live")
          }
        f.delete(tmpRoot, true)
      }
    }
    val f = new org.apache.hadoop.fs.Path(indexDir).getFileSystem(conf)
    // the flat doclen swap (deleteFlat's tmp): tmp alone → finish;
    // both present → swap never started, discard tmp
    val live = new org.apache.hadoop.fs.Path(s"$indexDir/doclen.parquet")
    val ltmp = new org.apache.hadoop.fs.Path(s"$indexDir/doclen.parquet.tmp")
    if (f.exists(ltmp)) {
      if (!f.exists(live)) {
        if (!f.rename(ltmp, live)) sys.error(s"swap heal failed: $ltmp -> $live")
      } else f.delete(ltmp, true)
    }
    EmbedOps.healFoldAt(f, indexDir, "postings.parquet",
      "postings.fold.tmp", "postings.fold.consumed", "tb")
  }

  /** The postings' LIVE logical content — partitioned tier ∪ (bounded)
    * delta — as (term, doc_id, tf, dl, tb[string]). `filterBuckets`
    * lands as PartitionFilters on the partitioned tier (raw string
    * compare, the ivfCompact precedent) and as a pushed predicate over
    * the delta's few files; appended-but-unfolded postings are always
    * visible, and a crashed maintainer's loss window fails loudly. */
  private def postingsLiveRows(s: SparkSession, indexDir: String,
      filterBuckets: Option[Seq[String]]): DataFrame = {
    EmbedOps.requireNoSwapDebris(s, indexDir, "postings.parquet",
      Seq("postings.del", "postings.compact"), "postings.fold.tmp",
      "postings.fold.consumed", pcol = "tb")
    val (f, liveP) = EmbedOps.hfs(s, s"$indexDir/postings.parquet")
    val deltaP = new org.apache.hadoop.fs.Path(s"$indexDir/postings.delta.parquet")
    def shape(df: DataFrame): DataFrame = {
      val pruned = filterBuckets.fold(df)(bs => df.where(col("tb").isin(bs: _*)))
      pruned.select(col("term"), col("doc_id"), col("tf"), col("dl"),
        col("tb").cast("string").as("tb"))
    }
    val parts = Seq(
      if (f.exists(liveP) && f.listStatus(liveP).nonEmpty)
        Some(shape(s.read.parquet(liveP.toString))) else None,
      if (f.exists(deltaP))
        Some(shape(s.read.parquet(deltaP.toString))) else None).flatten
    require(parts.nonEmpty, s"no postings content at $indexDir")
    parts.reduce(_ union _)
  }

  /** The exact BM25 corpus constants from the per-doc length table:
    * (N docs, Σ length) — integer aggregates, order-free. */
  private def corpusStats(s: SparkSession, indexDir: String): (Long, Long) = {
    val r = s.read.parquet(s"$indexDir/doclen.parquet")
      .agg(count(lit(1)).cast("long"), sum("dl").cast("long")).head
    (r.getLong(0), r.getLong(1))
  }

  /** Per-query BM25 top-`topn` from the AT-REST index, byte-identical to
    * `EmbedOps.bm25Rank` over the same corpus content. Query docs
    * (doc_id < nq) tokenize from the corpus table (bounded — nq docs);
    * their distinct terms' buckets are collected (≤ query vocabulary,
    * the probe-list materialization) and pushed as PartitionFilters, so
    * the scoring pass reads ONLY the probed buckets: df for the query
    * terms and the posting-bounded scoring join both run on that pruned
    * scan. Returns (qid, id, rt ≤ topn). */
  def bm25RankIndexed(s: SparkSession, d: String, indexDir: String,
      nq: Int, topn: Int): DataFrame = {
    val (nDocs, lTot) = corpusStats(s, indexDir)
    val avgdl = lTot.toDouble / nDocs.toDouble
    val qt = graft.Tables(s, d, "documents")
      .where(col("doc_id") < nq)
      .select(col("doc_id").as("qid"),
        explode(split(col("text"), " ")).as("term"))
      .distinct()
    // probed term buckets: engine-computed (the same xxhash64 the layout
    // used), collected — bounded by the query docs' vocabulary
    val probed = qt
      .select(pmod(xxhash64(col("term")), lit(TB.toLong)).cast("string").as("tb"))
      .distinct().collect().map(_.getString(0)).toSeq
    val live = postingsLiveRows(s, indexDir, Some(probed))
    // df for query terms only, from the pruned scan (every posting of a
    // query term lives in its probed bucket, so the count is the full df)
    val dfr = live.join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val qd = qt.join(dfr, Seq("term"))
    val idf = (lit(nDocs.toDouble) - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val denom = col("tf").cast("double") + lit(1.2) *
      (lit(0.25) + lit(0.75) * (col("dl").cast("double") / lit(avgdl)))
    val contrib = floor(idf * (col("tf").cast("double") * lit(2.2)) / denom
      * lit(1000000.0) + lit(0.5)).cast("long")
    live.join(broadcast(qd), Seq("term"))
      .where(col("doc_id") =!= col("qid"))
      .select(col("qid"), col("doc_id"), contrib.as("cm"))
      .groupBy("qid", "doc_id").agg(sum("cm").as("bm25_micro"))
      .withColumn("rt", row_number().over(Window.partitionBy("qid")
        .orderBy(col("bm25_micro").desc, col("doc_id").asc)))
      .where(col("rt") <= topn)
      .select(col("qid"), col("doc_id").as("id"), col("rt"))
  }
}
