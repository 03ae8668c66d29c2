package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-preparation operators a large-scale training-data pipeline runs
  * AFTER the per-document filters in DocText: statistical quality scoring
  * against a corpus-trained language model, exact repeated-span detection
  * (substring-level dedup), source-mixing weights, and deterministic shard
  * export — the steps between "filtered documents" and "training shards".
  *
  * Cross-engine determinism discipline (same as DocText/EmbedOps): every
  * fractional quantity is computed as exact-integer arithmetic plus ONE
  * identical IEEE op sequence (a correctly-rounded double division /
  * multiply / sqrt), quantized with floor(x*scale+0.5) BEFORE any
  * cross-row summation — integer sums are order-independent, so results
  * are bit-identical between Spark and the DuckDB oracle regardless of
  * partitioning.
  *
  * Scale notes (100 TB bar):
  *   - The bigram LM trains on vocabulary-sized aggregates (Zipf: the
  *     distinct-gram table is orders of magnitude smaller than the token
  *     stream) and scores by keyed joins — no driver-side model state.
  *   - Repeated-span detection shuffles on a 60-bit span hash, never the
  *     span text; work is linear in total token count.
  *   - Mix weights / shard stats are single partial+final aggregations.
  */
object TrainPrep {

  /** 60-bit deterministic hash, identical in Spark and DuckDB. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  private def H(sql: String): String =
    s"CAST('0x'||substr(md5($sql),1,15) AS BIGINT)"

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")

  /** documents ∪ exact replicas (doc_id+1000000) — the planted-duplicate
    * fixture shared with DocText: every doc has one exact copy, so span
    * dedup provably fires on every document. */
  private def docs2(s: SparkSession, d: String): DataFrame = {
    val base = docs(s, d).select("doc_id", "lang", "source", "text")
    base.union(base.withColumn("doc_id", col("doc_id") + 1000000L))
  }
  private val DOCS2 =
    """d2 AS (SELECT doc_id, lang, source, text FROM documents
      |       UNION ALL
      |       SELECT doc_id+1000000 AS doc_id, lang, source, text FROM documents)""".stripMargin

  def all: Seq[Q] = Seq(

    // ---- corpus-trained bigram LM quality score (the CCNet/KenLM shape:
    //      score each document by how probable its token sequence is under
    //      a language model trained on the corpus itself; low-probability
    //      docs are boilerplate/garbage candidates). Model = add-one-
    //      smoothed bigram conditionals p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V).
    //      Per-position probabilities are quantized to integer nanos
    //      BEFORE the per-doc average, so the score is order-independent
    //      (a log-space mean would hit the libm ulp divergence documented
    //      at iql_scalar_binary; an arithmetic-mean conditional probability
    //      ranks documents the same way for filtering purposes).
    //      Scale: counts tables are vocabulary-sized (Zipf), joins are
    //      keyed on gram/token — broadcastable when small, AQE decides.
    Q("d_bigram_lm",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |uni AS (SELECT unnest(toks) AS tok FROM tk),
        |uc AS (SELECT tok, count(*) AS c1 FROM uni GROUP BY 1),
        |vv AS (SELECT count(*) AS v FROM uc),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []
        |         ELSE list_transform(generate_series(1, len(toks)-1),
        |                             i -> toks[i]||' '||toks[i+1]) END) AS gram
        |       FROM tk),
        |bc AS (SELECT gram, count(*) AS c2 FROM bg GROUP BY 1),
        |t AS (SELECT bg.doc_id,
        |        CAST(floor((bc.c2 + 1.0) / (uc.c1 + vv.v) * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
        |      FROM bg JOIN bc USING (gram)
        |              JOIN uc ON uc.tok = string_split(bg.gram, ' ')[1]
        |              CROSS JOIN vv)
        |SELECT doc_id, count(*) AS n_bigrams,
        |       CAST(sum(term_nano) // count(*) AS BIGINT) AS avg_condp_nano
        |FROM t GROUP BY 1""".stripMargin) { (s, d) =>
      val tk = docs(s, d).select(col("doc_id"), split(col("text"), " ").as("toks"))
      val uc = tk.select(explode(col("toks")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      val vv = uc.agg(count(lit(1)).as("v"))
      val bg = tk.select(col("doc_id"), explode(expr("word_grams(toks, 2)")).as("gram"))
      val bc = bg.groupBy("gram").agg(count(lit(1)).as("c2"))
      bg.join(bc, "gram")
        .withColumn("w1", element_at(split(col("gram"), " "), 1))
        .join(uc.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(broadcast(vv))
        .withColumn("term_nano",
          floor((col("c2") + lit(1.0)) / (col("c1") + col("v")) * lit(1000000000.0) + lit(0.5))
            .cast("long"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          expr("sum(term_nano) div count(1)").as("avg_condp_nano"))
    },

    // ---- exact repeated-span detection (the fixed-granularity reading of
    //      suffix-array substring dedup, Lee et al. 2022): any 8-token
    //      span occurring verbatim in MORE THAN ONE document is a
    //      duplicated span; per document report how much of it is
    //      duplicated text. Planted replicas guarantee every span of every
    //      doc with ≥8 tokens is cross-doc duplicated, so the fixture
    //      exercises the full range. Work is linear in token count; the
    //      shuffle key is a 60-bit span hash (never the span string — at
    //      100 TB the hash column is ~30× narrower than 8-token text).
    Q("d_repeated_spans",
      s"""WITH $DOCS2,
         |tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM d2),
         |sp AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) < 8 THEN []
         |         ELSE list_transform(generate_series(1, len(toks)-7),
         |           i -> toks[i]||' '||toks[i+1]||' '||toks[i+2]||' '||toks[i+3]||' '||
         |                toks[i+4]||' '||toks[i+5]||' '||toks[i+6]||' '||toks[i+7]) END)) AS span
         |       FROM tk),
         |sh AS (SELECT doc_id, ${H("span")} AS spanh FROM sp),
         |c AS (SELECT spanh, count(*) AS n_docs FROM sh GROUP BY 1)
         |SELECT sh.doc_id, count(*) AS n_spans,
         |       CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
         |       CAST(sum(CASE WHEN c.n_docs > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS dup_frac_ppm
         |FROM sh JOIN c USING (spanh) GROUP BY 1""".stripMargin) { (s, d) =>
      val sp = docs2(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          explode(array_distinct(expr("word_grams(toks, 8)"))).as("span"))
        .select(col("doc_id"), h60(col("span")).as("spanh"))
      // per-span doc count as a WINDOW over spanh, not an aggregate
      // joined back: the distinct-span table scales with the CORPUS, and
      // at ×100 docs Spark's stats under-estimated it enough to pick a
      // broadcast build that OOM'd the driver (found by the 500k-doc
      // decade gate). The window is the same one spanh shuffle with no
      // join and no broadcastable side at any scale.
      sp.withColumn("n_docs",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("spanh")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("n_docs") > 1, 1).otherwise(0)).as("n_dup_spans"),
          expr("sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) * 1000000 div count(1)")
            .as("dup_frac_ppm"))
    },

    // ---- dedup APPLIED (not just detected): materialize the survivor
    //      set — canonical = min doc_id per exact-content group — and
    //      report the per-source reduction a curation dashboard shows.
    //      The join back to metadata is keyed on doc_id; the group table
    //      is one hash aggregation. Composes d_dedup_exact's decision
    //      into the corpus that ships.
    Q("d_dedup_apply",
      s"""WITH $DOCS2,
         |g AS (SELECT min(doc_id) AS keep_id, count(*) AS n_copies
         |      FROM d2 GROUP BY md5(text))
         |SELECT d2.source, count(*) AS n_docs,
         |       CAST(sum(len(string_split(d2.text, ' '))) AS BIGINT) AS n_tokens,
         |       CAST(sum(g.n_copies) - count(*) AS BIGINT) AS n_dropped
         |FROM g JOIN d2 ON d2.doc_id = g.keep_id
         |GROUP BY 1""".stripMargin) { (s, d) =>
      val d2 = docs2(s, d)
      val g = d2.groupBy(md5(col("text")).as("h"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      g.join(d2, col("doc_id") === col("keep_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
          (sum("n_copies") - count(lit(1))).cast("long").as("n_dropped"))
    },

    // ---- TF-IDF top terms per document (keyword extraction / topic
    //      signal for curation dashboards). idf is quantized to integer
    //      micros (floor(ln(N/df)·10⁶ + 0.5) — the e_scalar_math/
    //      iql_scalar_binary transcendental discipline) so the score is an
    //      exact integer product tf·idf_micro and the per-doc top-3 is a
    //      deterministic (score desc, term asc) rank. Scale: tf/df are
    //      partial+final aggregations, the scoring join is keyed on term
    //      (vocabulary-sized), the rank window is per-doc.
    Q("d_tfidf_topterms",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tfc AS (SELECT doc_id, unnest(toks) AS term FROM tk),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tfc GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM tk),
        |sc AS (SELECT tf.doc_id, tf.term, tf.tf,
        |         tf.tf * CAST(floor(ln(CAST(nn.n AS DOUBLE) / dfc.df) * 1000000.0 + 0.5) AS BIGINT) AS score_micro
        |       FROM tf JOIN dfc USING (term) CROSS JOIN nn),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                ORDER BY score_micro DESC, term ASC) AS rn FROM sc)
        |SELECT doc_id, term, tf, score_micro, rn FROM r WHERE rn <= 3""".stripMargin) { (s, d) =>
      val tk = docs(s, d).select(col("doc_id"), split(col("text"), " ").as("toks"))
      val tf = tk.select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nn = tk.agg(count(lit(1)).as("n"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("doc_id").orderBy(col("score_micro").desc, col("term").asc)
      tf.join(dfc, "term").crossJoin(broadcast(nn))
        .withColumn("score_micro",
          col("tf") * floor(log(col("n").cast("double") / col("df")) * lit(1000000.0) + lit(0.5)).cast("long"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("doc_id", "term", "tf", "score_micro", "rn")
    },

    // ---- bounded inverted-index build: per-term posting lists for
    //      mid-frequency terms (3 ≤ df ≤ 50). The df filter runs BEFORE
    //      the posting collection — at corpus scale a stopword's posting
    //      list is the corpus, so unbounded collect_list is the classic
    //      scale-killer; pre-filtering on the (tiny) df table keeps every
    //      collected list ≤ 50 entries. Postings are sorted for a
    //      deterministic array value.
    Q("d_inverted_index",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tfc AS (SELECT DISTINCT doc_id, term FROM
        |          (SELECT doc_id, unnest(toks) AS term FROM tk)),
        |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
        |keep AS (SELECT term, df FROM dfc WHERE df BETWEEN 3 AND 50)
        |SELECT k.term, k.df,
        |       string_agg(t.doc_id, ',' ORDER BY t.doc_id) AS postings
        |FROM tfc t JOIN keep k USING (term)
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val tfc = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .distinct()
      val keep = tfc.groupBy("term").agg(count(lit(1)).as("df"))
        .where(col("df").between(3, 50))
      // postings serialized as a sorted comma-joined string: the driver's
      // compare sorts rows by every output column, which needs scalars
      tfc.join(keep, "term")
        .groupBy("term", "df")
        .agg(expr("concat_ws(',', transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING)))")
          .as("postings"))
    },

    // ---- per-document token-distribution entropy (gibberish / template
    //      detector: repetitive boilerplate scores low, natural text
    //      high — complements the Gopher repetition shares). H·n =
    //      Σ_t c_t · log2(n/c_t); each per-term log2 is quantized to
    //      integer micros BEFORE the sum (the transcendental discipline),
    //      then one integer division by n — order-independent, engine-
    //      exact. Two vocabulary-keyed aggregations, no window.
    Q("d_token_entropy",
      """WITH tk AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |tc AS (SELECT doc_id, term, count(*) AS c FROM
        |         (SELECT doc_id, unnest(toks) AS term FROM tk) GROUP BY 1, 2),
        |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
        |t AS (SELECT tc.doc_id, n.n,
        |        c * CAST(floor(log2(CAST(n.n AS DOUBLE) / c) * 1000000.0 + 0.5) AS BIGINT) AS hterm
        |      FROM tc JOIN n USING (doc_id))
        |SELECT doc_id, CAST(max(n) AS BIGINT) AS n_tokens,
        |       CAST(sum(hterm) // max(n) AS BIGINT) AS entropy_micro
        |FROM t GROUP BY 1""".stripMargin) { (s, d) =>
      val tc = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      val n = tc.groupBy("doc_id").agg(sum("c").as("n"))
      tc.join(n, "doc_id")
        .withColumn("hterm", col("c") *
          floor(log2(col("n").cast("double") / col("c")) * lit(1000000.0) + lit(0.5)).cast("long"))
        .groupBy("doc_id")
        .agg(max("n").as("n_tokens"),
          expr("sum(hterm) div max(n)").as("entropy_micro"))
    },

    // ---- temperature-based source mixing weights (the multinomial
    //      sampling-rate computation for multi-source corpora, α = 0.5:
    //      w_i ∝ n_i^α normalized — upweights small sources). α = 0.5 is
    //      computed via sqrt, which IEEE 754 requires to be correctly
    //      rounded (identical in every engine), unlike pow(x, 0.5). The
    //      per-source sqrt is quantized to integer micros before the
    //      normalizing sum, keeping the total order-independent.
    Q("d_mix_weights",
      """WITH tk AS (SELECT source, len(string_split(text, ' ')) AS n_toks FROM documents),
        |a AS (SELECT source, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |      FROM tk GROUP BY 1),
        |sq AS (SELECT *, CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS s
        |       FROM a),
        |t AS (SELECT sum(s) AS tot FROM sq)
        |SELECT source, n_docs, n_tokens,
        |       CAST(s * 1000000 // tot AS BIGINT) AS weight_ppm
        |FROM sq CROSS JOIN t""".stripMargin) { (s, d) =>
      val a = docs(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("n_toks"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
        .withColumn("s",
          floor(sqrt(col("n_tokens").cast("double")) * lit(1000000.0) + lit(0.5)).cast("long"))
      val t = a.agg(sum("s").as("tot"))
      a.crossJoin(broadcast(t))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          expr("s * 1000000 div tot").as("weight_ppm"))
    },

    // ---- sequence packing: concatenate documents in deterministic order
    //      and chunk the token stream into fixed 2048-token training
    //      sequences (the standard LM batch-prep step — documents straddle
    //      pack boundaries by design). Each doc's start offset is a
    //      per-shard running token sum, so the whole assignment is one
    //      window over 8 hash shards — shards bound window state and map
    //      onto executors; no driver-side packing loop.
    Q("d_pack_sequences",
      s"""WITH tk AS (SELECT doc_id, len(string_split(text, ' ')) AS n_toks,
         |             ${H("'pack:'||CAST(doc_id AS VARCHAR)")} % 8 AS shard
         |           FROM documents),
         |w AS (SELECT *, CAST(sum(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_toks AS BIGINT) AS start_off
         |      FROM tk)
         |SELECT doc_id, shard, CAST(n_toks AS BIGINT) AS n_toks, start_off,
         |       start_off // 2048 AS pack_id, start_off % 2048 AS pack_off
         |FROM w""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      docs(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          (h60(concat(lit("pack:"), col("doc_id").cast("string"))) % 8).as("shard"))
        .withColumn("start_off", sum("n_toks").over(w) - col("n_toks"))
        .select(col("doc_id"), col("shard"), col("n_toks"), col("start_off"),
          expr("start_off div 2048").as("pack_id"),
          (col("start_off") % 2048).as("pack_off"))
    },

    // ---- deterministic shard export: the final pipeline step assigns
    //      every document to one of 64 training shards by content-
    //      independent hash (stable across reruns, no RNG state) and
    //      reports per-shard balance — the check that no shard is skewed
    //      before the (distributed, partitionBy(shard)) write fans out.
    //      One partial+final aggregation; at 100 TB the same hash drives
    //      `write.partitionBy("shard")`.
    // ---- deterministic global shuffle (training order): reproducible
    //      pseudorandom permutation of the corpus, seeded — the property
    //      a training run needs to resume or replay byte-identically.
    //      Order key = md5(seed:doc_id); the global position comes from
    //      the DISTRIBUTED rank (Ranks.globalRank: sampled range
    //      partitioning, no single-task sort — a 100 TB corpus must not
    //      funnel through one executor to be ordered), then position
    //      folds into (shard, pos_in_shard) for the writer. Same seed →
    //      same order on any cluster size; changing the seed is a fresh
    //      epoch-level shuffle.
    Q("d_global_shuffle",
      s"""WITH p AS (SELECT doc_id,
         |             md5('42:' || CAST(doc_id AS VARCHAR)) AS k
         |           FROM documents),
         |r AS (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) - 1 AS pos FROM p)
         |SELECT doc_id, CAST(pos AS BIGINT) AS pos,
         |       CAST(pos // 1000 AS BIGINT) AS shard,
         |       CAST(pos % 1000 AS BIGINT) AS pos_in_shard
         |FROM r""".stripMargin) { (s, d) =>
      val p = docs(s, d).select(col("doc_id"),
        md5(concat(lit("42:"), col("doc_id").cast("string"))).as("k"))
      Ranks.globalRank(p, Seq(col("k"), col("doc_id")), "pos")
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          expr("pos div 1000").cast("long").as("shard"),
          (col("pos") % 1000).cast("long").as("pos_in_shard"))
    },

    Q("d_shard_export",
      s"""WITH s AS (SELECT doc_id, n_chars, len(string_split(text, ' ')) AS n_toks,
         |             ${H("'shard:'||CAST(doc_id AS VARCHAR)")} % 64 AS shard
         |           FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM s GROUP BY 1""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_toks"),
          (h60(concat(lit("shard:"), col("doc_id").cast("string"))) % 64).as("shard"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
          sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
    }
  )
}
