package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for scale checks (VERDICT r6 item 8).
  *
  * Replicates the driver-generated star schema `factor`× into `dst`,
  * preserving each replica's *internal* statistical structure exactly
  * while keeping replicas disjoint, so per-query runtime scaling factors
  * measured on the output isolate engine behavior (shuffle width, bucket
  * fan-out, fixpoint rounds) from data-shape drift:
  *
  *  - dimension tables (`region nation customer supplier part`) are
  *    copied as-is — facts grow, dims don't, the realistic growth mode;
  *  - `orders`/`lineitem` replicate with `o_orderkey`/`l_orderkey`
  *    offset per replica (same customers/parts/suppliers → per-dim fan-in
  *    grows linearly, join selectivity unchanged);
  *  - `events` replicate with fresh `event_id`/`user_id` per replica and
  *    unchanged timestamps: series count ×factor, per-series density
  *    constant — how a metrics workload actually scales;
  *  - `documents` replicate with a per-replica token-suffix bijection on
  *    the text. A bijection on the vocabulary maps shingle sets
  *    bijectively, so every intra-replica Jaccard/MinHash/SimHash
  *    relation (planted dups included) is preserved exactly, while
  *    cross-replica shingle overlap is zero — no accidental quadratic
  *    dup blow-up across replicas;
  *  - `embeddings` replicate with a per-replica circular shift of the
  *    vector dimensions: a permutation preserves every intra-replica
  *    inner product exactly (cluster structure, planted near-dups) and
  *    decorrelates replicas (cross-replica cosine ≈ autocorrelation at
  *    the shift lag ≈ 0 for the synthetic Gaussian clusters).
  *
  * Usage: ScaleUp [srcDir] [dstDir] [factor]  (defaults sf0.1 → target/sf1 ×10)
  */
object ScaleUp {

  /** Key offsets use the next power of ten above the source max so scaled
    * keys stay readable and collision-free. */
  private def offsetFor(df: DataFrame, col0: String): Long = {
    val row = df.agg(max(col(col0))).head
    require(!row.isNullAt(0), s"ScaleUp: source table is empty (no max for key '$col0')")
    val mx = row.getAs[Number](0).longValue // tolerates int-typed keys
    var p = 1L
    while (p <= mx) p *= 10
    p
  }

  private def replicate(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("_r", explode(sequence(lit(0), lit(factor - 1))))

  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build("graft-scaleup")
    run(spark,
      args.lift(0).getOrElse("/root/testdata/sf0.1"),
      args.lift(1).getOrElse("target/sf1"),
      args.lift(2).map(_.toInt).getOrElse(10),
      // optional 4th arg: comma-separated table subset — a ×100 documents
      // decade doesn't need (or survive) a ×100 lineitem/embeddings build
      args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
        .getOrElse(AllTables))
    spark.stop()
  }

  val AllTables: Set[String] = Set("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  def run(spark: SparkSession, src: String, dst: String, factor: Int,
      tables: Set[String] = AllTables): Unit = {
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      wrFact(spark, df, s"$dst/$t.parquet")

    // dims: fixed — written as-is (small single files, like real dims)
    Seq("region", "nation", "customer", "supplier", "part")
      .filter(tables).foreach(t =>
        rd(t).write.mode("overwrite").parquet(s"$dst/$t.parquet"))

    // facts: key-offset replicas
    if (tables("orders") || tables("lineitem")) {
      val orders = rd("orders")
      val ko = offsetFor(orders, "o_orderkey")
      if (tables("orders"))
        wr(replicate(orders, factor)
          .withColumn("o_orderkey", col("o_orderkey") + col("_r") * ko)
          .drop("_r"), "orders")

      if (tables("lineitem")) {
        val li = rd("lineitem")
        wr(replicate(li, factor)
          .withColumn("l_orderkey", col("l_orderkey") + col("_r") * ko)
          .drop("_r"), "lineitem")
      }
    }

    if (tables("events")) {
      val ev = rd("events")
      val ke = offsetFor(ev, "event_id")
      val ku = offsetFor(ev, "user_id")
      wr(replicate(ev, factor)
        .withColumn("event_id", col("event_id") + col("_r") * ke)
        .withColumn("user_id", col("user_id") + col("_r") * ku)
        .drop("_r"), "events")
    }

    if (tables("documents")) scaleDocuments(spark, src, dst, factor)
    if (tables("embeddings")) scaleEmbeddings(spark, src, dst, factor)
    println(s"scaled $src -> $dst x$factor (${tables.toSeq.sorted.mkString(",")})")
  }

  /** Scaled FACT tables must land as a realistic multi-file layout: the
    * replica explode inherits the source's split count, so a compact
    * source (one file) would write the whole scaled corpus as ONE file —
    * and every map-only consumer's parallelism is bound to input splits
    * (the em-family decade stalled on exactly this: one 7.6 MB file,
    * one core). A real corpus at this scale is thousands of files; the
    * default-parallelism repartition restores that shape. */
  private def wrFact(spark: SparkSession, df: DataFrame, path: String): Unit =
    df.repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(path)

  private def scaleDocuments(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = wrFact(spark, df, s"$dst/$t.parquet")
    // documents: vocabulary bijection per replica (replica 0 untouched)
    val docs = rd("documents")
    val kd = offsetFor(docs, "doc_id")
    val sfx = concat(lit("⁙r"), col("_r")) // suffix no source token contains
    val mutated = when(col("_r") === 0, col("text")).otherwise(
      array_join(transform(split(col("text"), " "),
        t => when(t === "", t).otherwise(concat(t, sfx))), " "))
    wr(replicate(docs, factor)
        .withColumn("doc_id", col("doc_id") + col("_r") * kd)
        .withColumn("text", mutated)
        .withColumn("n_chars", length(col("text")))
        .drop("_r"), "documents")
  }

  private def scaleEmbeddings(spark: SparkSession, src: String, dst: String,
      factor: Int): Unit = {
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit = wrFact(spark, df, s"$dst/$t.parquet")
    // embeddings: circular dimension shift per replica
    val emb = rd("embeddings")
    val kv = offsetFor(emb, "vec_id")
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    // each replica needs a DISTINCT decorrelating transform or it becomes
    // an exact copy of another (cross-replica cosine 1 — silently breaking
    // the invariant the scale measurements rely on). Cycle 1 (r < dim):
    // distinct circular shifts. Cycle 2 (dim <= r < 2*dim): the same
    // shifts NEGATED — cos(-a,-b)=cos(a,b) preserves every intra-replica
    // relation exactly, and against the same-shift un-negated replica the
    // cross cosine is the negated autocorrelation (≈0, or -1 at lag 0) —
    // never a positive near-dup. 2*dim distinct transforms total.
    require(factor <= 2 * dim,
      s"ScaleUp: factor $factor exceeds 2x embedding dim $dim; the shift+" +
        "negation decorrelation needs factor <= 2*dim (distinct transforms)")
    val rr = col("_r") % dim
    val shift = (rr * math.max(1, dim / math.min(factor, dim))) % dim
    val rolled = when(rr === 0, col("embedding")).otherwise(
      concat(slice(col("embedding"), shift + 1, lit(dim) - shift),
             slice(col("embedding"), lit(1), shift)))
    val shifted = when(col("_r") >= dim, transform(rolled, x => -x))
      .otherwise(rolled)
    wr(replicate(emb, factor)
        .withColumn("vec_id", col("vec_id") + col("_r") * kv)
        .withColumn("embedding", shifted)
        .drop("_r"), "embeddings")
  }
}
