package graft.queries

import graft.SparkSpec

/** IVFPQ — the composed index (coarse probing over compressed codes):
  * the persisted search must be byte-identical to the in-memory path,
  * the compressed-codes scan must carry PartitionFilters on the coarse
  * list (the 100 TB claim: a probe reads ≈ NPROBE/k of the CODES, never
  * raw vectors, until the shortlist rerank), and recall must be measured
  * against the exact brute-force baseline — composition can only lose
  * candidates vs plain PQ (the IVF filter), so the floor is checked
  * where it matters. */
class IvfPqSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("persisted IVFPQ: identical neighbors, and the CODES scan is partition-pruned") {
    val idx = graft.TempDirs.scratch("ivfpq_idx_spec").toString
    EmbedOps.ivfPqBuild(spark, sfDir, idx)
    val fromIndex = EmbedOps.ivfPqIndexed(spark, sfDir, idx)
    val live = EmbedOps.ivfPqAdc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(fromIndex.select("qid", "vec_id", "d2_micro").collect().toSet == live)
    assert(live.nonEmpty)
    // the scale claim: the probe prunes the COMPRESSED scan — the codes
    // read touches only the probed list directories
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(plan).isDefined,
      s"codes scan not partition-pruned:\n$plan")
  }

  test("persisted RESIDUAL index: identical neighbors, partition-pruned codes scan") {
    val idx = graft.TempDirs.scratch("ivfpqr_idx_spec").toString
    EmbedOps.ivfPqResidualBuild(spark, sfDir, idx)
    val fromIndex = EmbedOps.ivfPqResidualIndexed(spark, sfDir, idx)
    val live = EmbedOps.ivfPqResidualAdc(spark, sfDir)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(fromIndex.select("qid", "vec_id", "d2_micro").collect().toSet == live)
    assert(live.nonEmpty)
    val plan = fromIndex.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list_id".r.findFirstIn(plan).isDefined,
      s"residual codes scan not partition-pruned:\n$plan")
  }

  test("every query returns exactly TOPK ranked candidates") {
    val counts = EmbedOps.ivfPqAdc(spark, sfDir)
      .groupBy("qid").count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ == 5L))
  }

  test("append lands ONE delta file, leaves the partitioned codes byte-untouched, " +
      "and unfolded codes are searchable; the fold is search-invariant") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val s = spark
    def fs(d: String) = new Path(d).getFileSystem(s.sparkContext.hadoopConfiguration)
    def files(d: String): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(d)
      if (!java.nio.file.Files.exists(root)) Map.empty
      else java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p) &&
          p.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.size(p)).toMap
    }
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val idx = graft.TempDirs.scratch("ivfpq_app_spec").toString
    EmbedOps.ivfPqBuild(spark, sfDir, idx)
    val before = files(s"$idx/codes.parquet")
    // new ids (shifted) so the appended rows are distinguishable
    val n = EmbedOps.ivfPqAppend(s, v.limit(50)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("emb")), idx)
    assert(n == 50L)
    assert(files(s"$idx/codes.parquet") == before, "append touched the partitioned codes")
    assert(files(s"$idx/codes.delta.parquet").size == 1, "delta not a single file")
    // unfolded codes are live: the appended ids are reachable candidates
    val withDelta = EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(withDelta.nonEmpty)
    // the fold moves codes without changing a single search result
    EmbedOps.codesFoldDelta(s, idx)
    assert(!fs(idx).exists(new Path(s"$idx/codes.delta.parquet")), "delta not consumed")
    val folded = files(s"$idx/codes.parquet")
    before.foreach { case (p, sz) =>
      assert(folded.get(p).contains(sz), s"fold rewrote existing codes file: $p")
    }
    assert(folded.size > before.size)
    assert(EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet == withDelta,
      "fold changed search results")
  }

  test("takedown purges unfolded delta codes; compaction collapses fold debris — " +
      "both search-invariant modulo the deleted vectors") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    def fs(d: String) = new Path(d).getFileSystem(s.sparkContext.hadoopConfiguration)
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val idx = graft.TempDirs.scratch("ivfpq_del_spec").toString
    EmbedOps.ivfPqBuild(spark, sfDir, idx)
    // delta-resident victims: append a batch, then take down part of it
    EmbedOps.ivfPqAppend(s, v.limit(40)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("emb")), idx)
    assert(fs(idx).exists(new Path(s"$idx/codes.delta.parquet")))
    val victims = v.limit(40).select((col("vec_id") + 1000000L).as("vec_id"))
      .as[Long].collect().toSeq.sorted.take(7)
    val (nDel, affected) = EmbedOps.ivfPqDelete(s, idx, victims.toDF("vec_id"))
    assert(nDel == victims.size && affected.nonEmpty,
      s"delta-resident codes not deleted: $nDel of ${victims.size}")
    // the delete folded first — no delta code can outlive a takedown
    assert(!fs(idx).exists(new Path(s"$idx/codes.delta.parquet")))
    val live = s.read.parquet(s"$idx/codes.parquet")
    assert(live.where(col("vec_id").isin(victims: _*)).count() == 0L)
    // every surviving vector still carries exactly M code rows
    val perVec = live.groupBy("vec_id").count().select("count").distinct()
      .as[Long].collect().toSeq
    assert(perVec == Seq(8L), s"uneven code rows after delete: $perVec")

    // per-batch folds (deltaMaxFiles=1) pile real per-list file debris;
    // compaction collapses hot lists without changing search results
    val expected = EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    s.conf.set("graft.ivf.deltaMaxFiles", "1")
    try {
      (0 until 3).foreach { i =>
        EmbedOps.ivfPqAppend(s, v.limit(30)
          .select((col("vec_id") + (i + 2) * 1000000L).as("vec_id"), col("emb")), idx)
      }
    } finally s.conf.unset("graft.ivf.deltaMaxFiles")
    val before = EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val done = EmbedOps.ivfPqCompact(s, idx, ifMoreThan = 2)
    assert(done.nonEmpty, "fixture did not trigger codes compaction")
    assert(done.forall { case (_, nBefore, nAfter) => nAfter < nBefore })
    assert(EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet == before,
      "codes compaction changed search results")
    assert(expected.nonEmpty && before.nonEmpty)
  }

  test("a crash at either CODES-fold window heals into codes.parquet — " +
      "never into the assignment tier's namespace") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val s = spark
    def fs(d: String) = new Path(d).getFileSystem(s.sparkContext.hadoopConfiguration)
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val idx = graft.TempDirs.scratch("ivfpq_fold_crash").toString
    EmbedOps.ivfPqBuild(spark, sfDir, idx)
    EmbedOps.ivfPqAppend(s, v.limit(30)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("emb")), idx)
    val expected = EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    val f = fs(idx)

    // window A — crash DURING the tmp write: codes.fold.tmp partial,
    // delta live. Searches are HEAL-FREE (ADVICE r14) — the read of
    // live ∪ delta is already correct with the stale tmp parked — and
    // the next MAINTENANCE entry rolls the fold BACK (discards tmp).
    s.read.parquet(s"$idx/codes.delta.parquet").limit(3)
      .write.partitionBy("list_id").parquet(s"$idx/codes.fold.tmp")
    assert(EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet == expected)
    assert(f.exists(new Path(s"$idx/codes.fold.tmp")),
      "a read-only search must not heal (destructive reconcile races a live fold)")
    EmbedOps.reconcileSwaps(s, idx)
    assert(!f.exists(new Path(s"$idx/codes.fold.tmp")))
    assert(f.exists(new Path(s"$idx/codes.delta.parquet")))

    // window B — crash AFTER the commit rename: tmp complete. The next
    // maintenance entry rolls FORWARD into codes.parquet; the assignment
    // namespace (absent for a composed index) must stay untouched.
    s.read.parquet(s"$idx/codes.delta.parquet").repartition(col("list_id"))
      .write.mode("overwrite").partitionBy("list_id").parquet(s"$idx/codes.fold.tmp")
    assert(f.rename(new Path(s"$idx/codes.delta.parquet"),
      new Path(s"$idx/codes.fold.consumed")))
    EmbedOps.reconcileSwaps(s, idx)
    assert(EmbedOps.ivfPqIndexed(spark, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet == expected)
    assert(!f.exists(new Path(s"$idx/codes.fold.tmp")))
    assert(!f.exists(new Path(s"$idx/codes.fold.consumed")))
    assert(!f.exists(new Path(s"$idx/codes.delta.parquet")))
    assert(!f.exists(new Path(s"$idx/assign.parquet")),
      "codes fold leaked into the assignment tier's namespace")
    // every appended vector folded exactly once
    val dupes = spark.read.parquet(s"$idx/codes.parquet")
      .groupBy("vec_id", "m").count().where(col("count") > 1).count()
    assert(dupes == 0L)
  }

  test("residual lifecycle parity: append lands in the codes delta and is " +
      "searchable unfolded; the fold is search-invariant; takedown purges " +
      "residual delta codes") {
    import org.apache.hadoop.fs.Path
    import org.apache.spark.sql.functions._
    val s = spark
    import s.implicits._
    def fs(d: String) = new Path(d).getFileSystem(s.sparkContext.hadoopConfiguration)
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val idx = graft.TempDirs.scratch("ivfpqr_life").toString
    EmbedOps.ivfPqResidualBuildV(v.where(col("vec_id") % 10 =!= 0), idx)
    val fresh = v.where(col("vec_id") % 10 === 0)
    val n = EmbedOps.ivfPqResidualAppend(s, fresh, idx)
    assert(n == fresh.count())
    assert(fs(idx).exists(new Path(s"$idx/codes.delta.parquet")),
      "residual append skipped the delta tier")
    // unfolded residual codes are live: the search result with the delta
    // present must equal the post-fold result (which reads only the
    // partitioned tier) — proving the delta read path is real
    val withDelta = EmbedOps.ivfPqResidualIndexed(s, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet
    assert(withDelta.nonEmpty)
    EmbedOps.codesFoldDelta(s, idx)
    assert(!fs(idx).exists(new Path(s"$idx/codes.delta.parquet")))
    assert(EmbedOps.ivfPqResidualIndexed(s, sfDir, idx)
      .select("qid", "vec_id", "d2_micro").collect().toSet == withDelta,
      "residual fold changed search results")
    // every vector carries exactly M residual code rows across both tiers
    val live = s.read.parquet(s"$idx/codes.parquet")
    assert(live.groupBy("vec_id").count().select("count").distinct()
      .as[Long].collect().toSeq == Seq(8L))

    // delta-resident takedown: append a shifted batch, delete part of it
    EmbedOps.ivfPqResidualAppend(s, v.limit(40)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("emb")), idx)
    assert(fs(idx).exists(new Path(s"$idx/codes.delta.parquet")))
    val victims = v.limit(40).select((col("vec_id") + 1000000L).as("vec_id"))
      .as[Long].collect().toSeq.sorted.take(7)
    val (nDel, affected) = EmbedOps.ivfPqDelete(s, idx, victims.toDF("vec_id"))
    assert(nDel == victims.size && affected.nonEmpty,
      s"residual delta codes not deleted: $nDel of ${victims.size}")
    assert(!fs(idx).exists(new Path(s"$idx/codes.delta.parquet")),
      "takedown left an unfolded residual delta behind")
    assert(s.read.parquet(s"$idx/codes.parquet")
      .where(col("vec_id").isin(victims: _*)).count() == 0L)
  }

  test("the _encoding marker stops cross-tier misuse: raw ops refuse a " +
      "residual index and vice versa") {
    import org.apache.spark.sql.functions._
    val s = spark
    val v = s.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val raw = graft.TempDirs.scratch("ivfpq_enc_raw").toString
    val res = graft.TempDirs.scratch("ivfpq_enc_res").toString
    EmbedOps.ivfPqBuild(s, sfDir, raw)
    EmbedOps.ivfPqResidualBuild(s, sfDir, res)
    val batch = v.limit(5)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("emb"))
    intercept[IllegalArgumentException](EmbedOps.ivfPqAppend(s, batch, res))
    intercept[IllegalArgumentException](EmbedOps.ivfPqResidualAppend(s, batch, raw))
    intercept[IllegalArgumentException](EmbedOps.ivfPqIndexed(s, sfDir, res))
    intercept[IllegalArgumentException](EmbedOps.ivfPqResidualIndexed(s, sfDir, raw))
    // the marker gates entry BEFORE any state changes: both indexes
    // still search correctly on their own tier
    assert(EmbedOps.ivfPqIndexed(s, sfDir, raw).count() > 0)
    assert(EmbedOps.ivfPqResidualIndexed(s, sfDir, res).count() > 0)
  }

  test("recall@5 vs brute force: the composition holds a measured floor, " +
      "and residual encoding does not lose candidates the rerank could save") {
    val brute = topk(EmbedOps.all.find(_.name == "em_knn_brute").get.fn(spark, sfDir))
    val composed = topk(EmbedOps.ivfPqAdc(spark, sfDir))
    val recall = (composed & brute).size.toDouble / brute.size
    // measured on this corpus (sf0.001 N=400, sf0.01 N=1000): the IVF
    // filter at nprobe=2/k=sqrt(N) is the binding constraint (same floor
    // class as IvfRecallSpec's k=sqrt(N) row); PQ's shortlist (150 >> 5)
    // loses nothing further after the wide exact rerank
    assert(recall >= 0.2, s"composed recall collapsed: $recall")
    // residual encoding shares the IVF filter, so its recall differs only
    // through ADC shortlist ordering — with SHORTLIST=150 >> TOPK on a
    // ≤~N/k-sized probe set both variants rerank essentially the full
    // candidate pool: identical floors, and near-identical sets here
    val residual = topk(EmbedOps.ivfPqResidualAdc(spark, sfDir))
    val rRecall = (residual & brute).size.toDouble / brute.size
    assert(rRecall >= 0.2, s"residual recall collapsed: $rRecall")
    assert(rRecall >= recall - 0.05,
      s"residual encoding lost recall vs raw: $rRecall < $recall")
  }
}
