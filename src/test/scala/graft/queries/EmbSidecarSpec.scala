package graft.queries

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** The at-rest rerank sidecar (VERDICT r19 #1): `ivfPqBuildV` lays the
  * raw vectors out `partitionBy(vbucket = vec_id mod B)` inside the
  * composed index so the exact-rerank stage fetches its ≤ PQ_SHORTLIST
  * vectors per query through a PartitionFilters-pruned read instead of
  * a per-query corpus scan — the r19 `weak-for-scale` finding's fix.
  * This spec pins the plan shape (the pruning must be IN THE PLAN, not
  * assumed), the content parity, and the maintenance sync (append /
  * delete / compact keep the sidecar consistent with the codes tier).
  */
class EmbSidecarSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def fetched(idx: String, ids: Seq[Long]): Map[Long, Seq[Double]] =
    EmbedOps.fetchRerankVecs(spark, idx, ids).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap

  test("the fetch plan prunes: PartitionFilters on the sidecar scan, " +
      "never a full-corpus read (VERDICT r19 #1 'Done' criterion)") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    graft.Sessions.registerFunctions(s)
    val idx = graft.TempDirs.scratch("sidecar_plan").toString
    EmbedOps.ivfPqBuildV(vecs, idx)
    val n = vecs.count()
    val b = EmbedOps.rerankBuckets(s)
    val ids = Seq(3L, 7L, 7L + b) // two buckets, three ids
    val plan = EmbedOps.fetchRerankVecs(s, idx, ids)
      .queryExecution.executedPlan
    val scans = graft.tools.PlanLint.nodes(plan).collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(
            _.toString.contains("emb.parquet")) => f
    }
    assert(scans.nonEmpty, "no sidecar file scan in the fetch plan")
    scans.foreach { f =>
      assert(f.partitionFilters.nonEmpty,
        s"sidecar scan carries NO PartitionFilters — the fetch reads " +
          s"all $n vectors' buckets: ${f.simpleStringWithNodeId()}")
      // the pruning must actually bite: ≤ |ids| of the B bucket dirs
      assert(f.selectedPartitions.partitionCount <= ids.distinct.length,
        s"pruned to ${f.selectedPartitions.partitionCount} buckets for " +
          s"${ids.distinct.length} ids (B=$b) — the bucket filter is " +
          "not reaching partition selection")
    }
    // and the content is the corpus's, byte-identical
    val expect = vecs.where(col("vec_id").isin(ids: _*)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    assert(fetched(idx, ids) == expect, "fetched vectors diverge from corpus")
  }

  test("large-id fetches complete and match the corpus (r20: a pushed " +
      "parquet In evaluates as a recursive or-chain and overflows the " +
      "executor stack past ~600-1100 literals — the sf10 batched-serve " +
      "failure; past graft.rerank.fetchIsinMax the fetch switches to a " +
      "broadcast semi-join)") {
    val s = spark
    val idx = graft.TempDirs.scratch("sidecar_big").toString
    EmbedOps.ivfPqBuildV(vecs, idx)
    // 1500 requested ids — far past the measured overflow threshold; the
    // pre-fix literal form dies here regardless of corpus size (the
    // recursion depth is the literal count, not the row count)
    val ids = (0L until 1500L)
    val corpus = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    val got = fetched(idx, ids)
    val expect = ids.flatMap(i => corpus.get(i).map(i -> _)).toMap
    assert(got == expect, "large-id semi-join fetch diverges from corpus")
    assert(got.nonEmpty)
    // and the small-id literal path is untouched (same content either way)
    val small = ids.take(64)
    assert(fetched(idx, small) ==
      small.flatMap(i => corpus.get(i).map(i -> _)).toMap)
  }

  test("append sync: new vectors land in the sidecar before the codes, " +
      "are fetchable, and a replayed batch does not duplicate fetches") {
    val s = spark
    val idx = graft.TempDirs.scratch("sidecar_app").toString
    val base = vecs.where(col("vec_id") % 10 =!= 0)
    val batch = vecs.where(col("vec_id") % 10 === 0 && col("vec_id") > 0)
    EmbedOps.ivfPqBuildV(base, idx)
    val newId = batch.agg(min("vec_id")).head.getLong(0)
    assert(fetched(idx, Seq(newId)).isEmpty, "fixture: id must be absent")
    assert(EmbedOps.ivfPqAppend(s, batch, idx) > 0)
    val one = fetched(idx, Seq(newId))
    assert(one.contains(newId), "appended vector not fetchable")
    // replay (the IndexStream crash-replay shape): duplicate rows land,
    // fetches stay deduped and content-identical
    EmbedOps.ivfPqAppend(s, batch, idx)
    assert(fetched(idx, Seq(newId)) == one, "replayed append changed fetches")
    assert(EmbedOps.fetchRerankVecs(s, idx, Seq(newId)).count() == 1,
      "replayed append duplicated the fetched row")
  }

  test("takedown sync: ivfPqDelete removes the ids from BOTH tiers and " +
      "leaves no marker; compact preserves fetch content") {
    val s = spark
    val idx = graft.TempDirs.scratch("sidecar_del").toString
    EmbedOps.ivfPqBuildV(vecs, idx)
    val keepId = 11L
    val dropIds = Seq(20L, 21L, 22L)
    import s.implicits._
    val before = fetched(idx, keepId +: dropIds)
    assert(before.keySet == (keepId +: dropIds).toSet)
    val (nDel, _) = EmbedOps.ivfPqDelete(s, idx, dropIds.toDF("vec_id"))
    assert(nDel == dropIds.size, s"expected ${dropIds.size} deleted, got $nDel")
    assert(!fs.exists(new Path(s"$idx/emb.dirty")),
      "completed takedown must clear emb.dirty")
    assert(fetched(idx, keepId +: dropIds) == Map(keepId -> before(keepId)),
      "takedown left raw vectors fetchable (or damaged a survivor)")
    // compact the sidecar's file debris; content must be untouched
    EmbedOps.ivfPqCompact(s, idx, ifMoreThan = 0)
    assert(fetched(idx, Seq(keepId)) == Map(keepId -> before(keepId)),
      "sidecar compaction changed fetch content")
  }
}
