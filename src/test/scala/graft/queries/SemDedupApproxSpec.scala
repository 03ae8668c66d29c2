package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** em_semdedup_approx — the fixed-K, sample-trained SemDeDup variant.
  * The sf0.01 oracle hash proves cross-engine equality at gate scale;
  * this spec pins the properties the hash can't see:
  *   - planted recall 1.0 on the real fixture (every (v, v+10⁶) pair
  *     collapses — the claim alt_sf1.py extends to sf1);
  *   - the FIXED cluster-count contract (every cluster id < SEM_KF=64,
  *     however large the corpus — the published-SemDeDup shape);
  *   - the sample-trained path at a corpus LARGER than the 512-vector
  *     training budget (sstep > 1 — the regime the sf fixtures never
  *     reach) still collapses every planted pair and stays run-to-run
  *     deterministic.
  */
class SemDedupApproxSpec extends SparkSpec {

  private def gate = EmbedOps.all.find(_.name == "em_semdedup_approx").get

  test("planted pairs collapse with recall 1.0 on the sf0.001 fixture") {
    val out = gate.fn(spark, sfDir)
      .select("cluster", "drop_id", "keep_id", "best_sim_micro").collect()
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.length == n, s"expected exactly the $n planted pairs, got ${out.length}")
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + 1000000L, s"non-planted pair: $r")
      assert(r.getLong(3) == 1000000L, s"planted pair not at sim 1.0: $r")
      val c = r.getInt(0)
      assert(c >= 0 && c < 64, s"cluster id $c outside the fixed K=64 contract")
    }
  }

  test("sample-trained regime (N > training budget): exact planted recall, deterministic") {
    import spark.implicits._
    // 2600 vectors → e2 = 5200 > 512: the training sample is a strict
    // subset (sstep = 10), exercising the branch the sf fixtures never do
    val rnd = new scala.util.Random(421)
    val dir = graft.TempDirs.scratch("graft_semapx").toString
    (0 until 2600).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val a = gate.fn(spark, dir).orderBy("drop_id").collect()
    assert(a.length == 2600, s"planted recall broke under sample training: ${a.length}")
    a.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) + 1000000L && r.getLong(3) == 1000000L)
      assert(r.getInt(0) >= 0 && r.getInt(0) < 64)
    }
    val b = gate.fn(spark, dir).orderBy("drop_id").collect()
    assert(a.toSeq == b.toSeq, "two runs diverged — the pipeline must be deterministic")
  }
}
