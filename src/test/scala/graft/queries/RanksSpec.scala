package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ranks.globalRank (r8 rewrite): the distributed path must compute the
  * per-partition offsets and the ranks from ONE evaluation (zipWithIndex
  * over the range-partitioned sort), and both the size-gated direct path
  * and the distributed path must produce the identical 0-based dense
  * ascending rank for unique keys. */
class RanksSpec extends SparkSpec {

  private def fixture = {
    val s = spark
    import s.implicits._
    // shuffled unique keys with a payload, awkward partition counts
    scala.util.Random.shuffle((0 until 997).toList)
      .map(i => (i.toLong * 7 + 3, s"p$i"))
      .toDF("k", "payload")
      .repartition(13)
  }

  test("distributed rank equals the direct single-window rank") {
    val df = fixture
    val direct = Ranks.globalRank(df, Seq(col("k"))) // small → gated direct
    spark.conf.set("graft.globalRank.minBytes", "0") // force distributed
    try {
      val dist = Ranks.globalRank(df, Seq(col("k")))
      val a = direct.orderBy("k").select("k", "payload", "rank").collect()
      val b = dist.orderBy("k").select("k", "payload", "rank").collect()
      assert(a.length == 997 && b.length == 997)
      a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
      // 0-based, dense, ascending in key order
      assert(a.map(_.getLong(2)).toSeq == (0L until 997L))
    } finally spark.conf.unset("graft.globalRank.minBytes")
  }

  test("distributed rank survives re-evaluation of the output unchanged") {
    spark.conf.set("graft.globalRank.minBytes", "0")
    try {
      val dist = Ranks.globalRank(fixture, Seq(col("k")))
      // two separate actions over the same returned frame — the offsets
      // were fixed by zipWithIndex's one materialization, so both must see
      // the same ranks (this is the ADVICE double-evaluation hazard)
      val first = dist.orderBy("k").collect()
      val second = dist.orderBy("k").collect()
      first.zip(second).foreach { case (x, y) => assert(x == y) }
    } finally spark.conf.unset("graft.globalRank.minBytes")
  }

  test("salted top-k per group equals the direct window exactly " +
      "(VERDICT r18 #6), including ranks and tie order") {
    val s = spark
    import s.implicits._
    // multiple groups, deliberately colliding sort keys, unique tiebreak,
    // awkward input partitioning (the salt is the scan partition id)
    val df = scala.util.Random.shuffle((0 until 2000).toList)
      .map(i => (s"g${i % 3}", (i * 37 % 11).toLong, i.toLong))
      .toDF("g", "k", "id")
      .repartition(17)
      .persist() // pin one evaluation: spark_partition_id must not move
    try {
      df.count()
      val order = Seq(col("k").asc, col("id").asc)
      val direct = Ranks.topKPerGroup(df, Seq(col("g")), order, 7)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).toSet
      s.conf.set("graft.rank.saltMinBytes", "0") // force the salted path
      val salted =
        try Ranks.topKPerGroup(df, Seq(col("g")), order, 7)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getInt(3))).toSet
        finally s.conf.unset("graft.rank.saltMinBytes")
      assert(direct.nonEmpty && direct.size == 3 * 7)
      assert(salted == direct,
        s"salted-only: ${salted -- direct}; direct-only: ${direct -- salted}")
    } finally df.unpersist()
  }
}
