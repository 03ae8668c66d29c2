package graft.cluster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-path partitioning (reference `service/partition.go:23-49`,
  * `cluster/partitioner.go:83-137`): points are hashed by the concatenated
  * partition-key tag values with FNV-1a 32-bit and routed by hash.
  *
  * In Spark the consistent-hash ring disappears (shuffle + FS replication
  * replace it — SURVEY §2.9); what survives is (a) the deterministic FNV
  * hash for byte-compatible layout with the reference (`hash/hash.go:8-12`,
  * standard public FNV-1a parameters), (b) key-fulfillment validation, and
  * (c) the physical layout: `partitionBy(tags)` directories or
  * `repartition(hash)` for co-located writes.
  */
object Partitioner {

  /** FNV-1a 32-bit (public-domain parameters: offset 2166136261,
    * prime 16777619), over UTF-8 bytes; returned as unsigned in a Long. */
  def fnv1a32(s: String): Long = {
    var h = 0x811c9dc5L // 2166136261
    for (b <- s.getBytes("UTF-8")) {
      h = h ^ (b & 0xffL)
      h = (h * 0x01000193L) & 0xffffffffL // prime 16777619, keep 32 bits
    }
    h
  }

  /** Hash column over the partition-key tag values, concatenated in key
    * order (cluster/partitioner.go:93-99 concatenation semantics). Uses the
    * native codegen expression (functions.Fnv1a32Expr, registered by
    * Sessions.build) so the per-point hash stays inside whole-stage
    * codegen; falls back to a Scala UDF in sessions without it. */
  def hashColumn(keyTags: Seq[String]): Column = {
    val cat = concat_ws("", keyTags.map(col): _*)
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if s.catalog.functionExists("fnv1a32") =>
        call_udf("fnv1a32", cat)
      case _ => udf((x: String) => fnv1a32(x)).apply(cat)
    }
  }

  final case class UnfulfilledKeyException(missing: Seq[String])
    extends RuntimeException(s"the partition key is not fulfilled: missing tags ${missing.mkString(",")}")

  /** Validate every key tag present & non-empty on every row
    * (cluster/partitioner.go:110-121); returns the offending tag names. */
  def unfulfilled(df: DataFrame, keyTags: Seq[String]): Seq[String] = {
    val missingCols = keyTags.filterNot(df.columns.contains)
    if (missingCols.nonEmpty) return missingCols
    val pred = keyTags.map(t => col(t).isNull || col(t) === "").reduce(_ || _)
    val bad = df.where(pred)
    keyTags.filter(t => bad.where(col(t).isNull || col(t) === "").limit(1).count() > 0)
  }

  /** Repartition a batch by partition-key hash (the Spark-native analog of
    * the reference's per-hash fan-out, `service/write_handler.go:123-146`)
    * and attach the hash for layout/debugging. Errors on unfulfilled keys. */
  def partitionPoints(df: DataFrame, keyTags: Seq[String], numPartitions: Int): DataFrame = {
    val missing = unfulfilled(df, keyTags)
    if (missing.nonEmpty) throw UnfulfilledKeyException(missing)
    df.withColumn("__phash", hashColumn(keyTags))
      .repartition(numPartitions, col("__phash"))
  }

  /** Directory-partitioned write (read-side pruning comes free from
    * Catalyst's PruneFileSourcePartitions on these columns). */
  def writePartitioned(df: DataFrame, keyTags: Seq[String], path: String): Unit = {
    val missing = unfulfilled(df, keyTags)
    if (missing.nonEmpty) throw UnfulfilledKeyException(missing)
    df.write.mode("overwrite").partitionBy(keyTags: _*).parquet(path)
  }
}

/** Partition-key metadata store (reference etcd-backed
  * `cluster/partitioner.go:208-221` + admin handlers
  * `service/admin.go:87-122`): CRUD with the reference's observable
  * semantics — 409 on duplicate create, DB-level key as fallback when no
  * measurement-level key exists (`cluster/partitioner.go:131-137`).
  */
final class PartitionKeyStore {
  final case class PartitionKey(db: String, measurement: Option[String], tags: List[String])
  final case class DuplicateKeyException(db: String, msmt: Option[String])
    extends RuntimeException(s"partition key already exists on $db${msmt.map("." + _).getOrElse("")}")

  private val keys = scala.collection.concurrent.TrieMap.empty[(String, Option[String]), PartitionKey]

  def create(db: String, msmt: Option[String], tags: List[String]): Unit = {
    val k = (db, msmt)
    if (keys.putIfAbsent(k, PartitionKey(db, msmt, tags)).isDefined)
      throw DuplicateKeyException(db, msmt)
  }

  def drop(db: String, msmt: Option[String]): Boolean = keys.remove((db, msmt)).isDefined

  def list(db: Option[String]): Seq[PartitionKey] =
    keys.values.toSeq.filter(k => db.forall(_ == k.db))
      .sortBy(k => (k.db, k.measurement.getOrElse("")))

  /** Measurement-level key, falling back to the DB-level key. */
  def resolve(db: String, msmt: String): Option[PartitionKey] =
    keys.get((db, Some(msmt))).orElse(keys.get((db, None)))

  /** Durable-catalog restore (reference etcd `partition_key_storage.go`). */
  def restore(db: String, msmt: Option[String], tags: List[String]): Unit =
    keys((db, msmt)) = PartitionKey(db, msmt, tags)
}
