package graft.cluster

import graft.ql._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Admin-statement executor (reference `service/admin.go:30-144`): the
  * clusterql statements mutate the metadata store; node statements answer
  * from Spark's own executor registry (SURVEY §2.8 — the ring itself has no
  * Spark analog, the interface survives).
  */
final class Admin(store: PartitionKeyStore, rf: ReplicationSettings) {

  def execute(spark: SparkSession, stmt: AdminStmt): DataFrame = {
    import spark.implicits._
    stmt match {
      case ShowPartitionKeys(db) =>
        store.list(db).map(k => (k.db, k.measurement.getOrElse(""), k.tags.mkString(",")))
          .toDF("database", "measurement", "tags")
      case CreatePartitionKey(tags, db, msmt) =>
        store.create(db, msmt, tags) // throws DuplicateKeyException → the 409
        Seq.empty[(String, String)].toDF("database", "measurement")
      case DropPartitionKey(db, msmt) =>
        store.drop(db, msmt)
        Seq.empty[(String, String)].toDF("database", "measurement")
      case ShowNodes =>
        // local[n]: the driver is the only "node"; on a cluster this lists
        // executors (sc.getExecutorMemoryStatus keys)
        spark.sparkContext.getExecutorMemoryStatus.keys.toSeq.sorted
          .toDF("name")
      case RemoveNode(_) =>
        // Spark manages executors; statement kept for interface parity
        spark.emptyDataFrame
      case SetReplicationFactor(n, db, msmt) =>
        rf.set(db, msmt, n)
        Seq.empty[(String, String)].toDF("database", "measurement")
    }
  }
}

/** Replication factor is inert metadata here (storage replication is the
  * filesystem's job — SURVEY §2.1 replicated-write row); the reference
  * stores it in etcd (`cluster/settings_storage.go:59-87`). */
final class ReplicationSettings {
  private val m = scala.collection.concurrent.TrieMap.empty[(Option[String], Option[String]), Int]
  def set(db: Option[String], msmt: Option[String], n: Int): Unit = m((db, msmt)) = n
  def get(db: Option[String], msmt: Option[String]): Int =
    m.getOrElse((db, msmt), m.getOrElse((db, None), m.getOrElse((None, None), 2))) // default RF=2 (resolver.go:36)
  /** Durable-catalog snapshot (reference `settings_storage.go:59-87`). */
  def records: Seq[(Option[String], Option[String], Int)] =
    m.toSeq.sortBy(k => (k._1._1.getOrElse(""), k._1._2.getOrElse("")))
      .map { case ((db, ms), n) => (db, ms, n) }
}
