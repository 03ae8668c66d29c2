package graft.cluster

import graft.ql.{ParseException, SelectStmt}

/** Database / retention-policy / continuous-query catalog — the metadata the
  * reference keeps in etcd and replicates before data
  * (`/root/reference/syncing/models.go:3-14`, `syncing/importer.go:168-184,
  * 305-333`). Semantics preserved: CREATE DATABASE is idempotent (InfluxQL),
  * RP create on a missing database errors, `default` RP is exclusive, CQs
  * are unique per (db, name).
  */
final class DbCatalog {

  final case class Rp(name: String, durationUs: Long, replicas: Int, default: Boolean)
  final case class CqDef(name: String, db: String, query: SelectStmt,
      everyUs: Long = 0L, forUs: Long = 0L) // RESAMPLE EVERY/FOR (0 = unset)
  final case class UnknownDatabaseException(db: String)
    extends RuntimeException(s"database not found: $db")
  final case class DuplicateException(what: String)
    extends RuntimeException(s"$what already exists")

  private val dbs = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private val rps = scala.collection.concurrent.TrieMap.empty[(String, String), Rp]
  private val cqs = scala.collection.concurrent.TrieMap.empty[(String, String), CqDef]

  def createDatabase(name: String): Unit = {
    dbs.putIfAbsent(name, ())
    // autogen RP like InfluxDB: infinite retention, RF 1, default
    rps.putIfAbsent((name, "autogen"), Rp("autogen", 0L, 1, default = true))
  }

  def dropDatabase(name: String): Unit = {
    dbs.remove(name)
    rps.keys.filter(_._1 == name).foreach(rps.remove)
    cqs.keys.filter(_._1 == name).foreach(cqs.remove)
  }

  def databases: Seq[String] = dbs.keys.toSeq.sorted
  def exists(db: String): Boolean = dbs.contains(db)

  def createRp(db: String, rp: Rp): Unit = {
    if (!exists(db)) throw UnknownDatabaseException(db)
    if (rps.putIfAbsent((db, rp.name), rp).isDefined)
      throw DuplicateException(s"retention policy ${rp.name} on $db")
    if (rp.default) // exclusive default: demote others
      rps.filterInPlace { case ((d, n), r) =>
        if (d == db && n != rp.name && r.default) { rps((d, n)) = r.copy(default = false); true }
        else true
      }
  }

  /** ALTER RETENTION POLICY: update only the clauses given; DEFAULT
    * promotes exclusively, like createRp. */
  def alterRp(db: String, name: String, durationUs: Option[Long],
      replicas: Option[Int], default: Boolean): Unit = {
    if (!exists(db)) throw UnknownDatabaseException(db)
    val cur = rps.getOrElse((db, name),
      throw ParseException(s"retention policy not found: $name on $db"))
    val next = cur.copy(
      durationUs = durationUs.getOrElse(cur.durationUs),
      replicas = replicas.getOrElse(cur.replicas),
      default = default || cur.default)
    rps((db, name)) = next
    if (default) rps.filterInPlace { case ((d, n), r) =>
      if (d == db && n != name && r.default) { rps((d, n)) = r.copy(default = false); true }
      else true
    }
  }
  def dropRp(db: String, name: String): Boolean = rps.remove((db, name)).isDefined
  def listRps(db: String): Seq[Rp] =
    rps.collect { case ((d, _), r) if d == db => r }.toSeq.sortBy(_.name)

  def createCq(cq: CqDef): Unit = {
    if (!exists(cq.db)) throw UnknownDatabaseException(cq.db)
    if (cqs.putIfAbsent((cq.db, cq.name), cq).isDefined)
      throw DuplicateException(s"continuous query ${cq.name} on ${cq.db}")
  }

  def dropCq(db: String, name: String): Boolean = cqs.remove((db, name)).isDefined
  def listCqs(db: Option[String] = None): Seq[CqDef] =
    cqs.values.toSeq.filter(c => db.forall(_ == c.db)).sortBy(c => (c.db, c.name))

  // ---- durable-catalog snapshot/restore (Engine persistMeta round-trip;
  // restore bypasses the duplicate/exists validation a replay would trip)
  def rpRecords: Seq[(String, String, Long, Int, Boolean)] =
    rps.toSeq.sortBy(_._1).map { case ((db, _), r) =>
      (db, r.name, r.durationUs, r.replicas, r.default) }
  def restoreDb(name: String): Unit = dbs.putIfAbsent(name, ())
  def restoreRp(db: String, name: String, durationUs: Long, replicas: Int,
      default: Boolean): Unit =
    rps((db, name)) = Rp(name, durationUs, replicas, default)
  def restoreCq(db: String, name: String, query: SelectStmt,
      everyUs: Long = 0L, forUs: Long = 0L): Unit =
    cqs((db, name)) = CqDef(name, db, query, everyUs, forUs)

  /** RP expiry predicate: rows older than `now - duration` are expired
    * (duration 0 = keep forever). The maintenance job is
    * `df.where(!expired)` rewritten over the table — SURVEY §1.3. */
  /** RP duration (0 = infinite); None when the policy doesn't exist.
    * Drives the shard-group-style time-bucket choice for new durable
    * measurements (Engine.shardBucketUs). */
  def rpDurationUs(db: String, rpName: String): Option[Long] =
    rps.get((db, rpName)).map(_.durationUs)

  def retentionCutoffUs(db: String, rpName: String, nowUs: Long): Option[Long] =
    rps.get((db, rpName)).flatMap(rp =>
      if (rp.durationUs == 0) None else Some(nowUs - rp.durationUs))
}
