package graft.ql

/** AST for the InfluxQL subset the reference engine serves
  * (`/root/reference/service/coordinator.go`, `service/merge/query_merge.go`
  * — SELECT with aggregate calls, time buckets, tag grouping, fill, sort,
  * limits; SHOW metadata statements). A slim mirror of the vendored
  * influxql AST, re-derived from the constructs the reference actually
  * routes/merges.
  */
sealed trait Expr
final case class Ident(name: String) extends Expr
final case class NumLit(v: Double) extends Expr
final case class IntLit(v: Long) extends Expr
final case class StrLit(v: String) extends Expr
final case class BoolLit(v: Boolean) extends Expr
final case class RegexLit(pattern: String) extends Expr // /re/ after =~ or !~
/** Duration in microseconds (InfluxQL `5m`, `1h`, …). */
final case class DurLit(us: Long) extends Expr
case object NowLit extends Expr
case object Wildcard extends Expr
/** `name::field` / `name::tag` disambiguation, or `name::integer|float|
  * string|boolean` cast (influxql type selectors on the SELECT list and
  * in WHERE). */
final case class TypedIdent(name: String, hint: String) extends Expr
/** `*::field` / `*::tag` — wildcard restricted to one key kind. */
final case class TypedWildcard(hint: String) extends Expr
final case class Call(name: String, args: List[Expr]) extends Expr
/** op ∈ + - * / % = != <> < <= > >= AND OR */
final case class Bin(op: String, l: Expr, r: Expr) extends Expr
final case class Paren(e: Expr) extends Expr

sealed trait Fill
case object FillNone extends Fill     // drop empty buckets (default for us)
case object FillNull extends Fill     // keep empty buckets as null
final case class FillValue(v: Double) extends Fill
case object FillPrevious extends Fill
case object FillLinear extends Fill

sealed trait Statement
final case class Field(expr: Expr, alias: Option[String])

/** FROM source: a measurement, or a nested SELECT — subqueries are the
  * reference's declared future work ("currently do not work at all",
  * README.md:188-191); first-class here. */
sealed trait Source
final case class FromMeasurement(name: String) extends Source
/** FROM /re/ — regex over measurement names (reference TODO at
  * `service/merge/query_merge.go:128`; SURVEY §2.2 parser sugar). */
final case class FromMeasurementRegex(pattern: String) extends Source
/** FROM m1, m2, … — multi-measurement scan (InfluxQL; the reference's
  * merge layer assumes the first measurement only, query_merge.go:44-47). */
final case class FromMulti(names: List[String]) extends Source
final case class FromSubquery(sel: SelectStmt) extends Source

final case class SelectStmt(
    fields: List[Field],
    from: Source,
    where: Option[Expr],
    groupByTime: Option[Long], // bucket width in µs
    groupByTags: List[String],
    groupByAllTags: Boolean,   // GROUP BY *
    fill: Fill,
    orderDesc: Boolean,
    limit: Option[Int], offset: Option[Int],
    slimit: Option[Int], soffset: Option[Int],
    into: Option[String] = None,          // SELECT … INTO target (CQs)
    groupByTimeOffset: Long = 0L,         // time(iv, offset)
    tz: Option[String] = None,            // trailing tz('Zone')
    intoDbRp: Option[(String, String)] = None) extends Statement // INTO "db"."rp"."m"

/** `withKey` carries SHOW TAG VALUES' `WITH KEY = k` filter; `from`
  * restricts the meta scan to one measurement (`SHOW TAG KEYS FROM m`). */
final case class ShowStmt(what: String, on: Option[String],
    withKey: Option[String] = None, from: Option[String] = None,
    where: Option[Expr] = None) extends Statement
/** SHOW … LIMIT n [OFFSET m] — meta-query pagination (influxql; the
  * reference pages SHOW SERIES exactly this way during import planning,
  * syncing/series.go:69-70). Rows sort lexicographically before paging so
  * pages are deterministic. */
final case class ShowLimited(show: ShowStmt, limit: Option[Int],
    offset: Option[Int]) extends Statement
/** SHOW GRANTS FOR user / SHOW QUERIES / KILL QUERY — routed by the
  * reference's proxy (`service/routing.go:110-133`). */
final case class ShowGrantsStmt(user: String) extends Statement
case object ShowQueriesStmt extends Statement
final case class KillQuery(qid: Long) extends Statement

/** Cluster-admin DSL (reference "clusterql",
  * `/root/reference/service/clusterql/language.go:7-63`). */
sealed trait AdminStmt extends Statement
final case class ShowPartitionKeys(db: Option[String]) extends AdminStmt
final case class CreatePartitionKey(tags: List[String], db: String, msmt: Option[String]) extends AdminStmt
final case class DropPartitionKey(db: String, msmt: Option[String]) extends AdminStmt
case object ShowNodes extends AdminStmt
final case class RemoveNode(name: String) extends AdminStmt
final case class SetReplicationFactor(n: Int, db: Option[String], msmt: Option[String]) extends AdminStmt

/** Catalog DDL the reference broadcasts via RouteToAll
  * (`/root/reference/service/routing.go:13-41`) and replicates on import
  * (`syncing/importer.go:305-333`). */
sealed trait DdlStmt extends Statement
/** `withRp` = the optional WITH clause's initial retention policy:
  * (rp name, duration µs — 0 = infinite, replication). */
final case class CreateDatabase(name: String,
    withRp: Option[(String, Long, Int)] = None) extends DdlStmt
final case class DropDatabase(name: String) extends DdlStmt
final case class CreateRetentionPolicy(name: String, db: String, durationUs: Long,
    replication: Int, default: Boolean) extends DdlStmt
final case class DropRetentionPolicy(name: String, db: String) extends DdlStmt
/** ALTER RETENTION POLICY — each clause optional (influxql). */
final case class AlterRetentionPolicy(name: String, db: String,
    durationUs: Option[Long], replication: Option[Int],
    default: Boolean) extends DdlStmt
/** everyUs/forUs = the optional RESAMPLE clause (0 = unset): EVERY
  * throttles recompute cadence, FOR widens the recomputed window. */
final case class CreateContinuousQuery(name: String, db: String, query: SelectStmt,
    everyUs: Long = 0L, forUs: Long = 0L) extends DdlStmt
final case class DropContinuousQuery(name: String, db: String) extends DdlStmt
/** DELETE FROM m [WHERE …] / DROP SERIES FROM m WHERE tag='v' / DROP
  * MEASUREMENT m (reference RouteToAll statements, routing.go:13-41). */
final case class DeleteSeries(from: String, where: Option[Expr]) extends DdlStmt
final case class DropMeasurement(name: String) extends DdlStmt
/** Subscriptions — push feeds to external consumers; the reference
  * replicates these statements to every node (routing.go:101-126). The
  * Spark analog of a firing subscription is a `writeStream` sink on the
  * subscribed measurement; the catalog semantics live here. */
final case class CreateSubscription(name: String, db: String, rp: String,
    mode: String, destinations: List[String]) extends DdlStmt
final case class DropSubscription(name: String, db: String, rp: String) extends DdlStmt

/** User/privilege statements (reference RouteAuthService,
  * `service/routing.go:78-87`; behaviors from `service/auth.go:26-53` and
  * `service/query_handler_test.go:51-81`). */
sealed trait AuthStmt extends Statement
final case class CreateUser(name: String, password: String, admin: Boolean) extends AuthStmt
final case class DropUser(name: String) extends AuthStmt
final case class SetPassword(name: String, password: String) extends AuthStmt
final case class Grant(privilege: String, db: String, user: String) extends AuthStmt
final case class Revoke(privilege: String, db: String, user: String) extends AuthStmt

final case class ParseException(msg: String) extends RuntimeException(msg)
