package graft.cluster

/** User catalog + privilege checks (reference `service/auth.go:26-53`,
  * `cluster/auth_storage`): first-user-must-be-admin bootstrap, per-db
  * READ/WRITE/ALL grants, authorize() = the 403 gate
  * (`service/query_handler_test.go:51-81` behaviors).
  *
  * Passwords created here are salted-SHA-256 metadata, NOT production
  * crypto — no plaintext at rest, per-user salt, no dependency. Catalogs
  * MIGRATED from the reference carry bcrypt `$2a$` hashes; `authenticate`
  * verifies those with the zero-dependency [[Bcrypt]] (the reference's
  * scheme, `service/auth.go:33`), so migrated users log in unchanged.
  */
final class UserStore {

  final case class User(name: String, pwHash: String, admin: Boolean,
      grants: Map[String, String]) // db → READ|WRITE|ALL

  final case class AuthException(msg: String) extends RuntimeException(msg)

  private val users = scala.collection.concurrent.TrieMap.empty[String, User]

  private def hash(name: String, pw: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"graft:$name:$pw".getBytes("UTF-8")).map(b => f"$b%02x").mkString

  def createUser(name: String, password: String, admin: Boolean): Unit = {
    if (users.isEmpty && !admin)
      throw AuthException("the first user must be an admin") // bootstrap rule
    if (users.putIfAbsent(name, User(name, hash(name, password), admin, Map.empty)).isDefined)
      throw AuthException(s"user already exists: $name")
  }

  def dropUser(name: String): Unit =
    if (users.remove(name).isEmpty) throw AuthException(s"user not found: $name")

  def setPassword(name: String, password: String): Unit =
    users.updateWith(name) {
      case Some(u) => Some(u.copy(pwHash = hash(name, password)))
      case None    => throw AuthException(s"user not found: $name")
    }

  def grant(priv: String, db: String, user: String): Unit =
    users.updateWith(user) {
      case Some(u) => Some(u.copy(grants = u.grants.updated(db, priv.toUpperCase)))
      case None    => throw AuthException(s"user not found: $user")
    }

  def revoke(priv: String, db: String, user: String): Unit =
    users.updateWith(user) {
      case Some(u) => Some(u.copy(grants = u.grants.removed(db)))
      case None    => throw AuthException(s"user not found: $user")
    }

  /** bcrypt-compatible verification (reference `service/auth.go:33`): a
    * user catalog migrated from the reference stores `$2a$...` strings —
    * restoreUser accepts them as-is and this dispatches on the stored
    * format, so migrated credentials authenticate without a rehash. Users
    * created HERE keep the dependency-free salted-SHA scheme. */
  def authenticate(name: String, password: String): Boolean =
    users.get(name).exists { u =>
      if (Bcrypt.looksLikeBcrypt(u.pwHash)) Bcrypt.check(password, u.pwHash)
      else u.pwHash == hash(name, password)
    }

  /** The 403 gate: admins pass everything; ALL covers READ and WRITE. */
  def authorize(name: String, db: String, priv: String): Boolean =
    users.get(name).exists { u =>
      u.admin || (u.grants.get(db) match {
        case Some("ALL") => true
        case Some(p)     => p == priv.toUpperCase
        case None        => false
      })
    }

  def list: Seq[(String, Boolean)] =
    users.values.toSeq.sortBy(_.name).map(u => (u.name, u.admin))

  /** SHOW GRANTS FOR user listing (reference routes it to the auth
    * service, `service/routing.go:78-87`). */
  def grantsFor(name: String): Seq[(String, String)] =
    users.get(name) match {
      case Some(u) => u.grants.toSeq.sortBy(_._1)
      case None    => throw AuthException(s"user not found: $name")
    }

  def isEmpty: Boolean = users.isEmpty

  // ---- durable-catalog snapshot/restore (the reference's EtcdAuthStorage,
  // cluster/auth.go:120-158, persists exactly this state)
  def records: Seq[(String, String, Boolean, Map[String, String])] =
    users.values.toSeq.sortBy(_.name).map(u => (u.name, u.pwHash, u.admin, u.grants))
  def restoreUser(name: String, pwHash: String, admin: Boolean,
      grants: Map[String, String]): Unit =
    users(name) = User(name, pwHash, admin, grants)
}
