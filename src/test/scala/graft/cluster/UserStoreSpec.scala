package graft.cluster

import graft.SparkSpec
import graft.Engine

/** Auth flow behaviors from the reference (`service/auth.go:26-53`,
  * `service/query_handler_test.go:51-81`, `service/admin_test.go` harness):
  * first-admin bootstrap, grants enabling access, 403-equivalents. */
class UserStoreSpec extends SparkSpec {

  test("first user must be an admin (bootstrap rule)") {
    val s = new UserStore
    val e = intercept[s.AuthException](s.createUser("peon", "pw", admin = false))
    assert(e.getMessage.contains("first user must be an admin"))
    s.createUser("root", "secret", admin = true)
    s.createUser("peon", "pw", admin = false) // fine once an admin exists
    assertThrows[s.AuthException](s.createUser("root", "again", admin = true)) // dup
  }

  test("authentication and password rotation") {
    val s = new UserStore
    s.createUser("root", "secret", admin = true)
    assert(s.authenticate("root", "secret"))
    assert(!s.authenticate("root", "wrong"))
    assert(!s.authenticate("ghost", "secret"))
    s.setPassword("root", "rotated")
    assert(!s.authenticate("root", "secret"))
    assert(s.authenticate("root", "rotated"))
  }

  test("grants gate per-db access; ALL covers both; revoke removes (403 behaviors)") {
    val s = new UserStore
    s.createUser("root", "pw", admin = true)
    s.createUser("reader", "pw", admin = false)
    assert(!s.authorize("reader", "db1", "READ")) // no grant → 403
    s.grant("READ", "db1", "reader")
    assert(s.authorize("reader", "db1", "READ"))
    assert(!s.authorize("reader", "db1", "WRITE")) // read-only
    assert(!s.authorize("reader", "db2", "READ"))  // other db
    s.grant("ALL", "db1", "reader")
    assert(s.authorize("reader", "db1", "WRITE"))
    s.revoke("ALL", "db1", "reader")
    assert(!s.authorize("reader", "db1", "READ"))
    assert(s.authorize("root", "anything", "WRITE")) // admin passes everything
  }

  test("executeAs enforces the 403 gate per statement type") {
    val e = new Engine(spark, sfDir)
    // no users yet → open (bootstrap)
    assert(e.executeAs("anyone", "SHOW DATABASES").collect().nonEmpty)
    e.execute("CREATE USER root WITH PASSWORD 'pw' WITH ALL PRIVILEGES")
    e.execute("CREATE USER peon WITH PASSWORD 'pw'")
    // read denied without grant → 403 message
    val err = intercept[Exception](e.executeAs("peon", "SELECT mean(value) FROM events"))
    assert(err.getMessage.contains("not authorized"))
    e.execute("GRANT READ ON default TO peon")
    assert(e.executeAs("peon", "SELECT mean(value) FROM events").collect().nonEmpty)
    // read grant does not allow writes or user admin
    assertThrows[Exception](e.executeAs("peon", "DELETE FROM events"))
    assertThrows[Exception](e.executeAs("peon", "CREATE USER evil WITH PASSWORD 'x'"))
    // admin passes everything
    assert(e.executeAs("root", "SHOW USERS").collect().length == 2)
  }

  test("auth statements end-to-end through the Engine") {
    val e = new Engine(spark, sfDir)
    e.execute("CREATE USER root WITH PASSWORD 'secret' WITH ALL PRIVILEGES")
    e.execute("CREATE USER reader WITH PASSWORD 'pw'")
    e.execute("GRANT READ ON default TO reader")
    val shown = e.execute("SHOW USERS").collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(shown == Map("root" -> true, "reader" -> false))
    assert(e.users.authorize("reader", "default", "READ"))
    e.execute("REVOKE READ ON default FROM reader")
    assert(!e.users.authorize("reader", "default", "READ"))
    e.execute("SET PASSWORD FOR reader = 'newpw'")
    assert(e.users.authenticate("reader", "newpw"))
    e.execute("DROP USER reader")
    assert(e.execute("SHOW USERS").collect().length == 1)
  }
}
