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

  test("bcrypt vectors verify (migrated reference catalogs authenticate)") {
    // public test vectors, independently cross-checked against glibc
    // crypt(3)'s blowfish implementation — tables, key schedule, and the
    // base64 variant all have to be right for ANY of these to pass
    val vectors = Seq(
      "" -> "$2a$06$DCq7YPn5Rq63x1Lad4cll.TV4S6ytwfsfvkgY8jIucDrjc8deX1s.",
      "a" -> "$2a$06$m0CrhHm10qJ3lXRY.5zDGO3rS2KdeeWLuGmsfGlMfOxih58VYVfxe",
      "abc" -> "$2a$06$If6bvum7DFjUnE9p2uDeDu0YHzrHM6tf.iqN8.yx.jNN1ILEf7h0i",
      "abcdefghijklmnopqrstuvwxyz" ->
        "$2a$06$.rCVZVOThsIa97pEDOxvGuRRgzG64bvtJ0938xuqzv18d3ZpQhstC",
      "correct horse battery staple" -> // $2b$ and a non-minimum cost
        "$2b$08$aTsUwsyowQuzRrDqFflhge/lrMMdoEhDrgav9iTF8ko3OgxkENFlS")
    for ((pw, h) <- vectors) {
      assert(Bcrypt.check(pw, h), s"should verify: '$pw'")
      assert(!Bcrypt.check(pw + "x", h), s"must reject: '${pw}x'")
    }
    // round trip through our own encoder
    val salt = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
    val made = Bcrypt.hash("s3cret", 6, salt)
    assert(made.startsWith("$2a$06$") && Bcrypt.check("s3cret", made))
    // malformed hashes are a clean false, never a throw
    assert(!Bcrypt.check("pw", "$2x$06$" + "A" * 53))
    assert(!Bcrypt.check("pw", "not-a-hash"))
    assert(!Bcrypt.check("pw", "$2a$99$" + "A" * 53))

    // a restored (migrated) catalog entry with a bcrypt pwHash authenticates,
    // and salted-SHA users created locally keep working side by side
    val s = new UserStore
    s.restoreUser("migrated", vectors(2)._2, admin = true, grants = Map.empty)
    assert(s.authenticate("migrated", "abc"))
    assert(!s.authenticate("migrated", "abd"))
    s.createUser("native", "pw", admin = true)
    assert(s.authenticate("native", "pw"))
    // SET PASSWORD on a migrated user moves it to the local scheme
    s.setPassword("migrated", "fresh")
    assert(s.authenticate("migrated", "fresh") && !s.authenticate("migrated", "abc"))
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
