package graft.cluster

import graft.SparkSpec
import graft.ql._

/** Partitioner + admin semantics (reference `cluster/partitioner_test.go`,
  * `service/admin_test.go:29-91` — incl. the 409-on-duplicate behavior). */
class ClusterSpec extends SparkSpec {

  test("FNV-1a 32-bit matches the public test vectors (hash/hash.go:8-12)") {
    assert(Partitioner.fnv1a32("") == 0x811c9dc5L)        // offset basis
    assert(Partitioner.fnv1a32("a") == 0xe40c292cL)
    assert(Partitioner.fnv1a32("foobar") == 0xbf9cf968L)
  }

  test("hash is over concatenated key tag values (partitioner.go:93-99)") {
    assert(Partitioner.fnv1a32("goldus") == Partitioner.fnv1a32("gold" + "us"))
  }

  test("unfulfilled partition key is rejected (partitioner.go:110-121)") {
    val s = spark
    import s.implicits._
    val df = Seq(("gold", 1.0), (null.asInstanceOf[String], 2.0)).toDF("type", "value")
    assert(Partitioner.unfulfilled(df, Seq("type")) == Seq("type"))
    assert(Partitioner.unfulfilled(df, Seq("nope")) == Seq("nope"))
    assertThrows[Partitioner.UnfulfilledKeyException](
      Partitioner.partitionPoints(df, Seq("type"), 4))
  }

  test("fulfilled key partitions by hash deterministically") {
    val s = spark
    import s.implicits._
    val df = Seq(("gold", 1.0), ("silver", 2.0), ("gold", 3.0)).toDF("type", "value")
    val parts = Partitioner.partitionPoints(df, Seq("type"), 4)
    val hashes = parts.select("__phash").distinct().collect().map(_.getLong(0)).toSet
    assert(hashes == Set(Partitioner.fnv1a32("gold"), Partitioner.fnv1a32("silver")))
  }

  test("partition key store: create, duplicate 409, drop, db fallback") {
    val store = new PartitionKeyStore
    store.create("mydb", Some("treasures"), List("type"))
    val e = intercept[store.DuplicateKeyException](
      store.create("mydb", Some("treasures"), List("other")))
    assert(e.getMessage.contains("mydb.treasures"))
    // db-level fallback (partitioner.go:131-137)
    store.create("mydb", None, List("db_tag"))
    assert(store.resolve("mydb", "treasures").get.tags == List("type"))
    assert(store.resolve("mydb", "unkeyed").get.tags == List("db_tag"))
    assert(store.drop("mydb", Some("treasures")))
    assert(store.resolve("mydb", "treasures").get.tags == List("db_tag"))
    assert(!store.drop("mydb", Some("treasures"))) // already gone
  }

  test("admin statements end-to-end through the parser (admin_test.go:29-91)") {
    val store = new PartitionKeyStore
    val admin = new Admin(store, new ReplicationSettings)
    def run(q: String) = admin.execute(spark, Parser.parse(q).asInstanceOf[AdminStmt])

    run("CREATE PARTITION KEY type ON mydb.treasures")
    val shown = run("SHOW PARTITION KEYS ON mydb").collect()
    assert(shown.length == 1 && shown.head.getString(2) == "type")
    assertThrows[store.DuplicateKeyException](run("CREATE PARTITION KEY type ON mydb.treasures"))
    run("DROP PARTITION KEY ON mydb.treasures")
    assert(run("SHOW PARTITION KEYS").collect().isEmpty)
    assert(run("SHOW NODES").collect().nonEmpty) // the driver "node"
  }

  test("replication factor metadata: default 2, most-specific wins (resolver.go:36)") {
    val rf = new ReplicationSettings
    assert(rf.get(Some("db"), Some("m")) == 2)
    rf.set(None, None, 3)
    rf.set(Some("db"), None, 1)
    assert(rf.get(Some("db"), Some("m")) == 1)
    assert(rf.get(Some("other"), None) == 3)
  }
}
