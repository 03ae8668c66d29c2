package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both fact tables on the join
  * key eliminates the per-query shuffle entirely — the Spark-native form of
  * the reference's "data for one series lives on one node" co-location
  * (SURVEY §2.9 partition layout). Plan-asserted: the bucketed join has NO
  * Exchange; the unbucketed baseline does. */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without a shuffle Exchange") {
    val s = spark
    val orders = Tables(s, sfDir, "orders")
    val lineitem = Tables(s, sfDir, "lineitem")

    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force non-broadcast
    try {
      orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val bucketed = s.table("b_lineitem")
        .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val bPlan = bucketed.queryExecution.executedPlan.toString

      val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val pPlan = plain.queryExecution.executedPlan.toString

      // the join itself: bucketed reads are shuffle-free, so the ONLY
      // Exchange left is the final small groupBy; the unbucketed baseline
      // shuffles both join inputs as well (1 vs 3)
      assert(countExchanges(bPlan) == 1,
        s"bucketed plan should only shuffle for the final agg:\n$bPlan")
      assert(countExchanges(pPlan) == 3,
        s"baseline should shuffle both join sides + final agg:\n$pPlan")

      // identical results
      val b = bucketed.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val p = plain.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(b == p)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      s.sql("DROP TABLE IF EXISTS b_orders")
      s.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  private def countExchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length
}
