package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface beyond the reference's single-measurement queries:
  * multi-table joins, semi/anti joins, set ops, rollup, top-k per group.
  * The reference explicitly lacks joins (`README.md:196-200`, SURVEY §2.3) —
  * these are the extension surface a Spark engine gets for free, expressed
  * with 100 TB-scale discipline:
  *
  *   - Dimension tables (region/nation/customer/part/supplier) are orders of
  *     magnitude smaller than the facts (orders/lineitem) → every dim join is
  *     an explicit `broadcast()`, so the fact table never shuffles for a join.
  *   - Fact⋈fact (orders⋈lineitem) shuffles on the join key once; AQE
  *     handles skew (Sessions.build).
  *   - All money arithmetic runs in exact integer cents
  *     (`round(x*100)::BIGINT`) so group sums are order-independent and
  *     bit-identical to the DuckDB oracle regardless of partitioning —
  *     the same discipline EventAggs uses. Products of cents terms
  *     accumulate in DECIMAL(38,0) (DuckDB: HUGEINT) so nothing wraps at
  *     scale.
  *   - Top-k uses per-partition row_number windows or order+limit, which
  *     Spark plans as TakeOrderedAndProject (no full sort at the driver).
  */
object Relational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)
  private def cents(c: Column): Column = Tables.cents(c)

  def all: Seq[Q] = Seq(

    // ---- TPC-H Q1-style pricing summary: single-table agg, partial+final
    //      HashAggregate, the Spark-native form of the reference's
    //      partial-aggregate rewrite (query_merge.go:26-43)
    Q("r_q1_pricing",
      """WITH l AS (
        |  SELECT l_returnflag, l_linestatus,
        |         CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
        |         CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |         CAST(round(l_discount*100) AS BIGINT) AS disc_c,
        |         CAST(round(l_tax*100) AS BIGINT) AS tax_c
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(sum(qty_c) AS DOUBLE) / 100.0 AS sum_qty,
        |  CAST(sum(price_c) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(price_c AS HUGEINT) * (100 - disc_c)) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(price_c AS HUGEINT) * (100 - disc_c) * (100 + tax_c)) AS DOUBLE) / 1000000.0 AS sum_charge,
        |  CAST(sum(qty_c) AS DOUBLE) / (100.0 * count(*)) AS avg_qty,
        |  CAST(sum(price_c) AS DOUBLE) / (100.0 * count(*)) AS avg_price,
        |  CAST(sum(disc_c) AS DOUBLE) / (100.0 * count(*)) AS avg_disc,
        |  count(*) AS count_order
        |FROM l GROUP BY 1, 2""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("1999-09-02 00:00:00").cast("timestamp"))
        .select(col("l_returnflag"), col("l_linestatus"),
          cents(col("l_quantity")).as("qty_c"), cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("disc_c"), cents(col("l_tax")).as("tax_c"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum("qty_c").cast("double") / 100.0).as("sum_qty"),
          (sum("price_c").cast("double") / 100.0).as("sum_base_price"),
          (sum(col("price_c").cast("decimal(38,0)") * (lit(100) - col("disc_c")))
            .cast("double") / 10000.0).as("sum_disc_price"),
          (sum(col("price_c").cast("decimal(38,0)") * (lit(100) - col("disc_c")) * (lit(100) + col("tax_c")))
            .cast("double") / 1000000.0).as("sum_charge"),
          (sum("qty_c").cast("double") / (lit(100.0) * count(lit(1)))).as("avg_qty"),
          (sum("price_c").cast("double") / (lit(100.0) * count(lit(1)))).as("avg_price"),
          (sum("disc_c").cast("double") / (lit(100.0) * count(lit(1)))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    // ---- TPC-H Q3-style: broadcast dim filter + fact⋈fact shuffle join +
    //      exact-cents revenue + deterministic top-10
    Q("r_q3_topk",
      """SELECT l.l_orderkey AS orderkey, epoch_us(o.o_orderdate) AS orderdate_us,
        |       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |                 * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, orderkey ASC LIMIT 10""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders")
        .where(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
      val l = t(s, d, "lineitem")
        .where(col("l_shipdate") > lit("1998-03-15 00:00:00").cast("timestamp"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        // o_orderdate is parquet TIMESTAMP_NTZ; session tz is UTC so the
        // cast is identity and matches DuckDB's epoch_us on the naive value.
        .groupBy(col("l_orderkey").as("orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("orderdate_us"))
        .agg((sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .cast("double") / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("orderkey").asc)
        .limit(10)
    },

    // ---- TPC-H Q5-style: star join through two broadcast dims
    //      (region→nation tiny; customer broadcast-able at any realistic SF
    //      relative to lineitem) — the fact table shuffles once, on l_orderkey.
    Q("r_region_revenue",
      """SELECT n.n_name,
        |       CAST(sum(CAST(round(l.l_extendedprice*100) AS BIGINT)
        |                 * (100 - CAST(round(l.l_discount*100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
        |       count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name IN ('ASIA', 'EUROPE')
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val r = t(s, d, "region").where(col("r_name").isin("ASIA", "EUROPE"))
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("n_name")
        .agg((sum(cents(col("l_extendedprice")) * (lit(100) - cents(col("l_discount"))))
          .cast("double") / 10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // ---- left-semi: orders with at least one high-quantity item.
    //      Stored doubles pass through untouched (no arithmetic → already
    //      bit-identical to what DuckDB reads from the same parquet).
    // ---- TPC-H Q9-flavor: profit by SUPPLIER nation over one part type —
    //      the four-way star (lineitem ⋈ part ⋈ supplier ⋈ nation) that
    //      exercises the two remaining dimension tables. Every dim side is
    //      an explicit broadcast (part is filtered before broadcasting, so
    //      the exchanged build side is the selected subset, not the table);
    //      the fact scans once and never shuffles for a join — the profit
    //      product accumulates in DECIMAL(38,0)/HUGEINT.
    Q("r_q9_profit_lite",
      """WITH l AS (SELECT l_partkey, l_suppkey,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount*100) AS BIGINT) AS disc_c FROM lineitem)
        |SELECT n_name,
        |  CAST(sum(CAST(price_c AS HUGEINT) * (100 - disc_c)) AS DOUBLE) / 10000.0 AS profit
        |FROM l
        |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin) { (s, d) =>
      val l = t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice")).as("price_c"), cents(col("l_discount")).as("disc_c"))
      val p = t(s, d, "part").where(col("p_type") === "ECONOMY").select("p_partkey")
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg((sum(col("price_c").cast("decimal(38,0)") * (lit(100) - col("disc_c")))
          .cast("double") / 10000.0).as("profit"))
    },

    Q("r_semi_join",
      """SELECT o_orderkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem").where(col("l_quantity") >= 49)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_totalprice")
    },

    // ---- left-anti: customers that never ordered
    Q("r_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // ---- set ops over derived key sets (free in Spark, absent in the
    //      reference — SURVEY §2.6 last row)
    Q("r_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
      o.where(col("o_orderstatus") === "O").select("o_custkey")
        .intersect(o.where(col("o_orderstatus") === "F").select("o_custkey"))
    },

    Q("r_except",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders""".stripMargin) { (s, d) =>
      t(s, d, "customer").select("c_custkey")
        .except(t(s, d, "orders").select(col("o_custkey").as("c_custkey")))
    },

    Q("r_union_distinct",
      """SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'""".stripMargin) { (s, d) =>
      t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
        .union(t(s, d, "orders").where(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("k")))
        .distinct()
    },

    // ---- top-k per group via window rank (SURVEY §2.6 Top-k)
    Q("r_topk_per_group",
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy("o_orderpriority")
            .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)))
        .where(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    },

    // ---- rank within group (dense window surface)
    Q("r_window_rank",
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |       rank() OVER (PARTITION BY c_nationkey
        |                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        |FROM customer""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
          rank().over(Window.partitionBy("c_nationkey")
            .orderBy(col("c_acctbal").desc, col("c_custkey").asc)).as("rnk"))
    },

    // ---- rollup (beyond-reference grouping sets; nulls normalized to a
    //      sentinel so both engines sort/compare identically)
    Q("r_rollup",
      """SELECT coalesce(r.r_name, 'ALL') AS region_name,
        |       coalesce(n.n_name, 'ALL') AS nation_name,
        |       count(*) AS n_cust,
        |       CAST(sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_acctbal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r.r_name, n.n_name)""".stripMargin) { (s, d) =>
      // Expressed in Spark SQL: DataFrame rollup() trips the ambiguous-
      // self-join detector on the re-read dimension attributes; the SQL
      // path resolves by qualified name and plans identically (broadcast
      // hints on the tiny dims).
      t(s, d, "customer").createOrReplaceTempView("v_customer")
      t(s, d, "nation").createOrReplaceTempView("v_nation")
      t(s, d, "region").createOrReplaceTempView("v_region")
      s.sql(
        """SELECT /*+ BROADCAST(n), BROADCAST(r) */
          |       coalesce(r.r_name, 'ALL') AS region_name,
          |       coalesce(n.n_name, 'ALL') AS nation_name,
          |       count(*) AS n_cust,
          |       CAST(sum(CAST(round(c.c_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_acctbal
          |FROM v_customer c
          |JOIN v_nation n ON c.c_nationkey = n.n_nationkey
          |JOIN v_region r ON n.n_regionkey = r.r_regionkey
          |GROUP BY ROLLUP(r.r_name, n.n_name)""".stripMargin)
    },

    // ---- cube (all grouping-set combinations; single table so the
    //      DataFrame cube() API applies directly)
    Q("r_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("o_totalprice"))).cast("double") / 100.0).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
    },

    // ---- correlated-style aggregate join: each order vs its items' stats
    Q("r_order_item_stats",
      """WITH li AS (
        |  SELECT l_orderkey, count(*) AS n_items,
        |         CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty,
        |         max(l_quantity) AS max_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT o.o_orderkey, o.o_orderstatus, li.n_items, li.total_qty, li.max_qty
        |FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
        |WHERE li.n_items >= 6""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem").groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_items"),
          (sum(cents(col("l_quantity"))).cast("double") / 100.0).as("total_qty"),
          max("l_quantity").as("max_qty"))
        .where(col("n_items") >= 6)
      t(s, d, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .select("o_orderkey", "o_orderstatus", "n_items", "total_qty", "max_qty")
    }
  )
}
