package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage over the TPC-H-ish driver tables:
  * multi-way joins (broadcast dim + shuffled fact-fact), semi/anti joins,
  * grouped/distinct/rollup aggregation, SQL window functions, JSON
  * extraction. The reference's own join inventory (SURVEY.md §2.3) is
  * all broadcast-equi; these queries additionally exercise the join
  * shapes a 100 TB warehouse actually needs (SMJ fact-fact, AQE).
  *
  * Float-parity discipline: any SUM over a double column goes through an
  * exact DECIMAL intermediate and is cast to double at the end — decimal
  * addition is associative, so Spark's partial/final agg over any
  * partitioning produces bit-identical results to DuckDB's serial sum.
  * Raw doubles are never summed (`sum(double)` is order-dependent).
  */
object RelationalOps {
  type Q = (SparkSession, String) => DataFrame

  private val D = DecimalType(18, 4)

  // exact revenue term: price * (1 - discount) in decimal
  private def revenueDec = col("l_extendedprice").cast(D) *
    (lit(1).cast(D) - col("l_discount").cast(D))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  val queries: Map[String, Q] = Map(
    // TPC-H Q1-shaped pricing summary (agg A-coverage: SUM/COUNT +
    // derived avg as exact-decimal / count)
    "q1_pricing" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(D)).cast("double").as("sum_base_price"),
          sum(revenueDec).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast(D)).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3-shaped: fact-fact SMJ (orders⋈lineitem) + broadcast dim
    // (customer filter), group, top-k by revenue
    "q3_shipping" -> ((s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(revenueDec).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped: 6-way join through region→nation→customer→orders→
    // lineitem→supplier with the local-supplier constraint
    "q5_region_revenue" -> ((s, d) => {
      val reg = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val nat = Tables.nation(s, d)
      val cust = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(sum(revenueDec).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // J1/J2 parity — agg ⋈ broadcast dim (db/ddl.sql:163-164)
    "join_orders_customer" -> ((s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(count(lit(1)).as("order_cnt"),
             sum(col("o_totalprice").cast(D)).cast("double").as("total_spent"))
        .orderBy(col("order_cnt").desc, col("c_custkey"))
        .limit(25)),

    // left-semi (EXISTS): customers having a >400k order
    "semi_join_big_spenders" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // left-anti (NOT EXISTS): customers with no big-ticket order (every
    // customer has *some* order in this data, so anti on all orders
    // would be empty — this keeps the anti-join shape and a non-empty,
    // SF-stable result)
    "anti_join_no_orders" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // W1-parity window function — top-3 orders per customer by price
    "window_rank_orders" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // running-total window (frame) — cumulative spend per customer ordered
    // by order date
    "window_running_total" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .withColumn("running_spent",
          sum(col("o_totalprice").cast(D)).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_spent")
        .orderBy("o_custkey", "o_orderkey")
        .limit(500)
    }),

    // ROLLUP (hierarchical subtotals) over region→nation
    // expressed via spark.sql: the DataFrame rollup-after-join trips the
    // ambiguous-self-join analyzer check on the Expand node's attrs
    "rollup_nation_counts" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("graft_nation")
      Tables.region(s, d).createOrReplaceTempView("graft_region")
      s.sql(
        """SELECT r_name, n_name, count(*) AS cnt
          |FROM graft_nation JOIN graft_region ON n_regionkey = r_regionkey
          |GROUP BY ROLLUP (r_name, n_name)
          |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)
    }),

    // DISTINCT aggregation
    "distinct_parts_per_flag" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // JSON extraction from the events props column
    "json_extract_props" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("k_sum"), count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // IN-subquery shape via broadcast semi join: lineitems of urgent orders
    "semi_join_urgent_lineitems" -> ((s, d) => {
      val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      Tables.lineitem(s, d)
        .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
             sum(col("l_quantity").cast(D)).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    }),

    // grouped having-style filter on aggregate
    "parts_hot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 3)
        .orderBy(col("cnt").desc, col("l_partkey"))
        .limit(100))
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         |  CAST(sum($revenueSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_shipping" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |  AND l_shipdate > TIMESTAMP '1998-01-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name, CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "join_orders_customer" ->
      """SELECT c_custkey, c_name, count(*) AS order_cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spent
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY order_cnt DESC, c_custkey LIMIT 25""".stripMargin,

    "semi_join_big_spenders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "anti_join_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "window_rank_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "window_running_total" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_spent
        |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 500""".stripMargin,

    "rollup_nation_counts" ->
      """SELECT r_name, n_name, count(*) AS cnt
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "distinct_parts_per_flag" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "json_extract_props" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum,
        |       count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "semi_join_urgent_lineitems" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_orderkey = l_orderkey
        |                AND o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "parts_hot" ->
      """SELECT l_partkey, count(*) AS cnt FROM lineitem
        |GROUP BY l_partkey HAVING count(*) >= 3
        |ORDER BY cnt DESC, l_partkey LIMIT 100""".stripMargin
  )
}
