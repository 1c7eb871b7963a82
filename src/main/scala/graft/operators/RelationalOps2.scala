package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second tranche of relational shapes a warehouse engine must plan
  * well: correlated scalar subqueries, NOT IN (null-safe anti),
  * HAVING over aggregated sums, min-by/max-by, and grouped string agg.
  * All oracle-checked.
  */
object RelationalOps2 {
  type Q = (SparkSession, String) => DataFrame

  private val D = DecimalType(18, 4)

  val queries: Map[String, Q] = Map(
    // TPC-H Q2-shaped correlated scalar subquery: parts at their
    // minimum-cost supplier (here: lineitems at their order's max
    // quantity) — planned as an aggregated self-join
    "correlated_max_qty" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val maxq = li.groupBy(col("l_orderkey").as("mk"))
        .agg(max("l_quantity").as("max_qty"))
      li.join(maxq, col("l_orderkey") === col("mk") && col("l_quantity") === col("max_qty"))
        .groupBy("l_orderkey")
        .agg(min("l_linenumber").as("first_max_line"), max("l_quantity").as("qty"))
        .orderBy("l_orderkey")
        .limit(500)
    }),

    // TPC-H Q18-shaped: orders whose total quantity exceeds a threshold
    "big_orders_having" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity").cast(D)).cast("double").as("total_qty"))
        .filter(col("total_qty") > 150.0)
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    }),

    // NOT IN with non-null keys → anti join (null-safe semantics:
    // keys are NOT NULL here, so NOT IN == anti join in both engines)
    "not_in_parts" -> ((s, d) => {
      val used = Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") > 40.0)
        .select(col("l_partkey"))
      Tables.part(s, d)
        .join(used, col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
        .limit(500)
    }),

    // min_by/max_by: each customer's cheapest and priciest order
    "minmax_by_order" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(
          expr("min_by(o_orderkey, struct(o_totalprice, o_orderkey))").as("cheapest_order"),
          expr("max_by(o_orderkey, struct(o_totalprice, -o_orderkey))").as("priciest_order"),
          count(lit(1)).as("n"))
        .orderBy("o_custkey")
        .limit(500)),

    // grouped string aggregation (listagg/string_agg with ordering)
    "region_nation_list" -> ((s, d) =>
      Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
        .orderBy("r_name")),

    // conditional aggregation (pivot-style counts in one pass)
    "order_status_pivot" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
        .orderBy("o_orderpriority"))
  )

  val oracles: Map[String, String] = Map(
    "correlated_max_qty" ->
      """SELECT l_orderkey, min(l_linenumber) AS first_max_line,
        |       max(l_quantity) AS qty
        |FROM lineitem l
        |WHERE l_quantity = (SELECT max(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_orderkey = l.l_orderkey)
        |GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 500""".stripMargin,

    "big_orders_having" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, total_qty FROM (
        |  SELECT l_orderkey,
        |         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 150.0) t
        |JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 100""".stripMargin,

    "not_in_parts" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
        |                        WHERE l_returnflag = 'R' AND l_quantity > 40.0)
        |ORDER BY p_partkey LIMIT 500""".stripMargin,

    "minmax_by_order" ->
      """SELECT o_custkey,
        |       (SELECT o_orderkey FROM orders o2 WHERE o2.o_custkey = o.o_custkey
        |        ORDER BY o_totalprice, o_orderkey LIMIT 1) AS cheapest_order,
        |       (SELECT o_orderkey FROM orders o3 WHERE o3.o_custkey = o.o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) AS priciest_order,
        |       count(*) AS n
        |FROM orders o GROUP BY o_custkey ORDER BY o_custkey LIMIT 500""".stripMargin,

    "region_nation_list" ->
      """SELECT r_name,
        |       string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "order_status_pivot" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
