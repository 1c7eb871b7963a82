package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sixth relational tranche: the remaining classic TPC-H shapes
  * expressible over the driver's schema — Q7 (volume shipping between
  * a nation pair), Q10 (returned-item customer ranking), Q19
  * (disjunctive band predicates). All oracle-checked with the decimal
  * intermediate pattern for bit-exact revenue sums.
  *
  * Scale notes (100 TB):
  *  - q7: lineitem⋈orders is the only fact-fact join (SMJ under AQE);
  *    both nation hops are broadcast; the (nation, nation, year)
  *    output is dim-sized so the final shuffle carries group states;
  *  - q10: the returned-flag filter pushes to the lineitem scan
  *    (PushedFilters), shrinking the join input before the fact-fact
  *    join; top-20 is TakeOrderedAndProject;
  *  - q19: the disjunctive predicate is row-local after a broadcast
  *    part join — Catalyst extracts the common p_partkey equi-key, so
  *    no cartesian anywhere despite the OR bands.
  */
object RelationalOps6 {
  type Q = (SparkSession, String) => DataFrame

  private val D = DecimalType(18, 4)
  private def revenueDec = col("l_extendedprice").cast(D) *
    (lit(1).cast(D) - col("l_discount").cast(D))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  val queries: Map[String, Q] = Map(
    // TPC-H Q7 shape: shipping volume between NATION_1 and NATION_3 (a pair with trade at every test SF)
    // (both directions), by ship year
    "q7_nation_volume" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("c_nationkey") === col("ck"))
        .join(broadcast(n2), col("s_nationkey") === col("sk"))
        .filter((col("cust_nation") === "NATION_1" && col("supp_nation") === "NATION_3") ||
                (col("cust_nation") === "NATION_3" && col("supp_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sum(revenueDec).cast("double").as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    // 1996H1, with their nation
    "q10_returned_customers" -> ((s, d) =>
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(sum(revenueDec).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)),

    // TPC-H Q19 shape: revenue under three disjunctive
    // (brand, size-band, quantity-band) predicates — one output row
    "q19_disjunctive_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(revenueDec).cast("double").as("revenue"),
          count(lit(1)).as("n_items")))
  )

  val oracles: Map[String, String] = Map(
    "q7_nation_volume" ->
      s"""SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
         |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |       CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_3')
         |   OR (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q10_returned_customers" ->
      s"""SELECT c_custkey, c_name, n_name,
         |       CAST(sum($revenueSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1996-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q19_disjunctive_revenue" ->
      s"""SELECT CAST(sum($revenueSql) AS DOUBLE) AS revenue,
         |       count(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin
  )
}
