package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seventh relational tranche: the last classic TPC-H shapes the
  * driver schema can express (no `partsupp` table exists, so Q2/Q11/
  * Q16/Q20 are out of reach by construction; Q12/Q21's lateness
  * columns — commit/receipt dates, ship mode — are absent, so Q21 is
  * adapted to the returns flag with its EXISTS/NOT-EXISTS nesting kept
  * intact, and Q22's phone country code becomes the market segment).
  *
  *  - `q8_market_share` — nation market share within a region's
  *    customers for one part type, by order year (the two-level
  *    conditional-share aggregation over a 6-table join);
  *  - `q13_order_distribution` — customer count by order count over a
  *    LEFT OUTER join with a join-side predicate (the histogram of a
  *    grouped outer join, nulls → 0 bucket);
  *  - `q15_top_supplier` — per-supplier quarterly revenue vs the
  *    scalar MAX of that same aggregate (self-referential view +
  *    equality on the aggregate);
  *  - `q18_large_orders` — customers holding orders whose total
  *    quantity clears a threshold: IN over a grouped HAVING subquery,
  *    then a re-aggregation on the joined result;
  *  - `q21_sole_returned_supplier` — suppliers who were the ONLY
  *    supplier with a returned line on a finished multi-supplier
  *    order: a semi join (another supplier exists on the order) AND an
  *    anti join (no OTHER supplier's line was returned) on the same
  *    fact — the Q21 double-correlated EXISTS/NOT-EXISTS shape;
  *  - `q22_idle_rich_customers` — per-segment count/balance of
  *    above-average-balance customers with no URGENT orders: scalar
  *    aggregate subquery + anti join. (Canonical Q22 anti-joins "no
  *    orders at all", but every driver-generated customer has orders —
  *    the urgent-order variant keeps the shape non-degenerate.)
  *
  * All six are DuckDB-oracle-checked; money stays in DECIMAL(18,4)
  * until a final cast (the tranche-wide bit-exactness discipline), and
  * the Q22 average threshold is compared multiplicatively
  * (bal·n > Σbal — no decimal division, whose scale rules differ
  * between engines).
  *
  * Scale notes (100 TB):
  *  - q8: lineitem⋈orders is the only fact-fact join (SMJ/AQE);
  *    customer/supplier/part/nation/region are all broadcast dims, and
  *    the share numerator rides the same aggregate as the denominator
  *    (one pass, two conditional sums, per-year output is dim-sized);
  *  - q13: orders pre-aggregates to (custkey, cnt) BEFORE the outer
  *    join with customers — the join carries one row per customer, not
  *    one per order, and the final histogram is at most |distinct cnt|;
  *  - q15: revenue per supplier is a 100-row aggregate; the MAX and the
  *    equality filter are driver-negligible (broadcast of a 1-row agg);
  *  - q18: the HAVING subquery aggregates lineitem once on l_orderkey
  *    (its natural key — map-side partial aggs collapse most of it),
  *    and only qualifying orderkeys flow into the 3-way join;
  *  - q21: both the semi and anti legs are lineitem self-joins on
  *    l_orderkey; they reuse the same hash partitioning (one Exchange
  *    per side under AQE), and the per-supplier count is dim-sized;
  *  - q22: customers is the small side everywhere; the anti join
  *    probes orders' custkey projection only.
  */
object RelationalOps7 {
  type Q = (SparkSession, String) => DataFrame

  private val D = DecimalType(18, 4)
  private def revenueDec = col("l_extendedprice").cast(D) *
    (lit(1).cast(D) - col("l_discount").cast(D))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))"

  /** Q18 threshold: canonical TPC-H value; ~0.1% of orders qualify at
    * every driver SF (max order quantity ≈ 378–475). */
  val LargeOrderQty = 300.0

  val queries: Map[String, Q] = Map(
    // TPC-H Q8 shape: NATION_1 suppliers' share of PROMO-part revenue
    // sold to AMERICA customers, by order year over 1996–1997
    "q8_market_share" -> ((s, d) => {
      val custNation = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cnk")))
      val suppNation = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation")))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                  col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(custNation, col("c_nationkey") === col("cnk"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(suppNation, col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_1", revenueDec)
            .otherwise(lit(0).cast(D))).cast("double") /
            sum(revenueDec).cast("double")).as("mkt_share"))
        .orderBy("o_year")
    }),

    // TPC-H Q13 shape: distribution of customers by their count of
    // non-urgent orders (LEFT OUTER with the predicate on the join side)
    "q13_order_distribution" -> ((s, d) => {
      val perCust = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
      Tables.customer(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 shape: supplier(s) achieving the maximum 1996Q1 revenue
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
                col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenueDec).cast("double").as("total_revenue"))
      val top = rev.agg(max(col("total_revenue")).as("mx"))
      Tables.supplier(s, d)
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(top), col("total_revenue") === col("mx"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q18 shape: top-100 large orders (total quantity > 300) with
    // their customer and the re-aggregated quantity
    "q18_large_orders" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val big = li.groupBy(col("l_orderkey").as("bk"))
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > LargeOrderQty)
        .select("bk")
      li.join(big, col("l_orderkey") === col("bk"), "left_semi")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q21 shape (adapted to the returns flag): for each supplier,
    // count 'F' orders where THIS supplier had a returned line, another
    // supplier was on the order (EXISTS), and no other supplier's line
    // was returned (NOT EXISTS)
    "q21_sole_returned_supplier" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .distinct()
      val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val othersR = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      l1
        .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
          "left_semi")
        .join(othersR, col("ok") === col("ok3") && col("sk") =!= col("sk3"),
          "left_anti")
        .join(broadcast(Tables.supplier(s, d)), col("sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(25)
    }),

    // TPC-H Q22 shape (adapted: segment instead of phone country code):
    // per-segment count/total balance of customers with no orders whose
    // balance exceeds the positive-balance average of those segments.
    // The average threshold compares multiplicatively (bal·n > Σbal) —
    // exact decimal arithmetic, no engine-specific division scale.
    "q22_idle_rich_customers" -> ((s, d) => {
      val segs = Seq("AUTOMOBILE", "MACHINERY", "BUILDING")
      val cust = Tables.customer(s, d).filter(col("c_mktsegment").isin(segs: _*))
      val thr = cust.filter(col("c_acctbal") > 0.0)
        .agg(sum(col("c_acctbal").cast(D)).as("sbal"),
          count(lit(1)).as("nbal"))
      cust
        .join(broadcast(thr),
          col("c_acctbal").cast(D) * col("nbal") > col("sbal"))
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(D)).cast("double").as("totacctbal"))
        .orderBy("c_mktsegment")
    })
  )

  val oracles: Map[String, String] = Map(
    "q8_market_share" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |       CAST(sum(CASE WHEN n2.n_name = 'NATION_1' THEN $revenueSql
         |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         |       / CAST(sum($revenueSql) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY o_year""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, COALESCE(cnt, 0) AS c_count
        |  FROM customer LEFT JOIN (
        |    SELECT o_custkey, count(*) AS cnt FROM orders
        |    WHERE o_orderpriority <> '1-URGENT' GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, CAST(sum($revenueSql) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q18_large_orders" ->
      s"""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
         |       sum(l_quantity) AS total_qty
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE l_orderkey IN (
         |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
         |  HAVING sum(l_quantity) > $LargeOrderQty)
         |GROUP BY 1, 2, 3, 4, 5
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q21_sole_returned_supplier" ->
      """SELECT s_name, count(*) AS numwait FROM (
        |  SELECT DISTINCT l1.l_orderkey AS ok, l1.l_suppkey AS sk
        |  FROM lineitem l1
        |  JOIN orders ON l1.l_orderkey = o_orderkey
        |  WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_returnflag = 'R')) t
        |JOIN supplier ON sk = s_suppkey
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin,

    "q22_idle_rich_customers" ->
      """WITH cust AS (
        |  SELECT * FROM customer
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'MACHINERY', 'BUILDING')),
        |thr AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,4))) AS sbal,
        |         count(*) AS nbal
        |  FROM cust WHERE c_acctbal > 0.0)
        |SELECT c_mktsegment, count(*) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |         AS totacctbal
        |FROM cust, thr
        |WHERE CAST(c_acctbal AS DECIMAL(18,4)) * nbal > sbal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = cust.c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  )
}
