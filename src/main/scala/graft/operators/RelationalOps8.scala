package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Eighth relational tranche: the two remaining TPC-H shapes the
  * driver schema can express (Q2/Q9/Q11/Q16/Q20 need `partsupp`,
  * which the testdata does not generate).
  *
  *  - `q12_late_shipments` — TPC-H Q12's dual conditional counts over
  *    a fact-fact join with a COLUMN-vs-COLUMN date-band predicate.
  *    The schema has no ship mode or commit/receipt dates, so the
  *    adaptation groups by `l_linestatus` and defines "late" as
  *    shipping 30–365 days after the order date (shipdate compared to
  *    arithmetic on ANOTHER table's column — the Q12 essence);
  *    high/low line counts split on order priority exactly as Q12 does.
  *  - `q17_small_qty_revenue` — TPC-H Q17's per-part correlated
  *    average: revenue that would be lost by dropping orders below
  *    20% of the part's average quantity (brand+type stand in for
  *    brand+container). The correlated scalar subquery decorrelates
  *    into a per-part aggregate joined back to the fact.
  *
  * Cross-engine exactness: quantities/prices are summed in
  * DECIMAL(18,4) (doubles re-associate under partitioning; decimals
  * don't), and the 20%-of-average threshold is compared
  * multiplicatively — `5·qty·cnt < Σqty` — so no division's
  * engine-specific decimal scale ever executes. The single final
  * `/7.0` runs in double on both engines (one correctly-rounded IEEE
  * op on identical inputs).
  *
  * Scale notes (100 TB):
  *  - q12: one fact-fact equi join on the order key (SMJ under AQE —
  *    both sides hash-partition on their natural key), the band
  *    predicate is evaluated inside the join's codegen stage, and the
  *    output is |linestatus| rows via partial+final conditional sums.
  *  - q17: the part filter broadcasts (~1% of a dim); the per-part
  *    quantity tier aggregates lineitem on l_partkey once (map-side
  *    partials collapse repeats) and joins back on the SAME key, so
  *    AQE reuses one hash partitioning for both the tier build and the
  *    probe; output is a single row.
  */
object RelationalOps8 {
  type Q = (SparkSession, String) => DataFrame

  private val D = DecimalType(18, 4)

  val queries: Map[String, Q] = Map(
    // TPC-H Q12 shape: high/low-priority line counts among late
    // shipments (shipped 30-365 days after their order date), by line
    // status
    "q12_late_shipments" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 30 DAYS") &&
                col("l_shipdate") < col("o_orderdate") + expr("INTERVAL 365 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT" ||
                   col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
            .as("high_line_count"),
          sum(when(col("o_orderpriority") =!= "1-URGENT" &&
                   col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
            .as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // TPC-H Q17 shape: yearly revenue forgone by refusing orders under
    // 20% of the part's average quantity, for one brand+type slice.
    // The threshold is the decorrelated per-part aggregate; the 20%
    // compare is multiplicative (5·qty·cnt < Σqty, all DECIMAL-exact).
    "q17_small_qty_revenue" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast(D)).as("sq"), count(lit(1)).as("cq"))
      li
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#3" && col("p_type") === "PROMO")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast(D) * lit(5) * col("cq") < col("sq"))
        .agg((sum(col("l_extendedprice").cast(D)).cast("double") / lit(7.0))
          .as("avg_yearly"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q12_late_shipments" ->
      """SELECT l_linestatus,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate < o_orderdate + INTERVAL 365 DAY
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q17_small_qty_revenue" ->
      """WITH pq AS (
        |  SELECT l_partkey AS pk,
        |         sum(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
        |         count(*) AS cq
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |         / 7.0 AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN pq ON l_partkey = pk
        |WHERE p_brand = 'Brand#3' AND p_type = 'PROMO'
        |  AND CAST(l_quantity AS DECIMAL(18,4)) * 5 * cq < sq""".stripMargin
  )
}
