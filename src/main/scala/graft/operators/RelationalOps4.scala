package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-3 relational tranche: the remaining ANSI surface a reference
  * user would expect — distribution window functions (ntile /
  * percent_rank / cume_dist / first_value), GROUPING SETS, EXISTS
  * (TPC-H Q4 shape), promo revenue share (Q14 shape), FULL OUTER join,
  * and the scalar string/date/conditional function surface. All
  * oracle-checked against DuckDB.
  *
  * Scale notes: every query here is either a broadcast join on a dim
  * (part), a partial-agg group-by, or a keyed window — nothing
  * materializes an unkeyed global window over fact-table rows except
  * via pre-aggregated daily tiers (window_ntile_quartiles' 5-value key
  * is a function-surface test; see its inline note).
  */
object RelationalOps4 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // value window functions (lead / dense_rank / nth_value): each
    // customer's order timeline — next order's price, dense price-band
    // rank, and the 2nd order as an explicit whole-partition frame.
    // Keyed by custkey (high cardinality — scales, unlike a global
    // window); lead's default fires on each customer's last order.
    "window_value_funcs" -> ((s, d) => {
      val byDate = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val whole = byDate.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("next_price", lead(col("o_totalprice"), 1, -1).over(byDate))
        .withColumn("band_rank",
          dense_rank().over(Window.partitionBy("o_custkey")
            .orderBy(floor(col("o_totalprice") / 50000L))).cast("long"))
        .withColumn("second_order", nth_value(col("o_orderkey"), 2).over(whole))
        .select("o_orderkey", "o_custkey", "next_price", "band_rank", "second_order")
        .orderBy("o_orderkey")
    }),

    // distribution window functions; deterministic total order via the
    // unique orderkey tiebreak. NOTE the partition key has only 5
    // values — fine as a function-surface test, but at real fact scale
    // a distribution window needs a higher-cardinality key (e.g.
    // priority × month) or a two-pass rank-aggregate formulation;
    // 1/5th of a 100 TB table in one window partition would spill
    "window_ntile_quartiles" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("cheapest", first_value(col("o_orderkey")).over(w))
        .select("o_orderkey", "o_orderpriority", "quartile", "pct_rank",
          "cume", "cheapest")
        .orderBy("o_orderkey")
    }),

    // GROUPING SETS — the general form behind rollup/cube (both already
    // covered); one pass, one shuffle, three grouping branches
    "grouping_sets_totals" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS total
          |FROM graft_orders_gs
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY o_orderstatus ASC NULLS FIRST,
          |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // TPC-H Q4 shape: orders having at least one late-shipping line
    // (EXISTS → left-semi join; the probe side never duplicates rows)
    "q4_order_priority" -> ((s, d) => {
      val late = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
      Tables.orders(s, d)
        .join(late,
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // TPC-H Q14 shape: promo revenue share over a one-year ship window;
    // part is a broadcast dim, revenue in decimal until the final
    // double division (identical IEEE op in both engines)
    "q14_promo_share" -> ((s, d) => {
      val D = DecimalType(18, 4)
      val rev = (col("l_extendedprice").cast(D) *
        (lit(1).cast(D) - col("l_discount").cast(D))).cast(D)
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(D)))
            .cast("double") * 100.0 /
            sum(rev).cast("double")).as("promo_share"))
    }),

    // FULL OUTER join of two daily pre-aggregated tiers (order days vs
    // ship days — partial overlap exercises both null sides); joining
    // aggregates, not fact rows, keeps the outer join tiny at any SF
    "full_outer_daily" -> ((s, d) => {
      val od = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"))
      val sd = Tables.lineitem(s, d)
        .groupBy(to_date(col("l_shipdate")).as("day"))
        .agg(count(lit(1)).as("n_shipped"))
      od.join(sd, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
        .orderBy("day")
    }),

    // scalar string-function surface over the customer dim — widened
    // so the regex/pad/reverse projection isn't pinned to the single
    // local scan task (Widen is a no-op at real scale)
    "string_funcs_surface" -> ((s, d) =>
      Widen(Tables.customer(s, d).select("c_custkey", "c_name"))
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          lpad(col("c_custkey").cast("string"), 12, "0").as("padded"),
          regexp_replace(col("c_name"), "Customer#", "C-").as("short_name"),
          instr(col("c_name"), "#").cast("long").as("hash_pos"),
          reverse(substring(col("c_name"), -4, 4)).as("rev_tail"),
          length(col("c_name")).cast("long").as("name_len"))
        .orderBy("c_custkey")),

    // scalar date-function surface (year/quarter/month/day/dow/doy,
    // month-end, month-add with day clamping)
    "date_funcs_surface" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          dayofweek(col("o_orderdate")).cast("long").as("dow1"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"),
          last_day(col("o_orderdate")).as("month_end"),
          add_months(to_date(col("o_orderdate")), 1).as("next_month"))
        .orderBy("o_orderkey")),

    // predicate surface: LIKE / regex / IN-list / BETWEEN as pushable
    // scan filters, counted per brand (conditional aggregation keeps
    // the output tiny while every predicate class is exercised)
    "predicate_surface" -> ((s, d) =>
      Tables.part(s, d)
        .groupBy("p_brand")
        .agg(
          sum(when(col("p_type").like("PRO%"), 1L).otherwise(0L)).as("n_promo"),
          sum(when(col("p_name").rlike("[aeiou]{2}"), 1L).otherwise(0L)).as("n_vowel_pair"),
          sum(when(col("p_size").isin(5, 10, 15, 20), 1L).otherwise(0L)).as("n_sized"),
          sum(when(col("p_retailprice").between(500.0, 1500.0), 1L).otherwise(0L)).as("n_mid_price"))
        .orderBy("p_brand")),

    // conditional/null scalar surface: least/greatest/nullif under
    // decimal-stable aggregation
    "conditional_funcs_agg" -> ((s, d) => {
      val D = DecimalType(18, 4)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          sum(least(col("l_quantity"), lit(25.0)).cast(D)).cast("double")
            .as("sum_capped_qty"),
          sum(greatest(col("l_discount"), lit(0.05)).cast(D)).cast("double")
            .as("sum_floor_disc"),
          count(nullif(col("l_linestatus"), lit("F"))).as("n_not_f"))
        .orderBy("l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(
    "window_value_funcs" ->
      """SELECT o_orderkey, o_custkey,
        |       lead(o_totalprice, 1, -1) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
        |       CAST(dense_rank() OVER
        |         (PARTITION BY o_custkey ORDER BY floor(o_totalprice / 50000)) AS BIGINT) AS band_rank,
        |       nth_value(o_orderkey, 2) OVER
        |         (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "window_ntile_quartiles" ->
      """SELECT o_orderkey, o_orderpriority,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume,
        |       first_value(o_orderkey) OVER w AS cheapest
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "grouping_sets_totals" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18, 2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q14_promo_share" ->
      """SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
        |                     THEN CAST(CAST(l_extendedprice AS DECIMAL(18,4))
        |                          * (1 - CAST(l_discount AS DECIMAL(18,4)))
        |                          AS DECIMAL(18,4))
        |                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
        |       / CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
        |                  * (1 - CAST(l_discount AS DECIMAL(18,4)))
        |                  AS DECIMAL(18,4))) AS DOUBLE) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin,

    "full_outer_daily" ->
      """WITH od AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
        |            FROM orders GROUP BY 1),
        |     sd AS (SELECT CAST(l_shipdate AS DATE) AS day, count(*) AS n_shipped
        |            FROM lineitem GROUP BY 1)
        |SELECT COALESCE(od.day, sd.day) AS day,
        |       COALESCE(n_orders, 0) AS n_orders,
        |       COALESCE(n_shipped, 0) AS n_shipped
        |FROM od FULL OUTER JOIN sd ON od.day = sd.day
        |ORDER BY day""".stripMargin,

    "string_funcs_surface" ->
      """SELECT c_custkey,
        |       upper(c_name) AS uname,
        |       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS padded,
        |       regexp_replace(c_name, 'Customer#', 'C-', 'g') AS short_name,
        |       CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos,
        |       reverse(substr(c_name, length(c_name) - 3, 4)) AS rev_tail,
        |       CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "date_funcs_surface" ->
      """SELECT o_orderkey,
        |       CAST(date_part('year', o_orderdate) AS BIGINT) AS y,
        |       CAST(date_part('quarter', o_orderdate) AS BIGINT) AS q,
        |       CAST(date_part('month', o_orderdate) AS BIGINT) AS m,
        |       CAST(date_part('day', o_orderdate) AS BIGINT) AS dom,
        |       CAST(date_part('dow', o_orderdate) + 1 AS BIGINT) AS dow1,
        |       CAST(date_part('doy', o_orderdate) AS BIGINT) AS doy,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "predicate_surface" ->
      """SELECT p_brand,
        |       CAST(sum(CASE WHEN p_type LIKE 'PRO%' THEN 1 ELSE 0 END) AS BIGINT) AS n_promo,
        |       CAST(sum(CASE WHEN regexp_matches(p_name, '[aeiou]{2}') THEN 1 ELSE 0 END) AS BIGINT) AS n_vowel_pair,
        |       CAST(sum(CASE WHEN p_size IN (5, 10, 15, 20) THEN 1 ELSE 0 END) AS BIGINT) AS n_sized,
        |       CAST(sum(CASE WHEN p_retailprice BETWEEN 500.0 AND 1500.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_mid_price
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "conditional_funcs_agg" ->
      """SELECT l_returnflag,
        |       CAST(sum(CAST(least(l_quantity, 25.0) AS DECIMAL(18,4))) AS DOUBLE)
        |         AS sum_capped_qty,
        |       CAST(sum(CAST(greatest(l_discount, 0.05) AS DECIMAL(18,4))) AS DOUBLE)
        |         AS sum_floor_disc,
        |       count(nullif(l_linestatus, 'F')) AS n_not_f
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  )
}
