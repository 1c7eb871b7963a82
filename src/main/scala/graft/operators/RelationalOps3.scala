package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Third tranche of relational coverage: analytic window functions
  * (lag gaps, ntile, percent_rank/cume_dist, full-frame first/last),
  * GROUPING SETS with grouping() flags, unpivot (stack), scalar
  * subqueries, exact second-moment statistics (stddev/corr) with
  * cross-engine bit parity, and a deterministic median+mode.
  *
  * All oracle-checked. Parity discipline (see .claude/skills/verify):
  * integer/decimal intermediates wherever a sum's addition order could
  * change low bits; the final double expressions use the SAME operation
  * sequence on both engines so every step is a correctly-rounded IEEE
  * op on identical inputs.
  *
  * Scale notes (100 TB): the per-key windows (lag, percent_rank) shuffle
  * once on the partition key and sort within partitions — no global
  * sort. `ntile_quartiles` is the one global-order window; at cluster
  * scale that shape should be served by `percentiles_exact`/
  * `approx_percentile_value` instead (noted inline), kept here because
  * the operator itself is part of the surface.
  */
object RelationalOps3 {
  type Q = (SparkSession, String) => DataFrame

  private val D = DecimalType(18, 4)
  private val I = DecimalType(38, 0)

  val queries: Map[String, Q] = Map(
    // lag(): per-user inter-event gap in µs (sessionization primitive).
    // One shuffle on user_id; sort within partition.
    "window_lag_gap" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .orderBy("user_id", "event_id")
    }),

    // ntile(4) over the global totalprice order → quartile stats.
    // Served by GlobalOrder.ntileGlobal: range-partitioned total sort +
    // zipWithIndex instead of WindowExec's single-partition global
    // window — same bucket assignment (spec-checked against Spark's own
    // ntile), but every stage stays parallel at 100 TB.
    "ntile_quartiles" -> ((s, d) => {
      GlobalOrder.ntileGlobal(
          Tables.orders(s, d).select("o_totalprice", "o_orderkey"),
          4, "quartile", col("o_totalprice"), col("o_orderkey"))
        .groupBy("quartile")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"),
          max("o_totalprice").as("hi"))
        .orderBy("quartile")
    }),

    // percent_rank + cume_dist within brand (unique order key ⇒
    // deterministic ranks; both are exact divisions of exact ranks)
    "percent_rank_brand" -> ((s, d) => {
      val w = Window.partitionBy("p_brand").orderBy("p_retailprice", "p_partkey")
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy("p_partkey")
        .limit(300)
    }),

    // GROUPING SETS with grouping() disambiguation flags — the general
    // form rollup/cube (already covered) specialize
    "grouping_sets_orders" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_prio,
               count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
                 o_orderpriority NULLS FIRST""")
    }),

    // exact population stddev + correlation via integer second moments:
    // scale to ints (floor(x*100) — identical double op both engines),
    // sum exactly in DECIMAL(38,0)/HUGEINT, then one identical sequence
    // of correctly-rounded double ops. Built-in stddev/corr stream
    // partial aggregates whose addition ORDER is engine-dependent —
    // this formulation is order-independent, hence oracle-exact, and
    // still one shuffle (all moments in a single partial/final agg).
    "stats_exact_moments" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_returnflag"),
        floor(col("l_quantity") * 100).cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
      val m = li.groupBy("l_returnflag").agg(
        count(lit(1)).cast(I).as("n"),
        sum(col("x").cast(I)).as("sx"),
        sum(col("y").cast(I)).as("sy"),
        sum((col("x") * col("x")).cast(I)).as("sxx"),
        sum((col("y") * col("y")).cast(I)).as("syy"),
        sum((col("x") * col("y")).cast(I)).as("sxy"))
      m.select(col("l_returnflag"),
          col("n").cast("long").as("n"),
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("vnx"),
          (col("n") * col("syy") - col("sy") * col("sy")).cast("double").as("vny"),
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double").as("vnxy"),
          col("n").cast("double").as("nd"))
        .select(col("l_returnflag"), col("n"),
          (sqrt(col("vnx")) / col("nd") / lit(100.0)).as("stddev_qty"),
          (sqrt(col("vny")) / col("nd") / lit(100.0)).as("stddev_price"),
          (col("vnxy") / (sqrt(col("vnx")) * sqrt(col("vny")))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // scalar subquery: nations whose mean customer balance beats the
    // global mean (1-row agg broadcast-cross-joined, never collected)
    "scalar_subquery_avg" -> ((s, d) => {
      val c = Tables.customer(s, d)
      def avgBal(df: DataFrame) =
        (sum(col("c_acctbal").cast(D)).cast("double") / count(lit(1))).as("a")
      val perNation = c.groupBy("c_nationkey").agg(avgBal(c).as("avg_bal"))
      val global = c.agg(avgBal(c).as("global_avg"))
      perNation.crossJoin(broadcast(global))
        .filter(col("avg_bal") > col("global_avg"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("avg_bal"), col("global_avg"))
        .orderBy("n_name")
    }),

    // unpivot via stack(): wide conditional-agg row → long (status, n)
    "unpivot_status" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p"))
        .selectExpr("o_orderpriority",
          "stack(3, 'F', n_f, 'O', n_o, 'P', n_p) AS (status, n)")
        .orderBy("o_orderpriority", "status")),

    // deterministic median (interpolated, = quantile_cont) + mode with
    // explicit min-value tiebreak (built-in mode() tiebreak is
    // engine-defined — this formulation is total)
    "median_mode_value" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val med = ev.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("median_value"))
      val mode = ev.groupBy("event_type", "value").agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(expr("min_by(value, struct(-c, value))").as("mode_value"))
      med.join(mode, "event_type").orderBy("event_type")
    }),

    // full-frame first/last window values: each user's first and last
    // event type by time (ROWS UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING)
    "first_last_events" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .select(col("user_id"),
          first("event_type").over(w).as("first_type"),
          last("event_type").over(w).as("last_type"),
          count(lit(1)).over(w).as("n"))
        .distinct()
        .orderBy("user_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "window_lag_gap" ->
      """SELECT user_id, event_id,
        |       lag(event_id, 1) OVER w AS prev_event_id,
        |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin,

    "ntile_quartiles" ->
      """SELECT quartile, count(*) AS n, min(o_totalprice) AS lo,
        |       max(o_totalprice) AS hi
        |FROM (SELECT o_totalprice,
        |             ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
        |      FROM orders)
        |GROUP BY quartile ORDER BY quartile""".stripMargin,

    "percent_rank_brand" ->
      """SELECT p_partkey, p_brand,
        |       percent_rank() OVER w AS pr,
        |       cume_dist() OVER w AS cd
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
        |ORDER BY p_partkey LIMIT 300""".stripMargin,

    "grouping_sets_orders" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping(o_orderstatus) AS INTEGER) AS g_status,
        |       CAST(grouping(o_orderpriority) AS INTEGER) AS g_prio,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
        |         o_orderpriority NULLS FIRST""".stripMargin,

    "stats_exact_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag,
        |         CAST(floor(l_quantity * 100) AS BIGINT) AS x,
        |         CAST(floor(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         sum(x) AS sx, sum(y) AS sy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM s GROUP BY l_returnflag),
        |v AS (
        |  SELECT l_returnflag, n,
        |         CAST(n * sxx - sx * sx AS DOUBLE) AS vnx,
        |         CAST(n * syy - sy * sy AS DOUBLE) AS vny,
        |         CAST(n * sxy - sx * sy AS DOUBLE) AS vnxy,
        |         CAST(n AS DOUBLE) AS nd
        |  FROM m)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |       sqrt(vnx) / nd / 100.0 AS stddev_qty,
        |       sqrt(vny) / nd / 100.0 AS stddev_price,
        |       vnxy / (sqrt(vnx) * sqrt(vny)) AS corr_qty_price
        |FROM v ORDER BY l_returnflag""".stripMargin,

    "scalar_subquery_avg" ->
      """WITH pn AS (
        |  SELECT c_nationkey,
        |         CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |           / count(*) AS avg_bal
        |  FROM customer GROUP BY c_nationkey),
        |g AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |           / count(*) AS global_avg
        |  FROM customer)
        |SELECT n_name, avg_bal, global_avg
        |FROM pn
        |JOIN nation ON c_nationkey = n_nationkey
        |CROSS JOIN g
        |WHERE avg_bal > global_avg
        |ORDER BY n_name""".stripMargin,

    "unpivot_status" ->
      """WITH w AS (
        |  SELECT o_orderpriority,
        |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, 'F' AS status, n_f AS n FROM w
        |UNION ALL SELECT o_orderpriority, 'O', n_o FROM w
        |UNION ALL SELECT o_orderpriority, 'P', n_p FROM w
        |ORDER BY o_orderpriority, status""".stripMargin,

    "median_mode_value" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS median_value
        |  FROM events GROUP BY event_type),
        |c AS (SELECT event_type, value, count(*) AS n
        |      FROM events GROUP BY event_type, value),
        |mx AS (SELECT event_type, max(n) AS mxn FROM c GROUP BY event_type),
        |md AS (SELECT c.event_type, min(c.value) AS mode_value
        |       FROM c JOIN mx ON c.event_type = mx.event_type AND c.n = mx.mxn
        |       GROUP BY c.event_type)
        |SELECT med.event_type AS event_type, median_value, mode_value
        |FROM med JOIN md ON med.event_type = md.event_type
        |ORDER BY med.event_type""".stripMargin,

    "first_last_events" ->
      """SELECT DISTINCT user_id,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type,
        |       count(*) OVER w AS n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id""".stripMargin
  )
}
