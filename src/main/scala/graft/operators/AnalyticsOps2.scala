package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product-analytics tranche on the events stream table: ordered-step
  * funnel conversion, cohort retention matrix, zero-filled time-series
  * gap fill, and exact linear-regression fit per group. All
  * oracle-checked.
  *
  * Scale notes (100 TB):
  *  - the funnel's stage frames are per-user aggregates joined on
  *    user_id — each stage's frame is a subset of the previous one, so
  *    the relations SHRINK monotonically down the funnel, and every
  *    join is co-partitioned on the same key (one shuffle each, AQE
  *    coalesces the tail);
  *  - the cohort matrix joins the per-user first-day tier (|users|
  *    rows) back to the distinct (user, day) activity tier — both
  *    pre-aggregated before the join, so the shuffle carries tiers,
  *    never raw events;
  *  - gap fill generates the calendar spine from the MIN/MAX bounds —
  *    spine size is bounded by elapsed time, not data volume, and the
  *    counts side is pre-aggregated per minute before the join;
  *  - regr_fit uses the exact-integer-moment pattern
  *    (see stats_exact_moments): partial aggregation of five decimal
  *    sums map-side, one final division sequence replayed identically
  *    in the oracle for bit parity.
  */
object AnalyticsOps2 {
  type Q = (SparkSession, String) => DataFrame

  private val I = DecimalType(38, 0)

  val queries: Map[String, Q] = Map(
    // ordered funnel: first 'view', first 'click' AT/AFTER that view,
    // first 'purchase' at/after that click — per user, then the
    // stage-survivor counts (the product-analytics conversion query)
    "funnel_conversion" -> ((s, d) => {
      val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("vts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") >= col("vts"))
        .groupBy("user_id").agg(min("ts").as("cts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") >= col("cts"))
        .groupBy("user_id").agg(min("ts").as("pts"))
      ev.agg(countDistinct("user_id").as("n_users"))
        .crossJoin(v.agg(count(lit(1)).as("n_view")))
        .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
    }),

    // cohort retention matrix: users grouped by first-seen day, distinct
    // actives per (cohort_day, day_offset) for the first week
    "retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val firstDay = ev.groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
      val activity = ev
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      activity.join(firstDay, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
        .filter(col("day_offset").between(0, 7))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // zero-filled per-minute event counts across the full observed
    // range — the gap-fill shape dashboards need (a groupBy alone
    // silently drops empty buckets)
    "gap_fill_minutes" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val spine = ev
        .agg(min(date_trunc("minute", col("ts"))).as("lo"),
          max(date_trunc("minute", col("ts"))).as("hi"))
        .select(explode(expr("sequence(lo, hi, interval 1 minute)")).as("minute"))
      val counts = ev
        .groupBy(date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("c"))
      spine.join(counts, Seq("minute"), "left")
        .select(col("minute"), coalesce(col("c"), lit(0L)).as("n"))
        .orderBy("minute")
    }),

    // event-type transition matrix (first-order Markov over each
    // user's event sequence): per-key lag window — one shuffle on
    // user_id, sort within partitions, then a dim-sized count agg
    "event_transitions" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts", "event_id")
      val t = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      t.withColumn("p_ppm", expr("n * 1000000 div sum(n) over (partition by from_type)"))
        .orderBy("from_type", "to_type")
    }),

    // exact z-score outlier counts per event type: mean/stddev from
    // quantized integer moments (one aggregation pass), then a second
    // pass counts |x - mean| > 3σ — both passes scan-bound, the
    // moment tier broadcast back into the filter
    "value_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), floor(col("value") * 100).cast("long").as("x"))
      val I = org.apache.spark.sql.types.DecimalType(38, 0)
      val m = ev.groupBy("event_type").agg(
          count(lit(1)).cast(I).as("n"),
          sum(col("x").cast(I)).as("sx"),
          sum((col("x") * col("x")).cast(I)).as("sxx"))
        .select(col("event_type"),
          col("n").cast("double").as("nd"),
          col("sx").cast("double").as("sxd"),
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double").as("vn"))
        .select(col("event_type"),
          (col("sxd") / col("nd")).as("mean_x"),
          (sqrt(col("vn")) / col("nd")).as("sd_x"))
      ev.join(broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          count(when(abs(col("x").cast("double") - col("mean_x")) > lit(3.0) * col("sd_x"), 1))
            .as("n_outliers"))
        .orderBy("event_type")
    }),

    // exact least-squares fit of extendedprice on quantity per
    // returnflag: slope / intercept / r² from integer moments
    // (floor(x*100) quantization ⇒ exact decimal sums; the double
    // division sequence is identical in the oracle, so every step is a
    // correctly-rounded IEEE op on identical inputs). The 100×/100×
    // scaling cancels in the slope and r²; the intercept divides back.
    "regr_fit" -> ((s, d) => {
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
          col("sx").cast("double").as("sxd"),
          col("sy").cast("double").as("syd"),
          col("n").cast("double").as("nd"))
        .select(col("l_returnflag"), col("n"),
          (col("vnxy") / col("vnx")).as("slope"),
          ((col("syd") / col("nd") - (col("vnxy") / col("vnx")) * (col("sxd") / col("nd")))
            / lit(100.0)).as("intercept"),
          ((col("vnxy") / (sqrt(col("vnx")) * sqrt(col("vny"))))
            * (col("vnxy") / (sqrt(col("vnx")) * sqrt(col("vny"))))).as("r2"))
        .orderBy("l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(
    "funnel_conversion" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS vts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS cts
        |  FROM events e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.vts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS pts
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.cts
        |  GROUP BY e.user_id)
        |SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
        |       (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click_after_view,
        |       (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin,

    "retention_cohorts" ->
      """WITH fd AS (
        |  SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
        |  FROM events GROUP BY user_id),
        |act AS (
        |  SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
        |SELECT fd.cohort_day,
        |       CAST(date_diff('day', fd.cohort_day, act.day) AS BIGINT) AS day_offset,
        |       count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN fd ON fd.user_id = act.user_id
        |WHERE date_diff('day', fd.cohort_day, act.day) BETWEEN 0 AND 7
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "gap_fill_minutes" ->
      """WITH bounds AS (
        |  SELECT min(date_trunc('minute', ts)) AS lo,
        |         max(date_trunc('minute', ts)) AS hi FROM events),
        |spine AS (
        |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS minute
        |  FROM bounds),
        |counts AS (
        |  SELECT date_trunc('minute', ts) AS minute, count(*) AS c
        |  FROM events GROUP BY 1)
        |SELECT s.minute, COALESCE(c.c, 0) AS n
        |FROM spine s LEFT JOIN counts c ON c.minute = s.minute
        |ORDER BY s.minute""".stripMargin,

    "event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       CAST(n * 1000000 // sum(n) OVER (PARTITION BY from_type) AS BIGINT)
        |         AS p_ppm
        |FROM t ORDER BY from_type, to_type""".stripMargin,

    "value_outliers" ->
      """WITH q AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS x FROM events),
        |m AS (
        |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx
        |  FROM q GROUP BY event_type),
        |stats AS (
        |  SELECT event_type,
        |         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_x,
        |         sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE) AS sd_x
        |  FROM m)
        |SELECT q.event_type, count(*) AS n_events,
        |       CAST(count(*) FILTER (
        |         WHERE abs(CAST(x AS DOUBLE) - mean_x) > 3.0 * sd_x) AS BIGINT)
        |         AS n_outliers
        |FROM q JOIN stats ON stats.event_type = q.event_type
        |GROUP BY q.event_type ORDER BY q.event_type""".stripMargin,

    "regr_fit" ->
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
        |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |         CAST(n AS DOUBLE) AS nd
        |  FROM m)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |       vnxy / vnx AS slope,
        |       (syd / nd - (vnxy / vnx) * (sxd / nd)) / 100.0 AS intercept,
        |       (vnxy / (sqrt(vnx) * sqrt(vny)))
        |         * (vnxy / (sqrt(vnx) * sqrt(vny))) AS r2
        |FROM v ORDER BY l_returnflag""".stripMargin
  )
}
