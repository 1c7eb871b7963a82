package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Analytics tranche: sessionization statistics (session ids via
  * cumulative gap-starts — the analysis layer on top of the ST4 session
  * semantics), trend smoothing (framed moving average), and customer
  * revenue ranking. All oracle-checked.
  */
object AnalyticsOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // per-user session statistics: session_id = running count of
    // 30s-gap session starts; then per-session extents, then per-user
    // rollup — the standard two-window sessionization pipeline
    "session_stats" -> ((s, d) => {
      val byKey = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      val marked = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byKey))
        .withColumn("is_start",
          (col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > lit(30000000L))
            .cast("long"))
        .withColumn("session_id", sum("is_start").over(
          byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val perSession = marked
        .groupBy("user_id", "event_type", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))
      perSession.groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_events").as("total_events"),
          sum("dur_us").as("total_dur_us"),
          max("n_events").as("max_session_events"))
        .orderBy("user_id")
    }),

    // 7-day moving average of daily event volume (framed window over
    // the pre-aggregated daily tier — frame math on aggregates, not rows)
    "daily_moving_avg" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("ma7",
          sum("c").over(w).cast("double") / count(lit(1)).over(w))
        .orderBy("day")
    }),

    // RANGE-frame window: per event, same-user event count in the
    // trailing hour — the window-function analogue of the banded range
    // join (frame bounds in event-time units, not row counts)
    "range_frame_hourly" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("tsec"))
        .rangeBetween(-3600L, Window.currentRow)
      Tables.events(s, d)
        .withColumn("tsec", expr("unix_micros(ts) div 1000000"))
        .withColumn("n_trailing_hour", count(lit(1)).over(w))
        .select("event_id", "n_trailing_hour")
        .orderBy("event_id")
    }),

    // TPC-H Q10-shaped: revenue from returned items per customer, top 20
    "returned_revenue_topk" -> ((s, d) => {
      val D = DecimalType(18, 4)
      val rev = col("l_extendedprice").cast(D) *
        (lit(1).cast(D) - col("l_discount").cast(D))
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(sum(rev).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // calendar-part breakdown (date-part extraction functions)
    "hourly_activity" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("m"),
          hour(col("ts")).cast("long").as("h"))
        .agg(count(lit(1)).as("n"))
        .orderBy("y", "m", "h")),

    // TPC-H Q6-shaped: tightly-filtered revenue sum (the pushdown
    // showcase — every predicate reaches the scan)
    "q6_revenue_delta" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24.0)
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
          col("l_discount").cast(DecimalType(18, 4)))
          .cast("double").as("revenue"))),

    // per-day distinct actives (the DAU query shape)
    "daily_active_users" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("dau"),
          count(lit(1)).as("events"))
        .orderBy("day")),

    // share-of-total via an unbounded window over the aggregate tier
    "event_type_share" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .groupBy("event_type").agg(count(lit(1)).as("n"))
      counts
        .withColumn("share",
          col("n").cast("double") / sum("n").over(Window.partitionBy()).cast("double"))
        .orderBy("event_type")
    }),

    // per-label embedding stats on exact quantized norms (cluster
    // quality telemetry for the ANN/IVF path)
    "emb_label_stats" -> ((s, d) =>
      // carry label through quantization: one scan, no re-join
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
        .withColumn("n", expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          sum("n").as("norm_sum"),
          min("n").as("norm_min"),
          max("n").as("norm_max"))
        .orderBy("label"))
  )

  val oracles: Map[String, String] = Map(
    "session_stats" ->
      """WITH marked AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         CASE WHEN prev_ts IS NULL
        |                OR epoch_us(ts) - epoch_us(prev_ts) > 30000000
        |              THEN 1 ELSE 0 END AS is_start
        |  FROM (SELECT user_id, event_type, ts, event_id,
        |               lag(ts) OVER (PARTITION BY user_id, event_type
        |                             ORDER BY ts, event_id) AS prev_ts
        |        FROM events) t),
        |sess AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         sum(is_start) OVER (PARTITION BY user_id, event_type
        |                             ORDER BY ts, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked),
        |per AS (
        |  SELECT user_id, event_type, session_id, count(*) AS n_events,
        |         epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |  FROM sess GROUP BY user_id, event_type, session_id)
        |SELECT user_id, count(*) AS n_sessions,
        |       CAST(sum(n_events) AS BIGINT) AS total_events,
        |       CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
        |       max(n_events) AS max_session_events
        |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin,

    "daily_moving_avg" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, count(*) AS c
        |  FROM events GROUP BY 1)
        |SELECT day, c,
        |       CAST(sum(c) OVER w AS DOUBLE) / count(*) OVER w AS ma7
        |FROM daily
        |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    "range_frame_hourly" ->
      """SELECT event_id, count(*) OVER (
        |         PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
        |         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |         AS n_trailing_hour
        |FROM events ORDER BY event_id""".stripMargin,

    "returned_revenue_topk" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |           * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
        |       AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "hourly_activity" ->
      """SELECT CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
        |       CAST(hour(ts) AS BIGINT) AS h, count(*) AS n
        |FROM events GROUP BY 1, 2, 3 ORDER BY y, m, h""".stripMargin,

    "q6_revenue_delta" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
        |               * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin,

    "daily_active_users" ->
      """SELECT date_trunc('day', ts) AS day,
        |       count(DISTINCT user_id) AS dau, count(*) AS events
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    "event_type_share" ->
      """SELECT event_type, n,
        |       CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE) AS share
        |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY event_type)
        |ORDER BY event_type""".stripMargin,

    "emb_label_stats" ->
      """WITH el AS (
        |  SELECT vec_id, label,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS q
        |  FROM embeddings),
        |norms AS (
        |  SELECT vec_id, label, CAST(sum(q * q) AS BIGINT) AS nrm
        |  FROM el GROUP BY vec_id, label)
        |SELECT label, count(*) AS n,
        |       CAST(sum(nrm) AS BIGINT) AS norm_sum,
        |       min(nrm) AS norm_min, max(nrm) AS norm_max
        |FROM norms GROUP BY label ORDER BY label""".stripMargin
  )
}
