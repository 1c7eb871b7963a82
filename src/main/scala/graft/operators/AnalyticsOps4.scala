package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fourth analytics tranche — two diagnostics every event warehouse
  * grows eventually:
  *
  *  - `autocorr_lags` — the autocorrelation function of the per-minute
  *    event-count series at lags 1..5 (the seasonality/burstiness
  *    screen behind traffic forecasting and anomaly thresholds).
  *    Computed from integer sufficient statistics (Σx, Σx², Σx_t·x_{t+k}
  *    and the head/tail partial sums) with ONE identically-written
  *    double expression at the end, ppm-floored — the q14 discipline:
  *    both engines execute the same IEEE op sequence, so the floor is
  *    bit-stable;
  *  - `event_cooccurrence_lift` — market-basket lift over per-user
  *    event-type sets: for each type pair, lift =
  *    P(both)/(P(a)·P(b)) in ppm via pure integer arithmetic
  *    (n_both·10⁶·n_users div (n_a·n_b) — positive operands, so
  *    trunc-vs-floor division parity is moot).
  *
  * Scale notes (100 TB):
  *  - autocorr_lags runs its unpartitioned window over the PRE-AGGREGATED
  *    minute tier, whose length grows with the time horizon, not the
  *    event volume (one year ≈ 526k rows) — the heavy aggregation
  *    underneath is an ordinary hash groupBy on the minute key. The
  *    lead columns for all K lags ride one window pass;
  *  - event_cooccurrence_lift: the per-user distinct tier is the only
  *    fact-sized stage (hash aggregate); the self-join fans out
  *    |types|²-bounded rows per user (≤ C(5,2)+5 here), and the
  *    per-type totals join back via broadcast.
  */
object AnalyticsOps4 {
  type Q = (SparkSession, String) => DataFrame

  val MaxLag = 5

  /** Per-minute counts → ACF at lags 1..maxLag. Output:
    * (lag, n_pairs, sum_xy, acf_ppm). */
  def autocorrLags(events: DataFrame, maxLag: Int): DataFrame = {
    val x = events
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(count(lit(1)).as("x"))
    val w = Window.orderBy("m")
    val withLeads = (1 to maxLag).foldLeft(x) { (df, k) =>
      df.withColumn(s"x$k", lead(col("x"), k).over(w))
    }
    val stacked = withLeads.select(col("x"),
      expr(s"stack($maxLag, " +
        (1 to maxLag).map(k => s"$k, x$k").mkString(", ") +
        ") AS (lag, xk)"))
      .filter(col("xk").isNotNull)
    val perLag = stacked.groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x") * col("xk")).as("sum_xy"),
        sum(col("x")).as("sa"),
        sum(col("xk")).as("sb"))
    val glob = x.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"),
      sum(col("x") * col("x")).as("sxx"))
    perLag.join(broadcast(glob))
      // ONE arithmetic shape on both sides (see oracle): any
      // re-association would change the IEEE rounding sequence
      .withColumn("acf_ppm", expr(
        "CAST(floor(1000000.0 * " +
          "(CAST(sum_xy AS DOUBLE) " +
          " - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sa + sb AS DOUBLE) " +
          " + CAST(n_pairs AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / " +
          "(CAST(sxx AS DOUBLE) " +
          " - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) " +
          "   * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) AS BIGINT)"))
      .select(col("lag").cast("long").as("lag"), col("n_pairs"),
        col("sum_xy"), col("acf_ppm"))
      .orderBy("lag")
  }

  /** Per-user event-type sets → pairwise lift table. */
  def cooccurrenceLift(events: DataFrame): DataFrame = {
    val ut = events.select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint(true)
    val totals = ut.groupBy("event_type").agg(count(lit(1)).as("n_t"))
    val nUsers = events.select("user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    ut.as("a").join(ut.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(totals.select(col("event_type").as("ta"),
        col("n_t").as("n_a"))), "ta")
      .join(broadcast(totals.select(col("event_type").as("tb"),
        col("n_t").as("n_b"))), "tb")
      .join(broadcast(nUsers))
      .withColumn("lift_ppm",
        expr("n_both * 1000000 * n_users div (n_a * n_b)"))
      .select("ta", "tb", "n_both", "n_a", "n_b", "lift_ppm")
      .orderBy("ta", "tb")
  }

  val queries: Map[String, Q] = Map(
    "autocorr_lags" -> ((s, d) =>
      autocorrLags(Tables.events(s, d), MaxLag)),
    "event_cooccurrence_lift" -> ((s, d) =>
      cooccurrenceLift(Tables.events(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "autocorr_lags" ->
      s"""WITH x AS (
         |  SELECT date_trunc('minute', ts) AS m, count(*) AS x
         |  FROM events GROUP BY 1),
         |lags AS (SELECT unnest(range(1, ${MaxLag + 1})) AS lag),
         |led AS (
         |  SELECT l.lag, x.x,
         |         lead(x.x, CAST(l.lag AS INTEGER))
         |           OVER (PARTITION BY l.lag ORDER BY x.m) AS xk
         |  FROM x, lags l),
         |pl AS (
         |  SELECT lag, count(*) AS n_pairs,
         |         CAST(sum(x * xk) AS BIGINT) AS sum_xy,
         |         CAST(sum(x) AS BIGINT) AS sa,
         |         CAST(sum(xk) AS BIGINT) AS sb
         |  FROM led WHERE xk IS NOT NULL GROUP BY lag),
         |g AS (
         |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
         |         CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM x)
         |SELECT CAST(lag AS BIGINT) AS lag, n_pairs, sum_xy,
         |  CAST(floor(1000000.0 *
         |    (CAST(sum_xy AS DOUBLE)
         |     - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(sa + sb AS DOUBLE)
         |     + CAST(n_pairs AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) /
         |    (CAST(sxx AS DOUBLE)
         |     - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         |       * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) AS BIGINT) AS acf_ppm
         |FROM pl, g ORDER BY lag""".stripMargin,

    "event_cooccurrence_lift" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (SELECT event_type, count(*) AS n_t FROM ut GROUP BY 1),
        |nu AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
        |pairs AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ta, tb, n_both, x.n_t AS n_a, y.n_t AS n_b,
        |       n_both * 1000000 * n_users // (x.n_t * y.n_t) AS lift_ppm
        |FROM pairs
        |JOIN tot x ON x.event_type = ta
        |JOIN tot y ON y.event_type = tb, nu
        |ORDER BY ta, tb""".stripMargin
  )
}
