package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch forms of the reference's continuously-maintained views and
  * dashboard procedures (SURVEY.md §2.4 A1–A9, §2.6 T1–T5, §2.3 J3/J4),
  * mapped onto the driver `events` table
  * (user_id→src, event_type→dest, ts→ts, value→size; FIXTURES.md §B).
  *
  * Reference evidence cited per query. The streaming (continuously
  * maintained) forms of A1–A6 live in [[graft.streaming.StreamingViews]];
  * these batch forms are the oracle-checked semantics and are what the
  * re-aggregation procedures (A7/T1/T2) query — the same two-tier
  * partial/final aggregation design the reference uses
  * (`/root/reference/db/ddl.sql:114-143` + `GetTopUsers.java:26-31`).
  *
  * Scale: every query is a groupBy over the fact table — Spark plans
  * partial (map-side) aggregation before the exchange, so the shuffle
  * carries only group cardinality, not row cardinality. Final ORDER BY
  * runs on already-aggregated (small) output.
  */
object ClickstreamOps {
  type Q = (SparkSession, String) => DataFrame

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  /** The events_export relation: only the first event of each 30-s-gap
    * (src,dest) session (batch form of the export stream,
    * `db/ddl.sql:78-89` + NewEvent.java:70-75). The A1/A2 views
    * aggregate THIS, not the raw fact table — a reference-semantics
    * subtlety (`db/ddl.sql:92-101`: `FROM events_export`). */
  def exportEvents(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    ev(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNull ||
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > lit(30000000L))
      .drop("prev_ts")
  }

  /** DuckDB CTE for the same relation (prefix for A1/A2 oracles). */
  val exportCte: String =
    """WITH events_export AS (
      |  SELECT event_id, user_id, event_type, ts, value FROM (
      |    SELECT event_id, user_id, event_type, ts, value,
      |           lag(ts) OVER (PARTITION BY user_id, event_type
      |                         ORDER BY ts, event_id) AS prev_ts
      |    FROM events) t
      |  WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 30000000)
      |""".stripMargin

  /** Tumbling 1-second bucket of ts — `TRUNCATE(SECOND, ts)` in the
    * reference views (`db/ddl.sql:120,130,140`). */
  private def secondTs(c: Column): Column = date_trunc("second", c)

  // A4: events_by_second view (db/ddl.sql:114-122)
  def eventsBySecond(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(secondTs(col("ts")).as("second_ts"), col("user_id"))
      .agg(count(lit(1)).as("count_values"))

  // A5: dests_by_second view (db/ddl.sql:124-132)
  def destsBySecond(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .groupBy(secondTs(col("ts")).as("second_ts"), col("event_type"))
      .agg(count(lit(1)).as("count_values"))

  val queries: Map[String, Q] = Map(
    // A1 — events_by_src_view: lifetime COUNT per src OVER THE EXPORT
    // STREAM (db/ddl.sql:92-95: FROM events_export)
    "ev_by_src" -> ((s, d) =>
      exportEvents(s, d).groupBy("user_id")
        .agg(count(lit(1)).as("total_visits"))
        .orderBy("user_id")),

    // A2 — events_by_src_dest_view over the export stream
    // (db/ddl.sql:97-101)
    "ev_by_src_dest" -> ((s, d) =>
      exportEvents(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("counts"))
        .orderBy("user_id", "event_type")),

    // A3 — events_sessions: COUNT + MAX(ts) per (src,dest) (db/ddl.sql:103-112)
    "ev_sessions" -> ((s, d) =>
      ev(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("counts"), max("ts").as("last_ts"))
        .orderBy("user_id", "event_type")),

    // A4 — events_by_second (db/ddl.sql:114-122)
    "ev_by_second" -> ((s, d) =>
      eventsBySecond(s, d).orderBy("second_ts", "user_id")),

    // A5 — dests_by_second (db/ddl.sql:124-132)
    "ev_dests_by_second" -> ((s, d) =>
      destsBySecond(s, d).orderBy("second_ts", "event_type")),

    // A6 — events_by_cluster with IS NOT NULL filter (db/ddl.sql:134-143,
    // F5). Cluster = the ingest-assigned nearest-centroid score (same
    // definition the GetEventsByCluster procedure uses), with the
    // value-present filter standing in for cluster IS NOT NULL.
    "ev_by_cluster" -> ((s, d) =>
      ev(s, d).filter(col("value").isNotNull)
        .groupBy(secondTs(col("ts")).as("second_ts"),
          graft.ml.MLOps.scoreExpr(graft.ml.MLOps.literalCenterSeq,
            (col("user_id") % 100).cast("double"), col("value")).as("cluster"))
        .agg(count(lit(1)).as("count_values"))
        .orderBy("second_ts", "cluster")),

    // A7+T1 — GetTopUsers(60,10): SUM over per-second view within the
    // sliding window, top-k with tiebreak (GetTopUsers.java:26-31).
    // Single source of truth: the parameterized procedure registry.
    "get_top_users" -> ((s, d) =>
      graft.procs.Procedures.getTopUsers(s, d, 60, 10)),

    // A7+T1 — GetTopDests(60,10) (db/ddl.sql:161-166)
    "get_top_dests" -> ((s, d) =>
      graft.procs.Procedures.getTopDests(s, d, 60, 10)),

    // T2 — GetTopSources: lifetime top-k over events_by_src_view, i.e.
    // the export stream (GetTopSources.java:26)
    "get_top_sources" -> ((s, d) =>
      graft.procs.Procedures.getTopSources(s, d, 10)),

    // T2+J2 — GetTopSrcDests over events_by_src_dest_view (export
    // stream; GetTopSrcDests.java:27-28)
    "get_top_src_dests" -> ((s, d) =>
      graft.procs.Procedures.getTopSrcDests(s, d, 10)),

    // T4 — GetEventsByCluster: windowed per-cluster counts, full ORDER BY
    // cluster (db/ddl.sql:168-173) — delegates to the procedure registry
    "get_events_by_cluster" -> ((s, d) =>
      graft.procs.Procedures.getEventsByCluster(s, d, 60)),

    // T5 — OFFSET-based nth-row probe (DeleteAfterDate.java:50-51):
    // timestamp of the 100th-oldest event (100 not 1000 so the probe is
    // non-empty even at sf0.001's 1000 rows).
    "ev_offset_probe" -> ((s, d) =>
      ev(s, d).orderBy("ts", "event_id").offset(100).limit(1).select("ts")),

    // F4+A8 — retention sizing: rows at/older than a cutoff
    // (DeleteAfterDate.java:47-48): count of the oldest 25% window.
    "ev_retention_count" -> ((s, d) => {
      // integer `div`, not `/` (true division would round-trip through
      // double and lose precision at µs-epoch magnitude)
      val cut = ev(s, d).agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
        .select(expr(
          "timestamp_micros((unix_micros(mn) * 3 + unix_micros(mx)) div 4)").as("cut_ts"))
      ev(s, d).crossJoin(broadcast(cut))
        .filter(col("ts") <= col("cut_ts"))
        .agg(count(lit(1)).as("n_old"))
    }),

    // J4/ST4 — 30-s-gap session dedup, batch form (NewEvent.java:40-42,
    // 70-75): emit only the first event of each 30-s-inactivity session
    // per (src,dest). Single gap-rule definition: exportEvents; the
    // streaming form is flatMapGroupsWithState in
    // graft.streaming.SessionDedup.
    "session_export" -> ((s, d) =>
      exportEvents(s, d)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("event_id")),

    // ST4 aggregate — sessions per (src,dest): count of session starts
    "session_counts" -> ((s, d) => {
      val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
      ev(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_start",
          (col("prev_ts").isNull ||
            (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > lit(30000000L)).cast("long"))
        .groupBy("user_id", "event_type")
        .agg(sum("is_start").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id", "event_type")
    })
  )

  /** DuckDB equivalents (driver oracle). Column names/aliases match the
    * Spark side exactly; every ORDER BY is total and explicit. */
  val oracles: Map[String, String] = Map(
    "ev_by_src" -> (exportCte +
      """SELECT user_id, count(*) AS total_visits FROM events_export
        |GROUP BY user_id ORDER BY user_id""".stripMargin),

    "ev_by_src_dest" -> (exportCte +
      """SELECT user_id, event_type, count(*) AS counts FROM events_export
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin),

    "ev_sessions" ->
      """SELECT user_id, event_type, count(*) AS counts, max(ts) AS last_ts
        |FROM events GROUP BY user_id, event_type
        |ORDER BY user_id, event_type""".stripMargin,

    "ev_by_second" ->
      """SELECT date_trunc('second', ts) AS second_ts, user_id,
        |       count(*) AS count_values
        |FROM events GROUP BY 1, 2 ORDER BY second_ts, user_id""".stripMargin,

    "ev_dests_by_second" ->
      """SELECT date_trunc('second', ts) AS second_ts, event_type,
        |       count(*) AS count_values
        |FROM events GROUP BY 1, 2 ORDER BY second_ts, event_type""".stripMargin,

    "ev_by_cluster" ->
      """WITH centers AS (
        |  SELECT i AS cid, i * 5.0 AS c1, i * 12.5 AS c2
        |  FROM (SELECT unnest(range(0, 20)) AS i)),
        |best AS (
        |  SELECT e.event_id, e.ts, c.cid,
        |         row_number() OVER (PARTITION BY e.event_id ORDER BY
        |           ((e.user_id % 100) - c.c1) * ((e.user_id % 100) - c.c1)
        |             + (e.value - c.c2) * (e.value - c.c2), c.cid) AS rn
        |  FROM events e CROSS JOIN centers c WHERE e.value IS NOT NULL)
        |SELECT date_trunc('second', ts) AS second_ts, cid AS cluster,
        |       count(*) AS count_values
        |FROM best WHERE rn = 1
        |GROUP BY 1, 2 ORDER BY second_ts, cluster""".stripMargin,

    "get_top_users" ->
      """WITH by_sec AS (
        |  SELECT date_trunc('second', ts) AS second_ts, user_id,
        |         count(*) AS count_values
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, CAST(sum(count_values) AS BIGINT) AS counts FROM by_sec
        |WHERE second_ts >= (SELECT date_trunc('second', max(ts)) FROM events)
        |                   - INTERVAL 60 SECOND
        |GROUP BY user_id ORDER BY counts DESC, user_id LIMIT 10""".stripMargin,

    "get_top_dests" ->
      """WITH by_sec AS (
        |  SELECT date_trunc('second', ts) AS second_ts, event_type,
        |         count(*) AS count_values
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(count_values) AS BIGINT) AS counts FROM by_sec
        |WHERE second_ts >= (SELECT date_trunc('second', max(ts)) FROM events)
        |                   - INTERVAL 60 SECOND
        |GROUP BY event_type ORDER BY counts DESC, event_type LIMIT 10""".stripMargin,

    "get_top_sources" -> (exportCte +
      """SELECT user_id, count(*) AS total_visits FROM events_export
        |GROUP BY user_id ORDER BY total_visits DESC, user_id LIMIT 10""".stripMargin),

    "get_top_src_dests" -> (exportCte +
      """SELECT user_id, event_type, count(*) AS counts FROM events_export
        |GROUP BY user_id, event_type
        |ORDER BY counts DESC, user_id, event_type LIMIT 10""".stripMargin),

    "get_events_by_cluster" ->
      """WITH centers AS (
        |  SELECT i AS cid, i * 5.0 AS c1, i * 12.5 AS c2
        |  FROM (SELECT unnest(range(0, 20)) AS i)),
        |best AS (
        |  SELECT e.event_id, e.ts, c.cid,
        |         row_number() OVER (PARTITION BY e.event_id ORDER BY
        |           ((e.user_id % 100) - c.c1) * ((e.user_id % 100) - c.c1)
        |             + (e.value - c.c2) * (e.value - c.c2), c.cid) AS rn
        |  FROM events e CROSS JOIN centers c WHERE e.value IS NOT NULL),
        |by_sec AS (
        |  SELECT date_trunc('second', ts) AS second_ts, cid AS cluster,
        |         count(*) AS count_values
        |  FROM best WHERE rn = 1 GROUP BY 1, 2)
        |SELECT cluster, CAST(sum(count_values) AS BIGINT) AS counts FROM by_sec
        |WHERE second_ts >= (SELECT date_trunc('second', max(ts)) FROM events)
        |                   - INTERVAL 60 SECOND
        |GROUP BY cluster ORDER BY cluster""".stripMargin,

    "ev_offset_probe" ->
      """SELECT ts FROM events ORDER BY ts, event_id OFFSET 100 LIMIT 1""",

    "ev_retention_count" ->
      """SELECT count(*) AS n_old FROM events
        |WHERE epoch_us(ts) <= (SELECT (min(epoch_us(ts)) * 3 + max(epoch_us(ts))) // 4
        |                       FROM events)""".stripMargin,

    "session_export" ->
      """SELECT event_id, user_id, event_type, ts, value FROM (
        |  SELECT event_id, user_id, event_type, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS prev_ts
        |  FROM events) t
        |WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 30000000
        |ORDER BY event_id""".stripMargin,

    "session_counts" ->
      """SELECT user_id, event_type,
        |       CAST(sum(CASE WHEN prev_ts IS NULL
        |                  OR epoch_us(ts) - epoch_us(prev_ts) > 30000000
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
        |       count(*) AS n_events
        |FROM (
        |  SELECT user_id, event_type, ts,
        |         lag(ts) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS prev_ts
        |  FROM events) t
        |GROUP BY user_id, event_type ORDER BY user_id, event_type""".stripMargin
  )
}
