package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuously-maintained view layer: the reference's five
  * materialized views (`/root/reference/db/ddl.sql:92-143`) as
  * Structured Streaming aggregations (SURVEY.md §2.4 A1–A6).
  *
  * Each takes a streaming DataFrame with the event schema
  * (event_id, ts, user_id, event_type, value) and returns the
  * incrementally-maintained aggregate; callers attach the sink
  * (`memory` for serving/tests, parquet/Delta for the at-rest tier).
  * The same column logic as the batch forms in
  * [[graft.operators.ClickstreamOps]] — specs assert streaming ==
  * batch on identical input.
  *
  * Scale: all are partial-aggregating group-bys; state size is bounded
  * by group cardinality (per-second windows expire via the watermark).
  * VoltDB maintains these synchronously per insert; micro-batches give
  * the same contents at batch-boundary granularity.
  */
object StreamingViews {

  /** A1 — events_by_src_view: lifetime COUNT per src (db/ddl.sql:92-95).
    * The reference view aggregates the EXPORT stream (ddl:93: FROM
    * events_export) — feed this the [[SessionDedup.dedup]] output, not
    * the raw event stream. Output mode: update/complete (no watermark —
    * lifetime counts). */
  def eventsBySrc(exportStream: DataFrame): DataFrame =
    exportStream.groupBy("user_id").agg(count(lit(1)).as("total_visits"))

  /** A2 — events_by_src_dest_view (db/ddl.sql:97-101); same export-
    * stream input contract as [[eventsBySrc]]. */
  def eventsBySrcDest(exportStream: DataFrame): DataFrame =
    exportStream.groupBy("user_id", "event_type").agg(count(lit(1)).as("counts"))

  /** A3 — events_sessions: COUNT + MAX(ts) (db/ddl.sql:103-112). */
  def eventsSessions(stream: DataFrame): DataFrame =
    stream.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("counts"), max("ts").as("last_ts"))

  /** A4 — events_by_second: tumbling 1-s window per src
    * (db/ddl.sql:114-122). Watermark bounds state (ST5: input is
    * in-order, so 5 s of slack loses nothing). */
  def eventsBySecond(stream: DataFrame): DataFrame =
    stream.withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 second"), col("user_id"))
      .agg(count(lit(1)).as("count_values"))
      .select(col("window.start").as("second_ts"), col("user_id"), col("count_values"))

  /** A5 — dests_by_second (db/ddl.sql:124-132). */
  def destsBySecond(stream: DataFrame): DataFrame =
    stream.withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 second"), col("event_type"))
      .agg(count(lit(1)).as("count_values"))
      .select(col("window.start").as("second_ts"), col("event_type"), col("count_values"))

  /** A6 — events_by_cluster, cluster IS NOT NULL (db/ddl.sql:134-143). */
  def eventsByCluster(stream: DataFrame): DataFrame =
    stream.filter(col("cluster").isNotNull)
      .withWatermark("ts", "5 seconds")
      .groupBy(window(col("ts"), "1 second"), col("cluster"))
      .agg(count(lit(1)).as("count_values"))
      .select(col("window.start").as("second_ts"), col("cluster"), col("count_values"))
}
